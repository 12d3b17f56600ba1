"""VMEM-fused z+y DFT stages for the 3D compact spectral transform.

The 3D step is HBM-bound (RESULTS.md "3D periodic spectral family"): the
per-axis matmul-DFT chain (solvers/spectral3d.py::make_compact_transforms)
materializes a full-grid complex intermediate between the z and y stages
— at 256^3 that stage tensor is (B, nx, ny, Kzc) c64, and its write+read
round trip is ~40% of the whole forward transform's HBM traffic. These
kernels fuse the two stages: the grid walks (batch, x-row); each program
DMAs ONE (ny, nz) x-slab into VMEM, runs the z-stage GEMM and the
y-stage GEMM back to back on the MXU, and writes only the doubly-reduced
(Ry, Kzc) slab. The inter-stage pencil never leaves VMEM.

The x-stage contracts ACROSS x-rows, so it cannot join this fusion
without cross-program accumulation; it stays a plain XLA einsum on the
already-truncated (B, nx, Ry, Kzc) tensor (whose traffic is small).
RESULTS.md's "VMEM-fused Pallas 3D transform" paragraph carries the
measurement (VERDICT r3 next #4: build or kill with numbers).

Each program processes a BLOCK of bx x-rows (bx = largest of 8/4/2/1
dividing nx): one (ny, nz)-slab per program leaves the MXU starved —
(128, 128) @ (128, 43) GEMMs measured 2.4x SLOWER than XLA's einsum at
128^3 — so the block's slabs are flattened into (bx*ny, nz) for the
z-stage and regrouped in VMEM to (ny, bx*Kzc) for the y-stage, making
both stages MXU-fat. The regroups are expressed as lane-axis
concatenates / static slices with Kzc zero-padded to the 128-lane tile
(P = ceil(Kzc/128)*128) so every band boundary is tile-aligned: a
reshape merging Kzc=43 into the lane axis is an "unsupported shape
cast" in Mosaic's layout inference, and concatenating lane slices taken
at unaligned offsets hits "result/input offset mismatch on non-concat
dimension" (both measured live). The padding triples the GEMM flops at
Kzc=43 — irrelevant here: the kernel is DMA-bound and the padded GEMMs
still hide under the slab transfers.

Complex arithmetic runs as explicit (re, im) real GEMM pairs — Mosaic
has no complex dtype, and the repo's device-transfer rules forbid
complex constants anyway (CLAUDE.md). All matrices arrive pre-transposed
so the kernels contain no transposes: z-stage contracts the last (lane)
axis against (nz, Kzc); the y-stage left-multiplies (Ry, ny).

Pure-XLA twin: make_compact_transforms' einsum chain; parity test in
interpret mode: tests/test_pallas_transform3d.py (repo convention).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

Array = jnp.ndarray


def _prec(name: str):
    # Mosaic's dot accepts DEFAULT and HIGHEST only ("Unsupported dot
    # precision: HIGH", measured live); 'high' promotes to HIGHEST here —
    # more accurate than the einsum twin's bf16x3, never less.
    return {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGHEST,
            "highest": jax.lax.Precision.HIGHEST}[name]


def _block_x(nx: int) -> int:
    return next(b for b in (8, 4, 2, 1) if nx % b == 0)


_LANE = 128


def _pad_cols(kzc: int) -> int:
    return -(-kzc // _LANE) * _LANE


# --- banding invariants shared by every kernel (one copy: Mosaic lane
# alignment rules live here, module docstring) -------------------------------
# Slab i of a bx-block occupies flat rows i*ny:(i+1)*ny and lane band
# i*P:(i+1)*P; Kzc is zero-padded to its P-wide tile so every band
# boundary is tile-aligned.

def _band_spec(t, zpad):
    """(bx, r, kzc) slabs -> (r, bx*P) lane bands (zero-pad interleave)."""
    pieces = []
    for i in range(t.shape[0]):
        pieces.append(t[i])
        if zpad is not None:
            pieces.append(zpad)
    return (jnp.concatenate(pieces, axis=1) if len(pieces) > 1
            else pieces[0])


def _rows_to_bands(t, bx, ny):
    """(bx*ny, P) flat rows -> (ny, bx*P) lane bands."""
    return (jnp.concatenate([t[i * ny:(i + 1) * ny] for i in range(bx)],
                            axis=1) if bx > 1 else t)


def _bands_to_rows(t, bx, P):
    """(ny, bx*P) lane bands -> (bx*ny, P) flat rows."""
    return (jnp.concatenate([t[:, i * P:(i + 1) * P] for i in range(bx)],
                            axis=0) if bx > 1 else t)


def _unband_spec(t, bx, P, kzc):
    """(r, bx*P) lane bands -> (bx, r, kzc) slabs (pad lanes dropped;
    aligned slice offsets)."""
    if bx > 1:
        return jnp.stack([t[:, i * P:i * P + kzc] for i in range(bx)],
                         axis=0)
    return t[None, :, :kzc]


def _fwd_kernel(w_ref, fz_re, fz_im, fy_re, fy_im, o_re, o_im, *, prec,
                kzc):
    """bx x-slabs (bx, ny, nz) -> (bx, Ry, Kzc) doubly-transformed slabs.

    z-stage: t1 = w @ Fz over the flattened (bx*ny, nz) block (real
    input, so one GEMM per part; Fz columns zero-padded to P); VMEM
    regroup to the lane-banded (ny, bx*P); y-stage: t2 = Fy @ t1
    (contract ny; full complex product) — both stages one fat GEMM per
    re/im part."""
    w = w_ref[0]                                   # (bx, ny, nz) real
    bx, ny, nz = w.shape
    dot = partial(jnp.dot, precision=prec, preferred_element_type=w.dtype)
    wf = w.reshape(bx * ny, nz)
    t1_re = dot(wf, fz_re[...])                    # (bx*ny, P)
    t1_im = dot(wf, fz_im[...])
    P = t1_re.shape[-1]
    t1_re = _rows_to_bands(t1_re, bx, ny)          # (ny, bx*P)
    t1_im = _rows_to_bands(t1_im, bx, ny)
    yr, yi = fy_re[...], fy_im[...]                # (Ry, ny)
    u_re = dot(yr, t1_re) - dot(yi, t1_im)         # (Ry, bx*P)
    u_im = dot(yr, t1_im) + dot(yi, t1_re)
    o_re[0] = _unband_spec(u_re, bx, P, kzc)       # (bx, Ry, Kzc)
    o_im[0] = _unband_spec(u_im, bx, P, kzc)


def _inv_kernel(a_re_ref, a_im_ref, fy_re, fy_im, bz_re, bz_im, o_ref, *,
                prec):
    """bx spectral x-slabs (bx, Ry, Kzc) -> (bx, ny, nz) physical slabs.

    y-inverse: t = Fyi @ a (contract Ry, complex) on the lane-banded
    (Ry, bx*P) regroup (each Kzc slab zero-padded to its P-wide band;
    Bz rows are zero-padded to match, so the pad lanes contribute
    nothing); z-unfold: take the real part of t @ Bz analytically —
    Re(t) @ Bz_re - Im(t) @ Bz_im — so the imaginary half of the last
    GEMM is never computed."""
    ar, ai = a_re_ref[0], a_im_ref[0]              # (bx, Ry, Kzc)
    bx, ry, kzc = ar.shape
    P = bz_re.shape[0]
    dot = partial(jnp.dot, precision=prec, preferred_element_type=ar.dtype)
    zpad = (jnp.zeros((ry, P - kzc), ar.dtype) if P > kzc else None)
    ar, ai = _band_spec(ar, zpad), _band_spec(ai, zpad)  # (Ry, bx*P)
    yr, yi = fy_re[...], fy_im[...]                # (ny, Ry)
    t_re = dot(yr, ar) - dot(yi, ai)               # (ny, bx*P)
    t_im = dot(yr, ai) + dot(yi, ar)
    ny = t_re.shape[0]
    t_re = _bands_to_rows(t_re, bx, P)             # (bx*ny, P)
    t_im = _bands_to_rows(t_im, bx, P)
    o = dot(t_re, bz_re[...]) - dot(t_im, bz_im[...])
    o_ref[0] = o.reshape(bx, ny, o.shape[-1])


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda *_: (0,) * len(shape))


def _lamb_kernel(a_re_ref, a_im_ref, fyi_re, fyi_im, bz_re, bz_im,
                 fz_re, fz_im, fyf_re, fyf_im, o_re_ref, o_im_ref, *,
                 prec, kzc):
    """(6, bx, Ry, Kzc) spectral (u, omega) slabs -> (3, bx, Ry, Kzc)
    spectral Lamb-vector slabs: yz-inverse of all six fields, the
    physical cross product u x omega, and the zy-forward of the three
    products — one program, no physical field ever leaves VMEM.

    The per-field inverse is _inv_kernel's math kept FLAT at (bx*ny, nz)
    (the pointwise cross product doesn't care about the slab split and
    the forward z-stage consumes exactly that flat shape), and the
    per-component forward is _fwd_kernel's math; see those for the
    banding/padding invariants."""
    ar6 = a_re_ref[...]                            # (6, bx, ry, kzc)
    ai6 = a_im_ref[...]
    _, bx, ry, _ = ar6.shape
    P = bz_re.shape[0]
    dot = partial(jnp.dot, precision=prec,
                  preferred_element_type=ar6.dtype)
    zpad = (jnp.zeros((ry, P - kzc), ar6.dtype) if P > kzc else None)
    yr_i, yi_i = fyi_re[...], fyi_im[...]          # (ny, Ry)
    ny = yr_i.shape[0]

    phys = []
    for f in range(6):
        ar, ai = _band_spec(ar6[f], zpad), _band_spec(ai6[f], zpad)
        t_re = dot(yr_i, ar) - dot(yi_i, ai)       # (ny, bx*P)
        t_im = dot(yr_i, ai) + dot(yi_i, ar)
        t_re = _bands_to_rows(t_re, bx, P)         # (bx*ny, P)
        t_im = _bands_to_rows(t_im, bx, P)
        phys.append(dot(t_re, bz_re[...]) - dot(t_im, bz_im[...]))

    u1, u2, u3, w1, w2, w3 = phys                  # (bx*ny, nz) each
    lamb = (u2 * w3 - u3 * w2, u3 * w1 - u1 * w3, u1 * w2 - u2 * w1)

    yr_f, yi_f = fyf_re[...], fyf_im[...]          # (Ry, ny)
    for j, lam in enumerate(lamb):
        t1_re = dot(lam, fz_re[...])               # (bx*ny, P)
        t1_im = dot(lam, fz_im[...])
        t1_re = _rows_to_bands(t1_re, bx, ny)      # (ny, bx*P)
        t1_im = _rows_to_bands(t1_im, bx, ny)
        o_r = dot(yr_f, t1_re) - dot(yi_f, t1_im)  # (Ry, bx*P)
        o_i = dot(yr_f, t1_im) + dot(yi_f, t1_re)
        o_re_ref[j] = _unband_spec(o_r, bx, P, kzc)
        o_im_ref[j] = _unband_spec(o_i, bx, P, kzc)


def lamb_block_x(nx: int, ny: int, nz: int, ry: int, kzc: int,
                 itemsize: int = 4,
                 budget_bytes: int = 10 * 2**20,
                 scoped_limit_bytes: int = 16 * 2**20):
    """Largest x-slab block whose live VMEM estimate fits the budget, or
    None when even bx=1 does not fit (the caller must keep the einsum
    path — Spectral3DConfig's 'auto' gate checks this, so infeasible
    grids like 512^3 never auto-enable fusion).

    The lamb kernel's footprint is dominated by the nine physical
    (bx*ny, nz) arrays live at the cross product (6 fields + 3 products);
    the spectral blocks, one t-pair of intermediates, and the transform
    constants ride along. ~10 MB of the ~16 MB/core VMEM leaves Mosaic
    room for DMA double-buffering of the in/out spectral blocks.

    Separately from Mosaic's own needs, XLA:TPU promotes the custom
    call's WHOLE output tuple onto the scoped-vmem stack when it fits
    under the ~16 MB/core scoped limit (measured: at 128^3 f32 the two
    (3, nx, Ry, Kzc) output components — 10.7 MiB together — were
    stack-allocated and the compile died at 19.75M > 16.00M with a
    block estimate of ~9 MiB; at 256^3 each component is 45.7 MB, too
    big to promote, and the same kernel compiles). When each output
    component is individually promotable, reserve both against the
    scoped limit (1 MiB headroom) on top of the per-block budget."""
    P = _pad_cols(kzc)
    consts = 2 * (ny * ry + 2 * P * nz + ry * ny)
    out_component = 3 * nx * ry * kzc * itemsize
    reserved = 2 * out_component if out_component < scoped_limit_bytes else 0
    headroom = 2**20
    for b in (8, 4, 2, 1):
        if nx % b:
            continue
        phys = 9 * b * ny * nz
        spec = (6 + 3) * 2 * b * ry * kzc
        inter = 4 * b * ny * P
        est = (phys + spec + inter + consts) * itemsize
        if est <= budget_bytes and \
                est + reserved <= scoped_limit_bytes - headroom:
            return b
    return None


def fused_lamb(a6: Array, Fyi_t: np.ndarray, Bz: np.ndarray,
               Fz_t: np.ndarray, Fy_t: np.ndarray, nz: int,
               precision: str = "default", interpret: bool = False,
               block_x: int = None) -> Array:
    """(6, nx, Ry, Kzc) complex (u, omega) after the x-inverse ->
    (3, nx, Ry, Kzc) complex Lamb vector u x omega before the x-forward.

    Fuses the entire physical-space leg of the nonlinear term
    (solvers/spectral3d.py::nonlinear_term): per x-slab block, the
    y/z-inverse of all six fields, the cross product, and the z/y-forward
    of the three products run in one Pallas program, so the six physical
    velocity/vorticity grids and three product grids never touch HBM —
    the step's only full-grid traffic. The x-stage contractions stay the
    caller's einsums on the truncated tensors (module docstring)."""
    six, nx, ry, kzc = a6.shape
    if six != 6:
        raise ValueError(f"fused_lamb wants (6, nx, Ry, Kzc); got {a6.shape}")
    ny = Fyi_t.shape[0]
    dt = jnp.float32 if a6.dtype == jnp.complex64 else jnp.float64
    P = _pad_cols(kzc)
    if block_x is not None and (block_x < 1 or nx % block_x):
        # grid=(nx // bx,) would silently truncate and leave tail x-slabs
        # of the output uninitialized
        raise ValueError(f"block_x must divide nx={nx}; got {block_x}")
    bz_pad = np.zeros((P, nz), Bz.dtype)
    bz_pad[:kzc] = Bz
    fz_pad = np.zeros((nz, P), Fz_t.dtype)
    fz_pad[:, :kzc] = Fz_t.T
    consts = [jnp.asarray(Fyi_t.real, dt), jnp.asarray(Fyi_t.imag, dt),
              jnp.asarray(bz_pad.real, dt), jnp.asarray(bz_pad.imag, dt),
              jnp.asarray(fz_pad.real, dt), jnp.asarray(fz_pad.imag, dt),
              jnp.asarray(Fy_t.real, dt), jnp.asarray(Fy_t.imag, dt)]
    bx = block_x if block_x is not None else lamb_block_x(
        nx, ny, nz, ry, kzc, itemsize=np.dtype(dt).itemsize)
    if bx is None:
        raise ValueError(
            f"fused_lamb at ({nx}, {ny}, {nz}) exceeds the VMEM budget "
            "even at block_x=1 (lamb_block_x); use the einsum engine "
            "(use_pallas_transform=False)")
    spec_block = pl.BlockSpec((6, bx, ry, kzc), lambda i: (0, i, 0, 0))
    re, im = pl.pallas_call(
        partial(_lamb_kernel, prec=_prec(precision), kzc=kzc),
        out_shape=[jax.ShapeDtypeStruct((3, nx, ry, kzc), dt)] * 2,
        grid=(nx // bx,),
        in_specs=[spec_block] * 2 + [_full_spec(c.shape) for c in consts],
        out_specs=[pl.BlockSpec((3, bx, ry, kzc),
                                lambda i: (0, i, 0, 0))] * 2,
        interpret=interpret,
    )(a6.real, a6.imag, *consts)
    return jax.lax.complex(re, im)


def fused_zy_forward(w: Array, Fz_t: np.ndarray, Fy_t: np.ndarray,
                     precision: str = "high",
                     interpret: bool = False) -> Array:
    """(..., nx, ny, nz) real -> (..., nx, Ry, Kzc) complex: the z and y
    DFT stages of the compact forward transform in one fused pass.

    Fz_t (Kzc, nz) / Fy_t (Ry, ny) are the HOST complex constants from
    _dft_constants_np; they enter the kernel as real pairs (module
    docstring). The x-stage is the caller's."""
    lead = w.shape[:-3]
    nx, ny, nz = w.shape[-3:]
    kzc, ry = Fz_t.shape[0], Fy_t.shape[0]
    dt = w.dtype
    wB = w.reshape((-1, nx, ny, nz))
    B = wB.shape[0]
    P = _pad_cols(kzc)
    fz_pad = np.zeros((nz, P), Fz_t.dtype)
    fz_pad[:, :kzc] = Fz_t.T
    consts = [jnp.asarray(fz_pad.real, dt), jnp.asarray(fz_pad.imag, dt),
              jnp.asarray(Fy_t.real, dt), jnp.asarray(Fy_t.imag, dt)]
    out_shape = [jax.ShapeDtypeStruct((B, nx, ry, kzc), dt)] * 2
    bx = _block_x(nx)
    re, im = pl.pallas_call(
        partial(_fwd_kernel, prec=_prec(precision), kzc=kzc),
        out_shape=out_shape,
        grid=(B, nx // bx),
        in_specs=[pl.BlockSpec((1, bx, ny, nz), lambda b, i: (b, i, 0, 0)),
                  _full_spec((nz, P)), _full_spec((nz, P)),
                  _full_spec((ry, ny)), _full_spec((ry, ny))],
        out_specs=[pl.BlockSpec((1, bx, ry, kzc),
                                lambda b, i: (b, i, 0, 0))] * 2,
        interpret=interpret,
    )(wB, *consts)
    z = jax.lax.complex(re, im)
    return z.reshape(lead + (nx, ry, kzc))


def fused_yz_inverse(a: Array, Fyi_t: np.ndarray, Bz: np.ndarray,
                     nz: int, precision: str = "high",
                     interpret: bool = False) -> Array:
    """(..., nx, Ry, Kzc) complex -> (..., nx, ny, nz) real: the y-inverse
    and z-unfold stages fused (the caller has already run the x-inverse).

    Fyi_t (ny, Ry) / Bz (Kzc, nz) from _dft_constants_np."""
    lead = a.shape[:-3]
    nx, ry, kzc = a.shape[-3:]
    ny = Fyi_t.shape[0]
    dt = jnp.float32 if a.dtype == jnp.complex64 else jnp.float64
    aB = a.reshape((-1, nx, ry, kzc))
    B = aB.shape[0]
    P = _pad_cols(kzc)
    bz_pad = np.zeros((P, nz), Bz.dtype)
    bz_pad[:kzc] = Bz
    consts = [jnp.asarray(Fyi_t.real, dt), jnp.asarray(Fyi_t.imag, dt),
              jnp.asarray(bz_pad.real, dt), jnp.asarray(bz_pad.imag, dt)]
    bx = _block_x(nx)
    out = pl.pallas_call(
        partial(_inv_kernel, prec=_prec(precision)),
        out_shape=jax.ShapeDtypeStruct((B, nx, ny, nz), dt),
        grid=(B, nx // bx),
        in_specs=[pl.BlockSpec((1, bx, ry, kzc), lambda b, i: (b, i, 0, 0))]
        * 2 + [_full_spec((ny, ry)), _full_spec((ny, ry)),
               _full_spec((P, nz)), _full_spec((P, nz))],
        out_specs=pl.BlockSpec((1, bx, ny, nz), lambda b, i: (b, i, 0, 0)),
        interpret=interpret,
    )(aB.real, aB.imag, *consts)
    return out.reshape(lead + (nx, ny, nz))
