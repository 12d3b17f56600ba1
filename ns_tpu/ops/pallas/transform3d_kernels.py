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
    return {"default": jax.lax.Precision.DEFAULT,
            "high": jax.lax.Precision.HIGH,
            "highest": jax.lax.Precision.HIGHEST}[name]


def _fwd_kernel(w_ref, fz_re, fz_im, fy_re, fy_im, o_re, o_im, *, prec):
    """One (ny, nz) x-slab -> (Ry, Kzc) doubly-transformed slab.

    z-stage: t1 = w @ Fz (contract nz; real input, so one GEMM per part);
    y-stage: t2 = Fy @ t1 (contract ny; full complex product)."""
    w = w_ref[0, 0]                                # (ny, nz) real
    dot = partial(jnp.dot, precision=prec, preferred_element_type=w.dtype)
    t1_re = dot(w, fz_re[...])                     # (ny, Kzc)
    t1_im = dot(w, fz_im[...])
    yr, yi = fy_re[...], fy_im[...]                # (Ry, ny)
    o_re[0, 0] = dot(yr, t1_re) - dot(yi, t1_im)   # (Ry, Kzc)
    o_im[0, 0] = dot(yr, t1_im) + dot(yi, t1_re)


def _inv_kernel(a_re_ref, a_im_ref, fy_re, fy_im, bz_re, bz_im, o_ref, *,
                prec):
    """One (Ry, Kzc) spectral x-slab -> (ny, nz) physical slab.

    y-inverse: t = Fyi @ a (contract Ry, complex); z-unfold: take the
    real part of t @ Bz analytically — Re(t) @ Bz_re - Im(t) @ Bz_im —
    so the imaginary half of the last GEMM is never computed."""
    ar, ai = a_re_ref[0, 0], a_im_ref[0, 0]        # (Ry, Kzc)
    dot = partial(jnp.dot, precision=prec, preferred_element_type=ar.dtype)
    yr, yi = fy_re[...], fy_im[...]                # (ny, Ry)
    t_re = dot(yr, ar) - dot(yi, ai)               # (ny, Kzc)
    t_im = dot(yr, ai) + dot(yi, ar)
    o_ref[0, 0] = dot(t_re, bz_re[...]) - dot(t_im, bz_im[...])


def _full_spec(shape):
    return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape))


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
    consts = [jnp.asarray(Fz_t.T.real, dt), jnp.asarray(Fz_t.T.imag, dt),
              jnp.asarray(Fy_t.real, dt), jnp.asarray(Fy_t.imag, dt)]
    out_shape = [jax.ShapeDtypeStruct((B, nx, ry, kzc), dt)] * 2
    re, im = pl.pallas_call(
        partial(_fwd_kernel, prec=_prec(precision)),
        out_shape=out_shape,
        grid=(B, nx),
        in_specs=[pl.BlockSpec((1, 1, ny, nz), lambda b, i: (b, i, 0, 0)),
                  _full_spec((nz, kzc)), _full_spec((nz, kzc)),
                  _full_spec((ry, ny)), _full_spec((ry, ny))],
        out_specs=[pl.BlockSpec((1, 1, ry, kzc), lambda b, i: (b, i, 0, 0))]
        * 2,
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
    consts = [jnp.asarray(Fyi_t.real, dt), jnp.asarray(Fyi_t.imag, dt),
              jnp.asarray(Bz.real, dt), jnp.asarray(Bz.imag, dt)]
    out = pl.pallas_call(
        partial(_inv_kernel, prec=_prec(precision)),
        out_shape=jax.ShapeDtypeStruct((B, nx, ny, nz), dt),
        grid=(B, nx),
        in_specs=[pl.BlockSpec((1, 1, ry, kzc), lambda b, i: (b, i, 0, 0))]
        * 2 + [_full_spec((ny, ry)), _full_spec((ny, ry)),
               _full_spec((kzc, nz)), _full_spec((kzc, nz))],
        out_specs=pl.BlockSpec((1, 1, ny, nz), lambda b, i: (b, i, 0, 0)),
        interpret=interpret,
    )(aB.real, aB.imag, *consts)
    return out.reshape(lead + (nx, ny, nz))
