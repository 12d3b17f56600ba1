"""Fourier Neural Operator surrogate: learned next-step flow map.

Paper-inspired fifth surrogate family (PAPERS.md: Factorized Fourier Neural
Operators): instead of the reference's global basis expansion in time, an
FNO learns the one-step evolution operator (u,v,p)_t -> (u,v,p)_{t+1} with
spectral convolutions — truncated per-mode complex mixing of channels —
which on TPU is a batched einsum between spectral transforms (MXU work).
Two transform engines compute the identical layer: 'fft' (rfft2 + mode
truncation) and 'matmul' (truncated-mode DFT GEMMs that compute ONLY the
retained block — the solver's matmul-DFT insight applied to the operator;
small TPU FFTs run far off the roofline, docs/roofline.md). 'auto' picks
by grid size; checkpoints transfer between engines unchanged.

Layout: lift (1x1 conv) -> L x [spectral conv + pointwise bypass, GELU]
-> project. Complex spectral weights are stored as real/imag pairs (the
axon tunnel cannot move complex buffers). Autoregressive rollout under
lax.scan gives full-horizon extrapolation like the reference drivers.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.models.layers import dense, dense_init

Array = jnp.ndarray

# grids at or below this size use the matmul-DFT spectral engine under
# transform='auto': XLA's native TPU FFT runs far off the MXU roofline at
# these sizes (docs/roofline.md measures 1.36 vs 10.4 Gcups for the
# solver's transforms; tools/bench_fno_transform.py measures the FNO
# layer itself), while the truncated-mode DFT is pure GEMM work AND
# computes only the retained (2*mx x my) block instead of the full
# spectrum
_MATMUL_MAX_SIDE = 512


@lru_cache(maxsize=16)
def _dft_mats(nx: int, ny: int, mx: int, my: int, dtype: str = "float32"):
    """Host-built (float64 -> `dtype` real/imag pairs) truncated DFT
    matrices for the retained FNO mode block. Row set = the rfft2 rows the
    FFT path keeps (kx in [0, mx) and [nx-mx, nx)); column set = ky in
    [0, my). Inverse weights replicate irfft's half-spectrum semantics
    (w=2 for interior ky columns, 1 for ky=0 and the Nyquist column).
    Complex values are stored as separate real arrays — only real
    constants transfer to the device (utils/host.py rationale); they are
    recombined with jax.lax.complex inside the jitted layer. The same
    half-spectrum weight convention lives in the solver's compact
    transforms (spectral_periodic) and vorticity._dealias_projectors —
    change one, check the others."""
    k_rows = np.concatenate([np.arange(mx), np.arange(nx - mx, nx)])
    a = np.arange(nx)
    j = np.arange(my)
    b = np.arange(ny)
    fr = np.exp(-2j * np.pi * np.outer(k_rows, a) / nx)        # (2mx, nx)
    fc = np.exp(-2j * np.pi * np.outer(b, j) / ny)             # (ny, my)
    gr = np.exp(2j * np.pi * np.outer(a, k_rows) / nx) / nx    # (nx, 2mx)
    w = np.where((j == 0) | ((ny % 2 == 0) & (j == ny // 2)), 1.0, 2.0)
    gc = (w[:, None] * np.exp(2j * np.pi * np.outer(j, b) / ny)) / ny
    dt = np.dtype(dtype)
    ri = lambda M: (M.real.astype(dt), M.imag.astype(dt))
    return ri(fr), ri(fc), ri(gr), ri(gc)                      # gc (my, ny)


def _spectral_init(key, c_in, c_out, mx, my, scale):
    # independent weights for the positive- and negative-kx blocks (the
    # standard FNO weights1/weights2 — sharing them would tie unrelated
    # wavenumber pairs and halve spectral-mixing capacity)
    ks = jax.random.split(key, 4)
    shape = (c_in, c_out, mx, my)
    return {"lo_re": scale * jax.random.normal(ks[0], shape),
            "lo_im": scale * jax.random.normal(ks[1], shape),
            "hi_re": scale * jax.random.normal(ks[2], shape),
            "hi_im": scale * jax.random.normal(ks[3], shape)}


def resolve_precision(name):
    """None -> jnp default (bf16-class MXU passes on TPU at f32 — the
    precision every RESULTS.md fno measurement ran at); 'default'|'high'|
    'highest' force a jax.lax.Precision everywhere in the layer. On TPU,
    cross-engine checkpoint transfer at the jnp default agrees only to
    ~bf16 rounding per GEMM; 'highest' restores the tight (~1e-4-class)
    engine equivalence the CPU tests exhibit."""
    if name is None:
        return None
    try:
        return {"default": jax.lax.Precision.DEFAULT,
                "high": jax.lax.Precision.HIGH,
                "highest": jax.lax.Precision.HIGHEST}[name]
    except KeyError:
        raise ValueError(f"precision must be None|default|high|highest, "
                         f"got {name!r}") from None


def _mix(block, Wb, prec=None):
    # block (..., C, mx, my) x Wb (C, C_out, mx, my) -> (..., C_out, mx, my)
    return jnp.einsum("...ixy,ioxy->...oxy", block, Wb, precision=prec)


def _spectral_conv_fft(wts, x: Array, mx: int, my: int,
                       prec=None) -> Array:
    """x (..., C, nx, ny) -> (..., C_out, nx, ny): per-retained-mode complex
    channel mixing; all other modes are zeroed (spectral truncation)."""
    nx, ny = x.shape[-2], x.shape[-1]
    xh = jnp.fft.rfft2(x)                       # (..., C, nx, nyh)
    W_lo = jax.lax.complex(wts["lo_re"], wts["lo_im"]).astype(xh.dtype)
    W_hi = jax.lax.complex(wts["hi_re"], wts["hi_im"]).astype(xh.dtype)
    c_out = W_lo.shape[1]

    lo = _mix(xh[..., :, :mx, :my], W_lo, prec)
    hi = _mix(xh[..., :, nx - mx:, :my], W_hi, prec)
    out = jnp.zeros(x.shape[:-3] + (c_out, nx, ny // 2 + 1), xh.dtype)
    out = out.at[..., :, :mx, :my].set(lo)
    out = out.at[..., :, nx - mx:, :my].set(hi)
    return jnp.fft.irfft2(out, s=(nx, ny))


def _spectral_conv_matmul(wts, x: Array, mx: int, my: int,
                          prec=None) -> Array:
    """Mathematically identical to _spectral_conv_fft, but the transforms
    are truncated-mode DFT GEMMs on the MXU instead of XLA's (slow on
    TPU) FFT: forward computes ONLY the retained (2mx, my) coefficient
    block — fr @ x @ fc — and the inverse reconstructs the grid from that
    block alone — Re(gr @ Z @ gc), with gc carrying the irfft
    half-spectrum weights. Same per-mode channel mixing between them, so
    checkpoints transfer between engines unchanged (tested to fp
    tolerance in tests/test_fno.py)."""
    nx, ny = x.shape[-2], x.shape[-1]
    (frr, fri), (fcr, fci), (grr, gri), (gcr, gci) = _dft_mats(
        nx, ny, mx, my, str(x.dtype))
    fc = jax.lax.complex(jnp.asarray(fcr), jnp.asarray(fci))
    gr = jax.lax.complex(jnp.asarray(grr), jnp.asarray(gri))

    # forward: rows (real input -> two real GEMMs), then columns
    tr = jnp.einsum("ka,...ay->...ky", jnp.asarray(frr), x, precision=prec)
    ti = jnp.einsum("ka,...ay->...ky", jnp.asarray(fri), x, precision=prec)
    t = jax.lax.complex(tr, ti)                 # (..., C, 2mx, ny)
    xh = jnp.einsum("...ky,yj->...kj", t, fc,   # (..., C, 2mx, my)
                    precision=prec)

    W_lo = jax.lax.complex(wts["lo_re"], wts["lo_im"]).astype(xh.dtype)
    W_hi = jax.lax.complex(wts["hi_re"], wts["hi_im"]).astype(xh.dtype)
    mixed = jnp.concatenate([_mix(xh[..., :, :mx, :], W_lo, prec),
                             _mix(xh[..., :, mx:, :], W_hi, prec)],
                            axis=-2)

    # inverse: rows back to the grid, then real part of the column stage
    z = jnp.einsum("ak,...kj->...aj", gr, mixed,   # (..., C_out, nx, my)
                   precision=prec)
    return (jnp.einsum("...aj,jb->...ab", z.real, jnp.asarray(gcr),
                       precision=prec)
            - jnp.einsum("...aj,jb->...ab", z.imag, jnp.asarray(gci),
                         precision=prec))


def _spectral_conv(wts, x: Array, mx: int, my: int,
                   engine: str = "fft", prec=None) -> Array:
    if engine == "matmul":
        return _spectral_conv_matmul(wts, x, mx, my, prec)
    return _spectral_conv_fft(wts, x, mx, my, prec)


class FNO2D:
    """Next-step operator on (..., 3, nx, ny) fields."""

    def __init__(self, nx: int, ny: int, width: int = 32, modes: int = 12,
                 depth: int = 4, channels: int = 3,
                 transform: str = "auto", precision: str | None = None):
        if transform not in ("auto", "fft", "matmul"):
            raise ValueError(f"transform must be auto|fft|matmul, got "
                             f"{transform!r}")
        self.nx, self.ny = nx, ny
        self.width, self.depth, self.channels = width, depth, channels
        self.mx = min(modes, nx // 2)
        self.my = min(modes, ny // 2 + 1)
        if transform == "auto":
            transform = ("matmul" if max(nx, ny) <= _MATMUL_MAX_SIDE
                         else "fft")
        self.transform = transform
        # None = jnp default (the precision all RESULTS.md fno numbers
        # ran at); 'highest' tightens TPU cross-engine checkpoint
        # transfer to the CPU-test tolerance — see resolve_precision
        self.precision = resolve_precision(precision)

    def init(self, key) -> dict:
        n_layers = self.depth
        keys = jax.random.split(key, 2 + 2 * n_layers)
        scale = 1.0 / (self.width * self.width)
        p = {
            "lift": dense_init(keys[0], self.channels + 2, self.width),
            "proj": dense_init(keys[1], self.width, self.channels),
            "spectral": [], "bypass": [],
        }
        for l in range(n_layers):
            p["spectral"].append(_spectral_init(
                keys[2 + 2 * l], self.width, self.width,
                self.mx, self.my, scale))
            p["bypass"].append(dense_init(keys[3 + 2 * l],
                                          self.width, self.width))
        return p

    def _coords(self, dtype):
        gx = jnp.linspace(0.0, 1.0, self.nx, dtype=dtype)
        gy = jnp.linspace(0.0, 1.0, self.ny, dtype=dtype)
        X = jnp.broadcast_to(gx[:, None], (self.nx, self.ny))
        Y = jnp.broadcast_to(gy[None, :], (self.nx, self.ny))
        return jnp.stack([X, Y])  # (2, nx, ny)

    def apply(self, params, x: Array) -> Array:
        """x (..., 3, nx, ny) -> next state (..., 3, nx, ny); the model
        learns the residual (identity + correction) for stable rollouts."""
        coords = jnp.broadcast_to(self._coords(x.dtype),
                                  x.shape[:-3] + (2, self.nx, self.ny))
        h = jnp.concatenate([x, coords], axis=-3)     # (..., 3+2, nx, ny)
        # channels-last for the dense ops
        h = jnp.moveaxis(h, -3, -1)
        h = dense(params["lift"], h)
        h = jnp.moveaxis(h, -1, -3)                   # (..., W, nx, ny)
        for wts, byp in zip(params["spectral"], params["bypass"]):
            s = _spectral_conv(wts, h, self.mx, self.my, self.transform,
                               self.precision)
            b = jnp.moveaxis(dense(byp, jnp.moveaxis(h, -3, -1)), -1, -3)
            h = jax.nn.gelu(s + b)
        h = jnp.moveaxis(h, -3, -1)
        out = dense(params["proj"], h)
        out = jnp.moveaxis(out, -1, -3)
        return x + out

    def rollout(self, params, x0: Array, n_steps: int,
                post=None) -> Array:
        """Autoregressive extrapolation: (..., C, nx, ny) -> stacked
        (n_steps, ..., C, nx, ny). `post`, if given, maps each prediction
        back onto a constraint manifold before it is fed forward (e.g.
        divergence projection, dealias filtering — models/projection.py,
        models/vorticity.py)."""
        def body(x, _):
            x = self.apply(params, x)
            if post is not None:
                x = post(x)
            return x, x

        _, xs = jax.lax.scan(body, x0, None, length=n_steps)
        return xs
