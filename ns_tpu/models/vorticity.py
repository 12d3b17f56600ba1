"""Vorticity-space representation helpers for periodic surrogates.

For periodic incompressible 2D flow the scalar vorticity w determines the
full (u, v, p) state exactly (streamfunction recovery + pressure Poisson —
the same identities the spectral solver itself uses,
solvers/spectral_periodic.py:569-601). A surrogate that predicts w instead
of (u, v, p):

  - models 1 channel instead of 3 (the 3 are redundant),
  - is incompressible BY CONSTRUCTION — any w maps to a divergence-free
    (u, v); no projection step needed,
  - cannot drift off the constraint manifold during autoregression the
    way independent (u, v, p) channels do.

These are thin adapters over the spectral solver's own transforms so the
recovered fields match the data-generating solver bit-for-bit in its
conventions (2*pi-periodic domain, integer wavenumbers, rfft2 layout).

Scope of "exact": the vorticity representation spans the ZERO-MEAN
subspace. A uniform background (mean) flow is divergence- and
vorticity-free, so w cannot encode it and uvp_from_w returns zero-mean
u, v (and zero-mean p). That matches the data-generating solver — its
streamfunction velocities are zero-mean by construction — but means a
client state with nonzero mean velocity is implicitly projected (the
mean is dropped) on the way into any w-space surrogate or the solver
oracle (serve/solver.py docstring).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp

from ns_tpu.solvers.spectral_periodic import (
    SpectralPeriodicConfig, _ik_mul, make_ops)

Array = jnp.ndarray


def _cfg(nx: int, ny: int, rho: float = 1.0,
         dtype: str = "float32") -> SpectralPeriodicConfig:
    return SpectralPeriodicConfig(nx=nx, ny=ny, rho=rho, dtype=dtype)


def vorticity_from_uv(u: Array, v: Array, dtype: str = "float32") -> Array:
    """w = dv/dx - du/dy on the solver's periodic grid; (..., nx, ny) ->
    (..., nx, ny) (leading dims broadcast through the FFTs)."""
    nx, ny = u.shape[-2], u.shape[-1]
    ops = make_ops(_cfg(nx, ny, dtype=dtype))
    u_hat = jnp.fft.rfft2(u)
    v_hat = jnp.fft.rfft2(v)
    w_hat = _ik_mul(ops["kx"], v_hat) - _ik_mul(ops["ky"], u_hat)
    return jnp.fft.irfft2(w_hat, s=(nx, ny))


def uvp_from_w(w: Array, rho: float = 1.0,
               dtype: str = "float32") -> tuple[Array, Array, Array]:
    """Exact zero-mean (u, v, p) recovery from a single vorticity field
    (2D only; vmap for batches; mean flow is outside the representation —
    module docstring). u, v via the streamfunction (divergence-free by
    construction); p via the spectral pressure Poisson solve — identical
    formulas to the data-generating solver (fields_from_hat /
    pressure_from_hat, spectral_periodic.py:594-620), with the shared
    velocity spectra computed once instead of once per function."""
    from ns_tpu.solvers.spectral_periodic import velocity_from_vorticity_hat
    nx, ny = w.shape[0], w.shape[1]
    cfg = _cfg(nx, ny, rho=rho, dtype=dtype)
    ops = make_ops(cfg)
    w_hat = jnp.fft.rfft2(w)
    u_hat, v_hat = velocity_from_vorticity_hat(w_hat, ops)
    u = jnp.fft.irfft2(u_hat, s=(nx, ny))
    v = jnp.fft.irfft2(v_hat, s=(nx, ny))
    ux = jnp.fft.irfft2(_ik_mul(ops["kx"], u_hat), s=(nx, ny))
    uy = jnp.fft.irfft2(_ik_mul(ops["ky"], u_hat), s=(nx, ny))
    vx = jnp.fft.irfft2(_ik_mul(ops["kx"], v_hat), s=(nx, ny))
    vy = jnp.fft.irfft2(_ik_mul(ops["ky"], v_hat), s=(nx, ny))
    rhs = -cfg.rho * (ux * ux + 2.0 * uy * vx + vy * vy)
    p = jnp.fft.irfft2(-jnp.fft.rfft2(rhs) * ops["inv_k2"], s=(nx, ny))
    return u, v, p


def dealias_field(w: Array, engine: str = "auto") -> Array:
    """Project a physical field onto the solver's 2/3-rule band — the
    rollout stability filter: keeps autoregressive predictions on the
    band-limited manifold the training data lives on.

    engine: 'fft' masks the rfft2 spectrum; 'matmul' applies the same
    projection as two small REAL GEMMs (the band is +/- symmetric, so the
    composed DFT->mask->inverse row/column operators are real cosine
    kernels) — the per-step FFT cost dominated fno_w serving latency on
    TPU, where small FFTs run far off the roofline (docs/roofline.md).
    'auto' picks matmul at/below the fno matmul crossover. Engines agree
    to fp rounding (tests/test_fno.py)."""
    if engine not in ("auto", "fft", "matmul"):
        raise ValueError(f"engine must be auto|fft|matmul, got {engine!r}")
    nx, ny = w.shape[-2], w.shape[-1]
    if engine == "auto":
        from ns_tpu.models.fno import _MATMUL_MAX_SIDE
        engine = "matmul" if max(nx, ny) <= _MATMUL_MAX_SIDE else "fft"
    if engine == "matmul":
        pr, pc = _dealias_projectors(nx, ny)
        return jnp.einsum("ab,...by->...ay", jnp.asarray(pr),
                          jnp.einsum("...xy,yc->...xc", w, jnp.asarray(pc)))
    import numpy as np
    kx = np.fft.fftfreq(nx, d=1.0 / nx)
    ky = np.fft.rfftfreq(ny, d=1.0 / ny)
    mask = jnp.asarray((np.abs(kx)[:, None] < nx / 3.0)
                       & (np.abs(ky)[None, :] < ny / 3.0))
    return jnp.fft.irfft2(jnp.where(mask, jnp.fft.rfft2(w), 0.0),
                          s=(nx, ny))


@lru_cache(maxsize=16)
def _dealias_projectors(nx: int, ny: int):
    """Real (nx, nx) row and (ny, ny) column projection kernels equal to
    the masked-rfft2 round trip. Row kernel: (1/nx) sum over the
    +/-symmetric retained kx of exp(2i pi kx (a-a')/nx) — real by
    symmetry. Column kernel carries irfft's half-spectrum weights (1 for
    ky=0/Nyquist, 2 otherwise) over retained non-negative ky, then the
    real part. Host-built float64, cached, cast to float32."""
    import numpy as np
    kx = np.fft.fftfreq(nx, d=1.0 / nx)
    keep_x = np.where(np.abs(kx) < nx / 3.0)[0]
    a = np.arange(nx)
    pr = np.zeros((nx, nx))
    for k in kx[keep_x]:
        pr += np.real(np.exp(2j * np.pi * k * (a[:, None] - a[None, :])
                             / nx)) / nx
    ky = np.fft.rfftfreq(ny, d=1.0 / ny)
    keep_y = np.where(ky < ny / 3.0)[0]
    b = np.arange(ny)
    w = np.where((keep_y == 0) | ((ny % 2 == 0) & (keep_y == ny // 2)),
                 1.0, 2.0)
    pc = np.zeros((ny, ny))
    for j, wj in zip(ky[keep_y], w):
        pc += wj * np.cos(2 * np.pi * j * (b[:, None] - b[None, :])
                          / ny) / ny
    return pr.astype(np.float32), pc.T.astype(np.float32)
