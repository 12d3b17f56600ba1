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
"""

from __future__ import annotations

import jax.numpy as jnp

from ns_tpu.solvers.spectral_periodic import (
    SpectralPeriodicConfig, _ik_mul, fields_from_hat, make_ops,
    pressure_from_hat)

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
    """Exact (u, v, p) recovery from a single vorticity field (2D only;
    vmap for batches). u, v via the streamfunction (divergence-free by
    construction); p via the spectral pressure Poisson solve — identical
    formulas to the data-generating solver."""
    cfg = _cfg(w.shape[0], w.shape[1], rho=rho, dtype=dtype)
    w_hat = jnp.fft.rfft2(w)
    u, v, _ = fields_from_hat(cfg, w_hat)
    p = pressure_from_hat(cfg, w_hat)
    return u, v, p


def dealias_field(w: Array) -> Array:
    """Project a physical field onto the solver's 2/3-rule band — the
    rollout stability filter: keeps autoregressive predictions on the
    band-limited manifold the training data lives on."""
    import numpy as np
    nx, ny = w.shape[-2], w.shape[-1]
    kx = np.fft.fftfreq(nx, d=1.0 / nx)
    ky = np.fft.rfftfreq(ny, d=1.0 / ny)
    mask = jnp.asarray((np.abs(kx)[:, None] < nx / 3.0)
                       & (np.abs(ky)[None, :] < ny / 3.0))
    return jnp.fft.irfft2(jnp.where(mask, jnp.fft.rfft2(w), 0.0),
                          s=(nx, ny))
