"""Vorticity-space representation helpers for 3D periodic surrogates.

The 3D counterpart of models/vorticity.py (VERDICT r3 next #1): for
periodic incompressible 3D flow the vorticity field omega = curl(u)
determines the full (u, v, w, p) state exactly on the zero-mean subspace,
via the spectral Biot-Savart inversion

    u_hat = i k x omega_hat / |k|^2

(k x omega_hat = k x (i k x u_hat) = -i |k|^2 u_hat for solenoidal u).
A surrogate that predicts omega instead of (u, v, w, p):

  - models 3 channels instead of 4 (p is diagnostic),
  - recovers an EXACTLY divergence-free velocity for ANY predicted
    omega — k . (k x omega_hat) = 0 identically, so the Biot-Savart
    recovery IS the Leray projection, baked into the representation
    (no post-hoc projection step, the 2D fno_w lesson in 3D),
  - cannot drift off the incompressibility manifold during closed-loop
    autoregression the way independent (u, v, w) channels do.

Same scope caveat as 2D: the representation spans the zero-mean subspace
(a uniform mean flow is curl-free), matching the data-generating solver
whose mean mode is pinned (solvers/spectral3d.py nonlinear_term).

These adapters reuse the 3D solver's own wavenumber tables and
conventions (2*pi-periodic box, integer wavenumbers, rfftn layout,
solvers/spectral3d.py:149-217) so recovered fields match the solver
bit-for-bit in its conventions.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.solvers.spectral3d import (Spectral3DConfig, _dealias_mask_np,
                                       _wavenumbers_np)

Array = jnp.ndarray


@lru_cache(maxsize=16)
def _ops(nx: int, ny: int, nz: int, dtype: str = "float32"):
    """HOST numpy wavenumber tables of the full rfftn layout (these
    helpers transform raw physical fields, not the solver's compact
    spectrum). Host-side on purpose: an lru_cache of device arrays
    populated under a jit trace would cache that trace's constants and
    leak them into every later trace (UnexpectedTracerError); numpy
    constants are trace-neutral and XLA folds the asarray at use sites."""
    cfg = Spectral3DConfig(nx=nx, ny=ny, nz=nz, dtype=dtype,
                           transform="fft", dealias=True)
    kx, ky, kz = _wavenumbers_np(cfg)
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    dt = np.dtype(dtype)
    return cfg, dict(kx=kx.astype(dt), ky=ky.astype(dt),
                     kz=kz.astype(dt), inv_k2=inv_k2.astype(dt),
                     mask=_dealias_mask_np(cfg))


# i*k multiply without complex literals (axon hazard): the canonical
# helper lives with the 2D periodic engine.
from ns_tpu.solvers.spectral_periodic import _ik_mul as _imul


def _curl_hat(ops, f_hat: Array) -> Array:
    """(i k x f)_hat for stacked (..., 3, nx, ny, nzh) spectra."""
    fx, fy, fz = f_hat[..., 0, :, :, :], f_hat[..., 1, :, :, :], \
        f_hat[..., 2, :, :, :]
    cx = _imul(ops["ky"], fz) - _imul(ops["kz"], fy)
    cy = _imul(ops["kz"], fx) - _imul(ops["kx"], fz)
    cz = _imul(ops["kx"], fy) - _imul(ops["ky"], fx)
    return jnp.stack([cx, cy, cz], axis=-4)


def vorticity3d_from_velocity(uvw: Array, dtype: str = "float32") -> Array:
    """omega = curl(u) on the solver's periodic grid:
    (..., 3, nx, ny, nz) velocity -> (..., 3, nx, ny, nz) vorticity
    (leading dims broadcast through the FFTs). 2/3-band-limited: the
    representation lives on the solver's dealiased manifold (the unpaired
    Nyquist planes, where rfftn Hermitianization breaks the curl/div
    identities, are outside it)."""
    nx, ny, nz = uvw.shape[-3], uvw.shape[-2], uvw.shape[-1]
    _, ops = _ops(nx, ny, nz, dtype)
    u_hat = jnp.fft.rfftn(uvw, axes=(-3, -2, -1))
    return jnp.fft.irfftn(jnp.where(ops["mask"], _curl_hat(ops, u_hat), 0.0),
                          s=(nx, ny, nz), axes=(-3, -2, -1))


def velocity_from_vorticity3d_hat(ops, om_hat: Array) -> Array:
    """Biot-Savart: u_hat = i k x omega_hat / |k|^2 on the 2/3 band,
    exactly solenoidal for ANY om_hat (k . (k x a) = 0 identically on the
    paired modes; the band mask removes the unpaired Nyquist planes where
    the identity fails under Hermitian symmetrization); the k = 0 mode
    maps to zero (mean flow is outside the representation)."""
    return jnp.where(ops["mask"], _curl_hat(ops, om_hat) * ops["inv_k2"],
                     0.0)


def uvwp_from_omega(omega: Array, rho: float = 1.0,
                    dtype: str = "float32") -> Array:
    """Exact zero-mean (u, v, w, p) recovery from a (3, nx, ny, nz)
    vorticity field (vmap for batches): velocity by Biot-Savart
    (divergence-free by construction), diagnostic pressure by the same
    spectral Poisson solve as the data-generating solver
    (solvers/spectral3d.py::pressure_from_hat formulas, one shared
    transform batch). Returns (4, nx, ny, nz)."""
    nx, ny, nz = omega.shape[-3], omega.shape[-2], omega.shape[-1]
    _, ops = _ops(nx, ny, nz, dtype)
    om_hat = jnp.fft.rfftn(omega, axes=(-3, -2, -1))
    u_hat = velocity_from_vorticity3d_hat(ops, om_hat)
    u = jnp.fft.irfftn(u_hat, s=(nx, ny, nz), axes=(-3, -2, -1))
    return jnp.concatenate([u, _pressure_from_u(ops, u, rho)[None]],
                           axis=0)


def vecpot_from_velocity(uvw: Array, dtype: str = "float32") -> Array:
    """Coulomb-gauge vector potential A with curl(A) = u:
    A_hat = i k x u_hat / |k|^2 — (..., 3, nx, ny, nz) -> same shape.

    The SMOOTH divergence-free representation: where omega = curl(u)
    steepens the velocity spectrum by k (rough target, closed-loop
    high-wavenumber noise is amplified on recovery), A flattens it by
    1/k — prediction noise at high k is DAMPED by the curl recovery.
    div A = 0 by construction (k . (k x a) = 0), and for solenoidal
    zero-mean u, curl A = -(k x (k x u_hat))/|k|^2 = u_hat exactly on
    the 2/3 band (same scope notes as the omega representation)."""
    nx, ny, nz = uvw.shape[-3], uvw.shape[-2], uvw.shape[-1]
    _, ops = _ops(nx, ny, nz, dtype)
    u_hat = jnp.fft.rfftn(uvw, axes=(-3, -2, -1))
    a_hat = jnp.where(ops["mask"], _curl_hat(ops, u_hat) * ops["inv_k2"],
                      0.0)
    return jnp.fft.irfftn(a_hat, s=(nx, ny, nz), axes=(-3, -2, -1))


def uvwp_from_vecpot(A: Array, rho: float = 1.0,
                     dtype: str = "float32") -> Array:
    """Exact zero-mean (u, v, w, p) recovery from a (3, nx, ny, nz)
    vector potential (vmap for batches): u = curl(A) — divergence-free
    for ANY predicted A (div curl = 0 identically on the paired modes;
    the band mask removes the unpaired Nyquist planes) — and the same
    diagnostic spectral pressure as uvwp_from_omega."""
    nx, ny, nz = A.shape[-3], A.shape[-2], A.shape[-1]
    _, ops = _ops(nx, ny, nz, dtype)
    a_hat = jnp.fft.rfftn(A, axes=(-3, -2, -1))
    u_hat = jnp.where(ops["mask"], _curl_hat(ops, a_hat), 0.0)
    u = jnp.fft.irfftn(u_hat, s=(nx, ny, nz), axes=(-3, -2, -1))
    return jnp.concatenate([u, _pressure_from_u(ops, u, rho)[None]],
                           axis=0)


def _pressure_from_u(ops, u: Array, rho: float = 1.0) -> Array:
    """Diagnostic spectral pressure from physical velocity (the shared
    tail of uvwp_from_omega / uvwp_from_vecpot; solver formulas —
    solvers/spectral3d.py::pressure_from_hat)."""
    nx, ny, nz = u.shape[-3], u.shape[-2], u.shape[-1]
    prods = jnp.stack([u[0] * u[0], u[1] * u[1], u[2] * u[2],
                       u[0] * u[1], u[0] * u[2], u[1] * u[2]])
    T = jnp.fft.rfftn(prods, axes=(-3, -2, -1))
    kk = (ops["kx"] ** 2 * T[0] + ops["ky"] ** 2 * T[1]
          + ops["kz"] ** 2 * T[2]
          + 2.0 * (ops["kx"] * ops["ky"] * T[3]
                   + ops["kx"] * ops["kz"] * T[4]
                   + ops["ky"] * ops["kz"] * T[5]))
    p_hat = -rho * kk * ops["inv_k2"]
    return jnp.fft.irfftn(p_hat, s=(nx, ny, nz), axes=(-3, -2, -1))


# 3D divergence-free representation registry: model name ->
# (to_representation(uvw), to_uvwp(field)). Trainer/ensemble/serving all
# dispatch through this table so adding a representation is one entry.
def repr3d_fns(model: str):
    return {"fno3d_w": (vorticity3d_from_velocity, uvwp_from_omega),
            "fno3d_a": (vecpot_from_velocity, uvwp_from_vecpot)}[model]


def dealias_field3d(x: Array) -> Array:
    """Project (..., nx, ny, nz) physical fields onto the solver's
    2/3-rule band — the closed-loop stability filter keeping fed-back
    predictions on the band-limited manifold the training data lives on
    (models/projection.py::rollout_filter3d's dealias arm, minus the
    (u,v,w)-specific Leray step the omega representation makes
    redundant)."""
    nx, ny, nz = x.shape[-3], x.shape[-2], x.shape[-1]
    import numpy as np
    kx = np.fft.fftfreq(nx, d=1.0 / nx)
    ky = np.fft.fftfreq(ny, d=1.0 / ny)
    kz = np.fft.rfftfreq(nz, d=1.0 / nz)
    mask = jnp.asarray((np.abs(kx)[:, None, None] < nx / 3.0)
                       & (np.abs(ky)[None, :, None] < ny / 3.0)
                       & (kz[None, None, :] < nz / 3.0))
    x_hat = jnp.fft.rfftn(x, axes=(-3, -2, -1))
    return jnp.fft.irfftn(jnp.where(mask, x_hat, 0.0), s=(nx, ny, nz),
                          axes=(-3, -2, -1))
