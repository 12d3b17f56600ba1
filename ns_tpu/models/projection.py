"""Training-free divergence-free projection of predicted velocity fields.

Paper-inspired (PAPERS.md: enforcing governing-equation constraints in
neural PDE solvers via training-free projections): surrogate predictions
generally violate incompressibility; a Helmholtz projection

    u <- u - grad(phi),   laplace(phi) = div(u)

restores div(u) = 0 exactly without touching the model. Two domain cases:

  - periodic: the projection is diagonal in Fourier space (one rfft2 pair)
  - bounded (the reference's cavity data): phi solves a homogeneous-
    Dirichlet Poisson problem via the geometric multigrid solver
    (2^k+1 grids) with central-difference div/grad, matching the FD
    solvers' discretization

Both are pure jittable functions — usable as a post-processing wrapper on
any model's outputs or inside a training loss.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp

from ns_tpu.ops.multigrid import poisson_multigrid

Array = jnp.ndarray


def project_periodic(u: Array, v: Array) -> tuple[Array, Array]:
    """Exact spectral Helmholtz projection on [0, 2*pi)^2 grids of any
    shape (..., nx, ny). Jitted internally: the module advertises this
    as a standalone post-processor, and eager complex dispatch flakes on
    the axon TPU tunnel (inside an outer jit the wrapper just inlines).
    """
    return _project_periodic_jit(u, v)


@jax.jit
def _project_periodic_jit(u: Array, v: Array) -> tuple[Array, Array]:
    import numpy as np

    nx, ny = u.shape[-2], u.shape[-1]
    kx_np = np.fft.fftfreq(nx, d=1.0 / nx)[:, None]
    ky_np = np.fft.rfftfreq(ny, d=1.0 / ny)[None, :]
    # zero the unpaired Nyquist modes in the derivative operators: i*k on
    # the lone -N/2 mode is not the spectrum of any real field, so keeping
    # it breaks exactness through the irfft Hermitian projection
    if nx % 2 == 0:
        kx_np = kx_np.copy()
        kx_np[nx // 2, 0] = 0.0
    if ny % 2 == 0:
        ky_np = ky_np.copy()
        ky_np[0, -1] = 0.0
    kx = jnp.asarray(kx_np, u.dtype)
    ky = jnp.asarray(ky_np, u.dtype)
    k2 = kx * kx + ky * ky
    inv_k2 = jnp.where(k2 == 0.0, 0.0, 1.0 / jnp.where(k2 == 0.0, 1.0, k2))

    uh = jnp.fft.rfft2(u)
    vh = jnp.fft.rfft2(v)
    div_h = jax.lax.complex(-(kx * uh.imag + ky * vh.imag),
                            kx * uh.real + ky * vh.real)  # i kx uh + i ky vh
    phi_h = -div_h * inv_k2          # laplace(phi) = div  ->  -k^2 phi = div
    # u - d(phi)/dx = u - i kx phi
    grad_x = jax.lax.complex(-kx * phi_h.imag, kx * phi_h.real)
    grad_y = jax.lax.complex(-ky * phi_h.imag, ky * phi_h.real)
    u_p = jnp.fft.irfft2(uh - grad_x, s=(nx, ny))
    v_p = jnp.fft.irfft2(vh - grad_y, s=(nx, ny))
    return u_p, v_p


def divergence_central(u: Array, v: Array, dx: float, dy: float) -> Array:
    """Interior central-difference divergence (reference direct_fd axis
    convention: x along axis 1), zero on the boundary ring."""
    div = jnp.zeros_like(u)
    interior = ((u[1:-1, 2:] - u[1:-1, :-2]) / (2 * dx)
                + (v[2:, 1:-1] - v[:-2, 1:-1]) / (2 * dy))
    return div.at[1:-1, 1:-1].set(interior)


def divergence_backward(u: Array, v: Array, dx: float, dy: float) -> Array:
    """Backward-difference divergence (x along axis 1), zero where
    undefined (first row/col). This is the adjoint-consistent partner of
    the forward gradient: D_bwd(G_fwd phi) = compact 5-point laplacian."""
    div = jnp.zeros_like(u)
    interior = ((u[1:, 1:] - u[1:, :-1]) / dx
                + (v[1:, 1:] - v[:-1, 1:]) / dy)
    return div.at[1:, 1:].set(interior)


def project_bounded(u: Array, v: Array, dx: float, dy: float,
                    n_cycles: int = 10) -> tuple[Array, Array]:
    """Discrete Helmholtz projection on a bounded 2^k+1 grid with a
    CONSISTENT operator pair: backward divergence + forward gradient, whose
    composition is exactly the compact 5-point Laplacian the multigrid
    solves. With phi = 0 on the boundary, the projected field satisfies
    D_bwd(u', v') = 0 exactly on interior points (up to the solver
    tolerance); the central-difference divergence is then O(h) small for
    smooth fields. Boundary values (the surrogate's BC reproduction) stay
    untouched except the forward-gradient update on columns/rows < n-1.
    """
    d = divergence_backward(u, v, dx, dy)
    # zero the boundary ring of the rhs: multigrid solves the interior
    d = d.at[0, :].set(0.0).at[-1, :].set(0.0).at[:, 0].set(0.0).at[:, -1].set(0.0)
    # spacings SWAPPED on purpose: this module's div/grad put x along
    # axis 1 (reference direct_fd convention) while poisson_multigrid's
    # Laplacian applies its first spacing along axis 0 (chorin_fd
    # convention) — passing (dx, dy) unswapped solves a transposed-
    # coefficient operator and anisotropic grids get WORSE after
    # "projection" (regression-tested in tests/test_projection.py)
    phi = poisson_multigrid(jnp.zeros_like(u), d, dy, dx,
                            n_cycles=n_cycles)
    gx = jnp.zeros_like(u).at[:, :-1].set((phi[:, 1:] - phi[:, :-1]) / dx)
    gy = jnp.zeros_like(v).at[:-1, :].set((phi[1:, :] - phi[:-1, :]) / dy)
    return u - gx, v - gy


def project_leray3d(u: Array, v: Array, w: Array
                    ) -> tuple[Array, Array, Array]:
    """Exact spectral Leray projection on [0, 2*pi)^3 grids of any shape
    (..., nx, ny, nz) — the 3D counterpart of project_periodic, for 3D
    surrogate rollouts (u <- u - grad(inv_lap(div u)), diagonal in
    Fourier space). Jitted internally (axon eager-complex hazard)."""
    return _project_leray3d_jit(u, v, w)


@jax.jit
def _project_leray3d_jit(u: Array, v: Array, w: Array):
    import numpy as np

    nx, ny, nz = u.shape[-3], u.shape[-2], u.shape[-1]
    kx = np.fft.fftfreq(nx, d=1.0 / nx)[:, None, None].copy()
    ky = np.fft.fftfreq(ny, d=1.0 / ny)[None, :, None].copy()
    kz = np.fft.rfftfreq(nz, d=1.0 / nz)[None, None, :].copy()
    # zero the unpaired Nyquist modes in the derivative operators — i*k on
    # a lone -N/2 mode is not the spectrum of any real field, so keeping
    # it breaks exactness through the irfftn Hermitian projection (same
    # treatment as _project_periodic_jit above)
    if nx % 2 == 0:
        kx[nx // 2] = 0.0
    if ny % 2 == 0:
        ky[0, ny // 2] = 0.0
    if nz % 2 == 0:
        kz[0, 0, -1] = 0.0
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    kxj = jnp.asarray(kx, u.dtype)
    kyj = jnp.asarray(ky, u.dtype)
    kzj = jnp.asarray(kz, u.dtype)
    inv = jnp.asarray(inv_k2, u.dtype)
    axes = (-3, -2, -1)
    uh = jnp.fft.rfftn(u, axes=axes)
    vh = jnp.fft.rfftn(v, axes=axes)
    wh = jnp.fft.rfftn(w, axes=axes)
    kdot = kxj * uh + kyj * vh + kzj * wh
    corr = kdot * inv
    s = (nx, ny, nz)
    return (jnp.fft.irfftn(uh - kxj * corr, s=s, axes=axes),
            jnp.fft.irfftn(vh - kyj * corr, s=s, axes=axes),
            jnp.fft.irfftn(wh - kzj * corr, s=s, axes=axes))


@lru_cache(maxsize=8)
def _rollout_filter3d_jit(project: bool, dealias: bool):
    """Jitted (u, v, w, p)-stacked 3D rollout filter, cached per flag
    combination (a fresh jit per call would recompile every rollout)."""

    @jax.jit
    def filt(x):
        import numpy as np

        nx, ny, nz = x.shape[-3], x.shape[-2], x.shape[-1]
        axes = (-3, -2, -1)
        xh = jnp.fft.rfftn(x, axes=axes)
        if dealias:
            mx = np.abs(np.fft.fftfreq(nx, 1 / nx)) < nx / 3.0
            my = np.abs(np.fft.fftfreq(ny, 1 / ny)) < ny / 3.0
            mz = np.abs(np.fft.rfftfreq(nz, 1 / nz)) < nz / 3.0
            mask = (mx[:, None, None] & my[None, :, None]
                    & mz[None, None, :])
            xh = jnp.where(jnp.asarray(mask), xh, 0.0)
        if project:
            kx = np.fft.fftfreq(nx, d=1.0 / nx)[:, None, None].copy()
            ky = np.fft.fftfreq(ny, d=1.0 / ny)[None, :, None].copy()
            kz = np.fft.rfftfreq(nz, d=1.0 / nz)[None, None, :].copy()
            if nx % 2 == 0:
                kx[nx // 2] = 0.0
            if ny % 2 == 0:
                ky[0, ny // 2] = 0.0
            if nz % 2 == 0:
                kz[0, 0, -1] = 0.0
            k2 = kx * kx + ky * ky + kz * kz
            inv = np.where(k2 == 0.0, 0.0,
                           1.0 / np.where(k2 == 0.0, 1.0, k2))
            kxj, kyj, kzj = (jnp.asarray(a, x.dtype) for a in (kx, ky, kz))
            invj = jnp.asarray(inv, x.dtype)
            uh = xh[..., 0, :, :, :]
            vh = xh[..., 1, :, :, :]
            wh = xh[..., 2, :, :, :]
            corr = (kxj * uh + kyj * vh + kzj * wh) * invj
            xh = jnp.stack([uh - kxj * corr, vh - kyj * corr,
                            wh - kzj * corr, xh[..., 3, :, :, :]],
                           axis=-4)
        return jnp.fft.irfftn(xh, s=(nx, ny, nz), axes=axes)

    return filt


def rollout_filter3d(x: Array, project: bool = True,
                     dealias: bool = True) -> Array:
    """Constraint filter for 3D surrogate rollouts on channel-stacked
    (..., 4, nx, ny, nz) (u, v, w, p) states: 2/3-band dealias of every
    channel (the rollout stability filter — high-wavenumber prediction
    noise compounds autoregressively, the 2D fno_w lesson) and/or the
    exact Nyquist-safe Leray projection of the velocity channels. One
    spectral round trip for both. Jitted internally."""
    if not (project or dealias):
        return x
    return _rollout_filter3d_jit(bool(project), bool(dealias))(x)
