"""Training-free divergence projection tests."""

import pytest
import jax.numpy as jnp
import numpy as np

from ns_tpu.models.projection import (divergence_backward, divergence_central,
                                      project_bounded, project_periodic)


def spectral_div(u, v):
    """Spectral divergence with the same zero-Nyquist derivative convention
    as the projection operator."""
    nx, ny = u.shape
    kx = np.fft.fftfreq(nx, d=1.0 / nx)[:, None].copy()
    ky = np.fft.rfftfreq(ny, d=1.0 / ny)[None, :].copy()
    if nx % 2 == 0:
        kx[nx // 2, 0] = 0.0
    if ny % 2 == 0:
        ky[0, -1] = 0.0
    dh = 1j * kx * np.fft.rfft2(np.asarray(u)) \
        + 1j * ky * np.fft.rfft2(np.asarray(v))
    return np.fft.irfft2(dh, s=(nx, ny))


def test_periodic_projection_kills_divergence():
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(32, 32)))
    v = jnp.asarray(rng.normal(size=(32, 32)))
    u_p, v_p = project_periodic(u, v)
    assert np.abs(spectral_div(u_p, v_p)).max() < 1e-12
    # idempotent
    u_pp, v_pp = project_periodic(u_p, v_p)
    np.testing.assert_allclose(np.asarray(u_pp), np.asarray(u_p), atol=1e-12)
    # divergence-free input passes through unchanged
    psi = rng.normal(size=(32, 32))
    psih = np.fft.rfft2(psi)
    kx = np.fft.fftfreq(32, d=1 / 32)[:, None]
    ky = np.fft.rfftfreq(32, d=1 / 32)[None, :]
    ud = np.fft.irfft2(1j * ky * psih, s=(32, 32))
    vd = np.fft.irfft2(-1j * kx * psih, s=(32, 32))
    u2, v2 = project_periodic(jnp.asarray(ud), jnp.asarray(vd))
    np.testing.assert_allclose(np.asarray(u2), ud, atol=1e-12)


@pytest.mark.slow
def test_bounded_projection_kills_backward_divergence():
    """In the projection's own (backward-difference) metric, interior
    divergence vanishes to solver tolerance — the consistent-pair identity
    D_bwd(G_fwd phi) = compact laplacian."""
    n = 65
    dx = dy = 2.0 / (n - 1)
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(n, n)))
    v = jnp.asarray(rng.normal(size=(n, n)))
    d0 = np.abs(np.asarray(divergence_backward(u, v, dx, dy))[1:-1, 1:-1]).max()
    u_p, v_p = project_bounded(u, v, dx, dy, n_cycles=12)
    d1 = np.abs(np.asarray(divergence_backward(u_p, v_p, dx, dy))[1:-1, 1:-1]).max()
    assert d1 < 1e-6 * d0, (d0, d1)


def test_bounded_projection_smooth_central_divergence():
    """On smooth near-solenoidal fields (the surrogate-output regime) the
    central-difference divergence also drops away from the edge ring (the
    ring carries O(1-cell) truncation artifacts of the forward-gradient
    cutoff — inherent to bounded staggered-pair projections)."""
    n = 65
    dx = dy = 2.0 / (n - 1)
    x = np.linspace(-1, 1, n)
    Y, X = np.meshgrid(x, x, indexing="ij")  # x along axis 1 (metric conv.)
    u = jnp.asarray(
        np.sin(np.pi * X) ** 2 * 2 * np.pi * np.sin(np.pi * Y)
        * np.cos(np.pi * Y)
        + 2 * np.pi * 0.05 * np.cos(2 * np.pi * X) * np.sin(np.pi * Y))
    v = jnp.asarray(
        -2 * np.pi * np.sin(np.pi * X) * np.cos(np.pi * X)
        * np.sin(np.pi * Y) ** 2
        + np.pi * 0.05 * np.sin(2 * np.pi * X) * np.cos(np.pi * Y))
    u_p, v_p = project_bounded(u, v, dx, dy, n_cycles=12)
    d0 = np.abs(np.asarray(divergence_central(u, v, dx, dy))[4:-4, 4:-4]).max()
    d1 = np.abs(np.asarray(
        divergence_central(u_p, v_p, dx, dy))[4:-4, 4:-4]).max()
    assert d1 < 0.5 * d0, (d0, d1)


def test_bounded_projection_anisotropic_grid():
    """dx != dy: the projection must still kill the backward divergence.
    Regression: poisson_multigrid applies its first spacing along axis 0
    while this module's operators put x along axis 1 — unswapped
    spacings solved a transposed-coefficient operator and the
    'projection' INCREASED divergence ~3x on anisotropic grids."""
    n = 33
    dx, dy = 1.0 / (n - 1), 3.0 / (n - 1)
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=(n, n)))
    v = jnp.asarray(rng.normal(size=(n, n)))
    d0 = np.abs(np.asarray(divergence_backward(u, v, dx, dy))[1:-1, 1:-1]).max()
    u_p, v_p = project_bounded(u, v, dx, dy, n_cycles=14)
    d1 = np.abs(np.asarray(divergence_backward(u_p, v_p, dx, dy))[1:-1, 1:-1]).max()
    assert d1 < 1e-6 * d0, (d0, d1)
