"""Tests for the periodic Fourier pseudospectral solver (TPU showcase).

Validation strategy (SURVEY.md §4e — property tests): the Taylor-Green
vortex has the exact solution omega(t) = omega(0) * exp(-2 nu k^2 t), which
gates the full step (projection + advection + diffusion): for TG the
advection term vanishes identically, and any projection/dealiasing error
would break the analytic decay. Divergence-free-ness holds by construction.
"""

import jax.numpy as jnp
import numpy as np

from ns_tpu.solvers import spectral_periodic as sp


def test_taylor_green_analytic_decay():
    cfg = sp.SpectralPeriodicConfig(nt=100, nx=64, ny=64, dt=0.01, nu=0.01,
                                    dtype="float64")
    w0 = sp.taylor_green_vorticity(cfg, k=1)
    carry = sp.init_from_vorticity(cfg, w0)
    w_hat, _ = sp.rollout_final(cfg, carry)
    w_final = jnp.fft.irfft2(w_hat, s=(cfg.nx, cfg.ny))
    t = cfg.nt * cfg.dt
    w_exact = np.asarray(w0) * np.exp(-2.0 * cfg.nu * t)
    np.testing.assert_allclose(np.asarray(w_final), w_exact,
                               rtol=0, atol=1e-10)


def test_divergence_free_by_construction():
    cfg = sp.SpectralPeriodicConfig(nt=20, nx=64, ny=64, dt=0.005, nu=1e-3,
                                    dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=3)
    carry = sp.init_from_vorticity(cfg, w0)
    w_hat, _ = sp.rollout_final(cfg, carry)
    assert float(sp.divergence_max(cfg, w_hat)) < 1e-12


def test_decaying_turbulence_energy_monotone():
    """Total kinetic energy must decay (nu > 0, no forcing)."""
    cfg = sp.SpectralPeriodicConfig(nt=50, nx=64, ny=64, dt=0.002, nu=5e-3,
                                    dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0)
    carry = sp.init_from_vorticity(cfg, w0)
    w_hats = sp.simulate_hat(cfg, carry)

    def energy(w_hat):
        _, spec = sp.energy_spectrum(cfg, w_hat)
        return float(jnp.sum(spec))

    e_first = energy(w_hats[0])
    e_last = energy(w_hats[-1])
    assert np.isfinite(e_first) and np.isfinite(e_last)
    assert e_last < e_first


def test_system_api_shapes():
    cfg_nx = 32
    cfg = sp.SpectralPeriodicConfig(nx=cfg_nx, ny=cfg_nx)
    w0 = sp.taylor_green_vorticity(cfg)
    sys_ = sp.NavierStokesSystem(w0, nt=5, nx=cfg_nx, ny=cfg_nx,
                                 dt=0.001, nu=1e-3)
    u, v, p = sys_.simulate()
    assert u.shape == (5, cfg_nx, cfg_nx)
    assert p.shape == (5, cfg_nx, cfg_nx)
    assert np.isfinite(np.asarray(u)).all()


def test_pressure_taylor_green():
    """TG pressure is analytic. For u = sin(x)cos(y), v = -cos(x)sin(y)
    (the orientation taylor_green_vorticity produces), momentum balance
    gives p = +rho/4 (cos 2x + cos 2y), up to the gauge mean."""
    cfg = sp.SpectralPeriodicConfig(nx=64, ny=64, dtype="float64")
    w0 = sp.taylor_green_vorticity(cfg, k=1)
    w_hat = jnp.fft.rfft2(jnp.asarray(w0, cfg.real_dtype))
    p = np.asarray(sp.pressure_from_hat(cfg, w_hat))
    x = np.arange(cfg.nx) * 2 * np.pi / cfg.nx
    X, Y = np.meshgrid(x, x, indexing="ij")
    p_exact = 0.25 * (np.cos(2 * X) + np.cos(2 * Y))
    p_exact -= p_exact.mean()
    np.testing.assert_allclose(p - p.mean(), p_exact, atol=1e-10)
