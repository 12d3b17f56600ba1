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


def test_simulate_strided_frame_semantics():
    """simulate_strided frame i = state after 1 + spinup + i*stride steps:
    stride=1/spinup=0 reproduces simulate() exactly; stride=2 selects
    simulate()[::2]; spinup=3 selects simulate()[3:]."""
    nx = 32
    cfg = sp.SpectralPeriodicConfig(nt=12, nx=nx, ny=nx, dt=2e-3, nu=1e-3,
                                    dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=4)
    sys_ = sp.NavierStokesSystem(w0, nt=12, nx=nx, ny=nx, dt=2e-3,
                                 nu=1e-3, dtype="float64")
    u, v, p = (np.asarray(a) for a in sys_.simulate())

    su, sv, sp_ = (np.asarray(a) for a in sys_.simulate_strided(12))
    np.testing.assert_allclose(su, u, atol=1e-13)
    np.testing.assert_allclose(sp_, p, atol=1e-13)

    su2, _, _ = (np.asarray(a) for a in sys_.simulate_strided(6, stride=2))
    np.testing.assert_allclose(su2, u[::2], atol=1e-13)

    su3, _, _ = (np.asarray(a)
                 for a in sys_.simulate_strided(9, spinup=3))
    np.testing.assert_allclose(su3, u[3:], atol=1e-13)


def test_simulate_strided_compact_engine():
    """The strided rollout expands compact/real-GEMM carries correctly."""
    import jax as _jax
    from functools import partial as _partial

    nx = 32
    common = dict(nt=6, nx=nx, ny=nx, dt=2e-3, nu=1e-3, dtype="float64")
    cfg_f = sp.SpectralPeriodicConfig(**common)
    cfg_c = sp.SpectralPeriodicConfig(transform="matmul",
                                      matmul_precision="highest",
                                      compact_spectrum=True, **common)
    w_raw = sp.decaying_turbulence_vorticity(cfg_f, seed=5)
    ops = sp.make_ops(cfg_f)
    w0 = jnp.fft.irfft2(jnp.where(ops["mask"], jnp.fft.rfft2(w_raw), 0.0),
                        s=(nx, nx))
    run = lambda cfg: tuple(np.asarray(a) for a in _jax.jit(
        _partial(sp.simulate_strided, cfg),
        static_argnames=("n_frames", "stride", "spinup"))(
            w0, n_frames=3, stride=2, spinup=0))
    uf, vf, pf = run(cfg_f)
    uc, vc, pc = run(cfg_c)
    np.testing.assert_allclose(uc, uf, atol=1e-10)
    np.testing.assert_allclose(pc, pf, atol=1e-10)


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
