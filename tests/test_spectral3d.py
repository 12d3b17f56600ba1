"""3D periodic pseudospectral family: physics + engine validation.

The load-bearing test is the 2D-embedding equivalence: a z-independent
(u(x,y), v(x,y), 0) state must evolve so that the curl of the 3D update
equals the 2D vorticity solver's update at every step (both families use
the identical IF-AB2 scheme) — the 3D solver is cross-validated against
the golden-validated 2D family, not just against itself.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.solvers import spectral3d as s3
from ns_tpu.solvers import spectral_periodic as sp


def _cfg(**kw):
    kw.setdefault("dtype", "float64")
    kw.setdefault("transform", "fft")
    return s3.Spectral3DConfig(**kw)


def test_shear_flow_exact_viscous_decay():
    # u = (sin z, 0, 0): the Lamb vector is a pure z-gradient, so the
    # Leray projection annihilates the nonlinearity exactly and IF-AB2
    # reduces to the exact factor exp(-nu*t) per step.
    cfg = _cfg(nt=50, nx=8, ny=8, nz=12, dt=1e-3, nu=0.1)
    z = 2.0 * np.pi * np.arange(cfg.nz) / cfg.nz
    u0 = np.zeros((3, cfg.nx, cfg.ny, cfg.nz))
    u0[0] = np.sin(z)[None, None, :]
    carry = s3.init_from_velocity(cfg, u0)
    final = jax.jit(lambda c: s3.rollout_final(cfg, c))(carry)
    u_fin = jax.jit(lambda z_: s3.fields_from_hat(cfg, z_))(final[0])
    expected = u0 * np.exp(-cfg.nu * cfg.nt * cfg.dt)
    np.testing.assert_allclose(np.asarray(u_fin), expected, atol=1e-12)


def test_embedding_matches_2d_solver():
    # z-independent IC: curl_z of the 3D rollout == the 2D vorticity
    # rollout, step for step, to fp rounding (identical IF-AB2 schemes).
    nx = ny = 16
    nt = 10
    cfg2 = sp.SpectralPeriodicConfig(nt=nt, nx=nx, ny=ny, dt=1e-3, nu=1e-2,
                                     dtype="float64", transform="fft")
    w0 = np.asarray(sp.decaying_turbulence_vorticity(cfg2, seed=3,
                                                     k_peak=3.0))
    # band-limit below the 2/3 cutoff: the 2D fft engine carries
    # above-cutoff modes passively, the 3D engine truncates them at init
    mask = np.abs(np.fft.fftfreq(nx, 1 / nx))[:, None] < nx / 3.0
    mask = mask & (np.abs(np.fft.rfftfreq(ny, 1 / ny))[None, :] < ny / 3.0)
    w0 = np.fft.irfft2(np.where(mask, np.fft.rfft2(w0), 0.0), s=(nx, ny))

    carry2 = sp.init_from_vorticity(cfg2, w0)
    u2d, v2d, _ = jax.jit(lambda h: sp.fields_from_hat(cfg2, h))(carry2[0])
    w2_fin = jax.jit(lambda c: sp.rollout_final(cfg2, c))(carry2)[0]
    w2d_fin = np.asarray(jnp.fft.irfft2(w2_fin, s=(nx, ny)))

    cfg3 = _cfg(nt=nt, nx=nx, ny=ny, nz=4, dt=1e-3, nu=1e-2)
    u0 = np.zeros((3, nx, ny, cfg3.nz))
    u0[0] = np.asarray(u2d)[:, :, None]
    u0[1] = np.asarray(v2d)[:, :, None]
    carry3 = s3.init_from_velocity(cfg3, u0)
    fin3 = jax.jit(lambda c: s3.rollout_final(cfg3, c))(carry3)

    ops3 = s3.make_ops(cfg3)
    wz_fin = jax.jit(lambda u: s3.fields_from_hat(
        cfg3, s3.vorticity_from_velocity_hat(ops3, u)))(fin3[0])[2]
    wz_fin = np.asarray(wz_fin)
    # every z-slice identical and equal to the 2D field
    for kz in range(cfg3.nz):
        np.testing.assert_allclose(wz_fin[:, :, kz], w2d_fin, rtol=0,
                                   atol=1e-12 * np.abs(w2d_fin).max())


@pytest.mark.parametrize("transform", ["fft", "matmul"])
def test_divergence_free_by_construction(transform):
    cfg = _cfg(nt=10, nx=12, ny=12, nz=12, nu=1e-3, transform=transform,
               matmul_precision="highest")
    u0 = s3.random_solenoidal_velocity(cfg, seed=0, k_peak=2.0)
    carry = s3.init_from_velocity(cfg, u0)
    final = jax.jit(lambda c: s3.rollout_final(cfg, c))(carry)
    div = jax.jit(lambda z: s3.divergence_max(cfg, z))(final[0])
    assert float(div) < 1e-12


def test_engine_agreement_fft_vs_matmul():
    # both engines see identical dynamics (the fft init masks above-cutoff
    # modes, matching the matmul truncation); f64 'highest' agrees to
    # rounding
    kw = dict(nt=5, nx=12, ny=18, nz=12, dt=1e-3, nu=1e-3)
    cfg_f = _cfg(transform="fft", **kw)
    cfg_m = _cfg(transform="matmul", matmul_precision="highest", **kw)
    u0 = s3.random_solenoidal_velocity(cfg_f, seed=1, k_peak=2.0)
    fin_f = jax.jit(lambda c: s3.rollout_final(cfg_f, c))(
        s3.init_from_velocity(cfg_f, u0))[0]
    fin_m = jax.jit(lambda c: s3.rollout_final(cfg_m, c))(
        s3.init_from_velocity(cfg_m, u0))[0]
    full_m = np.asarray(jax.jit(
        lambda z: s3.expand_compact(cfg_m, z))(fin_m))
    fin_f = np.asarray(fin_f)
    scale = np.abs(fin_f).max()
    np.testing.assert_allclose(full_m, fin_f, atol=1e-12 * scale)


def test_compact_expand_gather_roundtrip():
    cfg = _cfg(transform="matmul", nx=12, ny=12, nz=18,
               matmul_precision="highest")
    rng = np.random.default_rng(0)
    rows_x, rows_y, kzc = s3._compact_meta(cfg)
    z = (rng.standard_normal((3, len(rows_x), len(rows_y), kzc))
         + 1j * rng.standard_normal((3, len(rows_x), len(rows_y), kzc)))

    @jax.jit
    def rt(zc):
        return s3.gather_compact(cfg, s3.expand_compact(cfg, zc))

    np.testing.assert_allclose(np.asarray(rt(jnp.asarray(z))), z)


def test_kolmogorov_fixed_point():
    # the forced laminar solution u = amp/(nu k^2) sin(ky) x_hat is a fixed
    # point of the continuum dynamics; the IF-AB2 discrete fixed point
    # differs by O((nu k^2 dt)^2) — with nu*k^2*dt = 2e-4 the 200-step
    # drift must stay below 1e-6 relative.
    cfg = _cfg(nt=200, nx=8, ny=16, nz=8, dt=1e-3, nu=0.05,
               forcing="kolmogorov", forcing_k=2, forcing_amp=0.1)
    u0 = s3.kolmogorov_fixed_point_velocity(cfg)
    carry = s3.init_from_velocity(cfg, u0)
    final = jax.jit(lambda c: s3.rollout_final(cfg, c))(carry)
    u_fin = np.asarray(jax.jit(
        lambda z: s3.fields_from_hat(cfg, z))(final[0]))
    scale = np.abs(np.asarray(u0)).max()
    assert np.abs(u_fin - np.asarray(u0)).max() / scale < 1e-6


def test_taylor_green_energy_decay_and_enstrophy():
    cfg = _cfg(nt=20, nx=16, ny=16, nz=16, dt=1e-3, nu=6.25e-4)
    u0 = s3.taylor_green_velocity(cfg)
    carry = s3.init_from_velocity(cfg, u0)
    hats = jax.jit(lambda c: s3.simulate_hat(cfg, c))(carry)
    e = np.asarray(jax.jit(jax.vmap(lambda z: s3.energy(cfg, z)))(hats))
    assert np.all(np.diff(e) < 0)  # unforced: strictly dissipative
    # TGV initial energy is 1/8 in the 2pi^3 box mean-square convention
    e0 = float(jax.jit(lambda z: s3.energy(cfg, z))(carry[0]))
    assert abs(e0 - 0.125) < 1e-12


def test_energy_spectrum_parseval():
    cfg = _cfg(nx=12, ny=12, nz=12)
    u0 = s3.random_solenoidal_velocity(cfg, seed=2, k_peak=2.0)
    carry = s3.init_from_velocity(cfg, u0)
    _, spec = jax.jit(lambda z: s3.energy_spectrum(cfg, z))(carry[0])
    e = float(jax.jit(lambda z: s3.energy(cfg, z))(carry[0]))
    assert abs(float(jnp.sum(spec)) - e) < 1e-12 * max(e, 1.0)


@pytest.mark.slow
def test_strided_matches_simulate():
    cfg_kw = dict(nt=6, nx=12, ny=12, nz=12, dt=1e-3, nu=1e-3,
                  dtype="float64")
    u0 = s3.random_solenoidal_velocity(_cfg(**cfg_kw), seed=4, k_peak=2.0)
    sys = s3.NavierStokesSystem3D(u0, **cfg_kw)
    u, v, w, p = sys.simulate()
    us, vs, ws, ps = sys.simulate_strided(n_frames=cfg_kw["nt"], stride=1)
    for a, b in zip((u, v, w, p), (us, vs, ws, ps)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-12)
    # stride=2: frames 1, 3, 5 of the stride-1 rollout
    us2, _, _, _ = sys.simulate_strided(n_frames=3, stride=2)
    np.testing.assert_allclose(np.asarray(us2), np.asarray(u)[::2],
                               atol=1e-12)
    # spinup=2 drops the first two saved frames
    us3, _, _, _ = sys.simulate_strided(n_frames=2, stride=1, spinup=2)
    np.testing.assert_allclose(np.asarray(us3), np.asarray(u)[2:4],
                               atol=1e-12)


def test_system_api_shapes_and_validation():
    cfg_kw = dict(nt=3, nx=8, ny=8, nz=8)
    u0 = np.zeros((3, 8, 8, 8))
    sys = s3.NavierStokesSystem3D(u0, **cfg_kw)
    u, v, w, p = sys.simulate()
    assert u.shape == v.shape == w.shape == p.shape == (3, 8, 8, 8)
    with pytest.raises(ValueError):
        s3.Spectral3DConfig(transform="matmul", dealias=False)
    with pytest.raises(ValueError):
        s3.Spectral3DConfig(forcing="bogus")
    with pytest.raises(ValueError):
        s3.kolmogorov_fixed_point_velocity(s3.Spectral3DConfig())
