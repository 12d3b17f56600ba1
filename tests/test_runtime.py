"""Deployment runtime + ensemble training tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.models.basis import BasisGRU
from ns_tpu.parallel import make_mesh
from ns_tpu.runtime import RolloutEngine, export_rollout, load_rollout_artifact
from ns_tpu.solvers import spectral_periodic as sp
from ns_tpu.train.ensemble import train_ensemble


def small_cfg():
    return sp.SpectralPeriodicConfig(nt=8, nx=32, ny=32, dt=0.005, nu=1e-3,
                                     dtype="float64")


def reference_final(cfg, w0):
    c0 = sp.init_from_vorticity(cfg, w0)
    w_hat, _ = sp.rollout_final(cfg, c0)
    return jnp.fft.irfft2(w_hat, s=(cfg.nx, cfg.ny))


def test_rollout_engine_matches_jit_path():
    cfg = small_cfg()
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=1)
    engine = RolloutEngine(cfg)
    got = engine(w0)
    want = reference_final(cfg, w0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    # serving calls are retrace-free executables with cost metadata
    assert engine.cost_analysis is not None


def test_export_roundtrip(tmp_path):
    cfg = small_cfg()
    w0 = sp.taylor_green_vorticity(cfg)
    path = export_rollout(cfg, str(tmp_path / "rollout.shlo"))
    runner = load_rollout_artifact(path)
    got = runner(w0)
    want = reference_final(cfg, w0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)


@pytest.mark.slow
def test_train_ensemble_reduces_all_losses():
    rng = np.random.default_rng(0)
    nt, nx, ny = 6, 8, 8
    obs = jnp.asarray(rng.normal(size=(nt, 1, 3, nx, ny)) * 0.1, jnp.float32)
    model = BasisGRU(2, nx, ny)
    params, hist = train_ensemble(model, obs, nt, n_models=4, n_iters=25)
    assert hist.shape == (25, 4)
    assert np.all(np.asarray(hist[-1]) < np.asarray(hist[0]))
    # models are genuinely different (independent seeds)
    basis = np.asarray(params["basis"])
    assert not np.allclose(basis[0], basis[1])


@pytest.mark.slow
def test_train_ensemble_sharded():
    rng = np.random.default_rng(0)
    nt, nx, ny = 4, 8, 8
    obs = jnp.asarray(rng.normal(size=(nt, 1, 3, nx, ny)) * 0.1, jnp.float32)
    model = BasisGRU(2, nx, ny)
    mesh = make_mesh({"ensemble": 8})
    params, hist = train_ensemble(model, obs, nt, n_models=8, n_iters=5,
                                  mesh=mesh)
    assert hist.shape == (5, 8)
    assert np.isfinite(np.asarray(hist)).all()


def test_rollout_engine_serves_all_spectral_engines():
    """The AOT engine serves whichever engine the config selects, all
    agreeing with each other on a smooth flow (f64)."""
    import numpy as np
    from ns_tpu.runtime.engine import RolloutEngine
    from ns_tpu.solvers import spectral_periodic as sp

    kw = dict(nt=5, nx=32, ny=32, dt=1e-3, nu=1e-3, dtype="float64")
    w0 = np.asarray(sp.taylor_green_vorticity(sp.SpectralPeriodicConfig(**kw)))
    outs = {}
    for name, extra in (
            ("fft", {}),
            ("compact", dict(transform="matmul", matmul_precision="highest",
                             compact_spectrum=True)),
            ("real_gemm", dict(transform="matmul",
                               matmul_precision="highest",
                               compact_spectrum=True, real_gemm=True))):
        eng = RolloutEngine(sp.SpectralPeriodicConfig(**kw, **extra))
        outs[name] = np.asarray(eng(w0))
    np.testing.assert_allclose(outs["compact"], outs["fft"], atol=1e-10)
    np.testing.assert_allclose(outs["real_gemm"], outs["compact"],
                               atol=1e-12)


def test_fd_rollout_engine_matches_simulate(tmp_path):
    """AOT FD engine == the library simulate path; the exported StableHLO
    artifact reproduces it without the model-building code."""
    import jax.numpy as jnp
    from ns_tpu.core.bc import dirichlet, neumann
    from ns_tpu.runtime.engine import (FDRolloutEngine, export_fd_rollout,
                                       load_fd_rollout_artifact)
    from ns_tpu.solvers import chorin_fd

    nx = ny = 17
    dx = 2.0 / (nx - 1)
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dx),
            neumann(0, "left", dx, dx), neumann(0, "right", dx, dx)]
    cfg = chorin_fd.ChorinFDConfig(nt=4, nit=60, nx=nx, ny=ny, dt=1e-3,
                                   nu=0.1, beta=1.25,
                                   method="semi_implicit",
                                   pressure_mode="dst")
    z = np.zeros((nx, ny), np.float64)

    ref = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, nt=4, nit=60, nx=nx, ny=ny, dt=1e-3,
        rho=1, nu=0.1, beta=1.25, method="semi_implicit",
        pressure_mode="dst", dtype=jnp.float64)
    u_ref, v_ref, p_ref = (np.asarray(a) for a in ref.simulate())

    eng = FDRolloutEngine("chorin_fd", cfg, u_bc, v_bc, p_bc,
                          dtype=jnp.float64)
    u, v, p = eng(z, z, z)
    np.testing.assert_allclose(np.asarray(u), u_ref[-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), v_ref[-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(p), p_ref[-1], atol=1e-12)

    # Pallas configs cannot serialize to StableHLO: clear error, not a
    # custom-call failure deep inside jax.export
    import pytest as _pytest
    with _pytest.raises(ValueError, match="Pallas"):
        export_fd_rollout(
            "chorin_fd",
            chorin_fd.ChorinFDConfig(nt=4, nit=60, nx=nx, ny=ny, dt=1e-3,
                                     nu=0.1, beta=1.25,
                                     method="semi_implicit",
                                     pressure_mode="redblack",
                                     use_pallas=True),
            u_bc, v_bc, p_bc, str(tmp_path / "nope.shlo"))

    path = export_fd_rollout("chorin_fd", cfg, u_bc, v_bc, p_bc,
                             str(tmp_path / "fd.shlo"), dtype=jnp.float64)
    run = load_fd_rollout_artifact(path)
    u2, _, _ = run(jnp.asarray(z), jnp.asarray(z), jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(u2), u_ref[-1], atol=1e-12)


def test_fd_rollout_engine_direct_fd():
    import jax.numpy as jnp
    from ns_tpu.core.bc import dirichlet, neumann
    from ns_tpu.runtime.engine import FDRolloutEngine
    from ns_tpu.solvers import direct_fd

    nx = ny = 16
    dx = 2.0 / (nx - 1)
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dx),
            neumann(0, "left", dx, dx), neumann(0, "right", dx, dx)]
    cfg = direct_fd.DirectFDConfig(nt=3, nit=10, nx=nx, ny=ny, dt=1e-3,
                                   nu=0.1, pressure_mode="exact")
    z = np.zeros((nx, ny), np.float64)
    ref = direct_fd.NavierStokesSystem(z, z, z, u_bc, v_bc, p_bc, nt=3,
                                       nit=10, nx=nx, ny=ny, dt=1e-3,
                                       nu=0.1, dtype=jnp.float64,
                                       pressure_mode="exact")
    u_ref, v_ref, p_ref = (np.asarray(a) for a in ref.simulate())
    eng = FDRolloutEngine("direct_fd", cfg, u_bc, v_bc, p_bc,
                          dtype=jnp.float64)
    u, v, p = eng(z, z, z)
    np.testing.assert_allclose(np.asarray(u), u_ref[-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(v), v_ref[-1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(p), p_ref[-1], atol=1e-12)


def test_rollout3d_engine_and_export(tmp_path):
    """3D AOT engine matches the jit path; StableHLO round trip."""
    import jax as _jax

    from ns_tpu.runtime import (Rollout3DEngine, export_rollout3d,
                                load_rollout3d_artifact)
    from ns_tpu.solvers import spectral3d as s3

    cfg = s3.Spectral3DConfig(nt=4, nx=8, ny=8, nz=8, dt=1e-3, nu=1e-2,
                              dtype="float32", transform="matmul",
                              matmul_precision="highest")
    u0 = np.asarray(s3.random_solenoidal_velocity(cfg, seed=0, k_peak=1.5),
                    np.float32)
    ref_carry = s3.init_from_velocity(cfg, u0)
    ref_final = _jax.jit(lambda c: s3.rollout_final(cfg, c))(ref_carry)
    ref = np.asarray(_jax.jit(
        lambda z: s3.fields_from_hat(cfg, z))(ref_final[0]))

    eng = Rollout3DEngine(cfg)
    np.testing.assert_allclose(np.asarray(eng(u0)), ref, atol=1e-6)
    assert eng.cost_analysis  # flop/byte estimates exist

    path = str(tmp_path / "r3d.stablehlo")
    export_rollout3d(cfg, path)
    run = load_rollout3d_artifact(path)
    np.testing.assert_allclose(np.asarray(run(u0)), ref, atol=1e-6)
