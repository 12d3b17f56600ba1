"""Pencil-sharded 3D spectral path: elementwise parity vs the unsharded
compact engine on the fake 8-device CPU mesh (SURVEY.md §4d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from ns_tpu.parallel import spectral3d_sharded as s3s
from ns_tpu.solvers import spectral3d as s3


def _mesh(shape, names):
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def _cfg(**kw):
    kw.setdefault("dtype", "float64")
    kw.setdefault("transform", "matmul")
    kw.setdefault("matmul_precision", "highest")
    return s3.Spectral3DConfig(**kw)


def _unsharded_final_velocity(cfg, u0):
    carry = s3.init_from_velocity(cfg, u0)
    final = jax.jit(lambda c: s3.rollout_final(cfg, c))(carry)
    return np.asarray(jax.jit(lambda z: s3.fields_from_hat(cfg, z))(
        final[0]))


@pytest.mark.parametrize("forcing", ["none", "kolmogorov"])
def test_sharded_rollout_matches_unsharded(forcing):
    cfg = _cfg(nt=5, nx=16, ny=12, nz=12, dt=1e-3, nu=1e-3,
               forcing=forcing, forcing_k=2, forcing_amp=0.05)
    u0 = s3.random_solenoidal_velocity(cfg, seed=0, k_peak=2.0)
    ref = _unsharded_final_velocity(cfg, u0)

    mesh = _mesh((4,), ("x",))
    rollout, sharding = s3s.make_sharded_rollout3d(cfg, mesh, axis="x")
    got = np.asarray(rollout(jax.device_put(u0, sharding)))
    np.testing.assert_allclose(got, ref, atol=1e-12 * np.abs(ref).max())


def test_sharded_simulate_stacks_match():
    cfg = _cfg(nt=4, nx=8, ny=12, nz=8, dt=1e-3, nu=5e-3)
    u0 = s3.random_solenoidal_velocity(cfg, seed=1, k_peak=1.5)
    sys3 = s3.NavierStokesSystem3D(
        np.asarray(u0), nt=cfg.nt, nx=cfg.nx, ny=cfg.ny, nz=cfg.nz,
        dt=cfg.dt, nu=cfg.nu, dtype="float64", transform="matmul",
        matmul_precision="highest")
    u, v, w, _ = sys3.simulate()
    ref = np.stack([np.asarray(u), np.asarray(v), np.asarray(w)], axis=1)

    mesh = _mesh((2,), ("x",))
    simulate, sharding = s3s.make_sharded_simulate3d(cfg, mesh, axis="x")
    got = np.asarray(simulate(jax.device_put(u0, sharding)))
    np.testing.assert_allclose(got, ref, atol=1e-12 * np.abs(ref).max())


def test_ensemble_axis_batches_independent_rollouts():
    cfg = _cfg(nt=3, nx=8, ny=12, nz=8, dt=1e-3, nu=1e-3)
    u0s = np.stack([np.asarray(s3.random_solenoidal_velocity(
        cfg, seed=s, k_peak=1.5)) for s in range(2)])
    refs = np.stack([_unsharded_final_velocity(cfg, u0s[i])
                     for i in range(2)])

    mesh = _mesh((2, 4), ("ensemble", "x"))
    rollout, sharding = s3s.make_sharded_rollout3d(cfg, mesh, axis="x",
                                                   ens_axis="ensemble")
    got = np.asarray(rollout(jax.device_put(jnp.asarray(u0s), sharding)))
    np.testing.assert_allclose(got, refs, atol=1e-12 * np.abs(refs).max())


def test_validation_errors():
    mesh = _mesh((4,), ("x",))
    with pytest.raises(ValueError):  # fft engine has no compact layout
        s3s.make_sharded_compact3d(
            _cfg(transform="fft", matmul_precision="high"), mesh, "x")
    with pytest.raises(ValueError):  # nx not divisible by shard count
        s3s.make_sharded_compact3d(_cfg(nx=10), mesh, "x")
