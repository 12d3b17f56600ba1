"""Distributed-FFT spectral solver vs the unsharded rollout (fake 8-device
CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.parallel import make_mesh
from ns_tpu.parallel.spectral_sharded import make_sharded_rollout
from ns_tpu.solvers import spectral_periodic as sp


@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_spectral_matches_unsharded(n_shards):
    cfg = sp.SpectralPeriodicConfig(nt=10, nx=32, ny=32, dt=0.005, nu=1e-3,
                                    dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0)

    # unsharded reference
    c0 = sp.init_from_vorticity(cfg, w0)
    w_hat_ref, _ = sp.rollout_final(cfg, c0)
    w_ref = jnp.fft.irfft2(w_hat_ref, s=(cfg.nx, cfg.ny))

    mesh = make_mesh({"x": n_shards}, devices=jax.devices()[:n_shards])
    rollout, sharding = make_sharded_rollout(cfg, mesh)
    w_final = rollout(jax.device_put(w0, sharding))

    np.testing.assert_allclose(np.asarray(w_final), np.asarray(w_ref),
                               atol=1e-11)


def test_sharded_spectral_odd_halfwidth():
    """ny//2+1 = 17 not divisible by 4 -> exercises the padded transpose."""
    cfg = sp.SpectralPeriodicConfig(nt=5, nx=32, ny=32, dt=0.005, nu=1e-3,
                                    dtype="float64")
    assert (cfg.ny // 2 + 1) % 4 != 0
    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    rollout, sharding = make_sharded_rollout(cfg, mesh)
    w0 = sp.taylor_green_vorticity(cfg)
    w = rollout(jax.device_put(w0, sharding))
    # Taylor-Green analytic decay still holds through the sharded path
    t = cfg.nt * cfg.dt
    np.testing.assert_allclose(np.asarray(w),
                               np.asarray(w0) * np.exp(-2 * cfg.nu * t),
                               atol=1e-10)
