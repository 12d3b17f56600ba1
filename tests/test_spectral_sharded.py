"""Distributed-FFT and distributed compact matmul-DFT spectral solvers vs
the unsharded rollouts (fake 8-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.parallel import make_mesh
from ns_tpu.parallel.spectral_sharded import (
    make_sharded_compact_rollout, make_sharded_compact_simulate,
    make_sharded_rollout)
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


def _compact_cfg(**kw):
    base = dict(nt=8, nx=32, ny=32, dt=0.005, nu=1e-3, dtype="float64",
                transform="matmul", matmul_precision="highest",
                compact_spectrum=True, dealias=True)
    base.update(kw)
    return sp.SpectralPeriodicConfig(**base)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_compact_matches_unsharded(n_shards):
    """The distributed matmul-DFT rollout reproduces the single-device
    compact path elementwise."""
    cfg = _compact_cfg()
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=1)

    carry0 = sp.init_from_vorticity(cfg, w0)
    w_hat_ref, _ = sp.rollout_final_compact(cfg, carry0)
    _, cinv = sp.make_compact_transforms(cfg)
    w_ref = np.asarray(jax.jit(cinv)(w_hat_ref))

    mesh = make_mesh({"x": n_shards}, devices=jax.devices()[:n_shards])
    rollout, sharding = make_sharded_compact_rollout(cfg, mesh)
    w_fin = rollout(jax.device_put(w0, sharding))
    np.testing.assert_allclose(np.asarray(w_fin), w_ref, atol=1e-11)


def test_sharded_compact_padded_ky():
    """kyc=11 at 32^2 is not divisible by 4 -> exercises the zero-padded
    ky chunks end-to-end."""
    cfg = _compact_cfg(nt=4)
    from ns_tpu.solvers.spectral_periodic import _compact_meta
    assert _compact_meta(cfg)[3] % 4 != 0
    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    rollout, sharding = make_sharded_compact_rollout(cfg, mesh)
    w0 = sp.taylor_green_vorticity(cfg)
    w = rollout(jax.device_put(w0, sharding))
    t = cfg.nt * cfg.dt
    np.testing.assert_allclose(np.asarray(w),
                               np.asarray(w0) * np.exp(-2 * cfg.nu * t),
                               atol=1e-10)


def test_sharded_compact_simulate_stacked_w():
    """simulate(fields='w') returns the stacked (nt, nx, ny) vorticity
    rollout, matching the single-device stacked rollout."""
    cfg = _compact_cfg(nt=5)
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=2)

    sys_ = sp.NavierStokesSystem(
        w0, nt=cfg.nt, nx=cfg.nx, ny=cfg.ny, dt=cfg.dt, nu=cfg.nu,
        dtype="float64", transform="matmul", matmul_precision="highest",
        compact_spectrum=True)
    w_ref = np.asarray(sys_.simulate_vorticity())

    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    simulate, sharding = make_sharded_compact_simulate(cfg, mesh, fields="w")
    w_seq = simulate(jax.device_put(w0, sharding))
    assert w_seq.shape == (cfg.nt, cfg.nx, cfg.ny)
    np.testing.assert_allclose(np.asarray(w_seq), w_ref, atol=1e-11)


def test_sharded_compact_simulate_uvp():
    """simulate(fields='uvp') returns the reference (u, v, p) contract;
    u/v match the single-device fields and the flow stays divergence-free."""
    cfg = _compact_cfg(nt=4)
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=3)

    sys_ = sp.NavierStokesSystem(
        w0, nt=cfg.nt, nx=cfg.nx, ny=cfg.ny, dt=cfg.dt, nu=cfg.nu,
        dtype="float64", transform="matmul", matmul_precision="highest",
        compact_spectrum=True)
    u_ref, v_ref, p_ref = (np.asarray(a) for a in sys_.simulate())

    mesh = make_mesh({"x": 2}, devices=jax.devices()[:2])
    simulate, sharding = make_sharded_compact_simulate(cfg, mesh,
                                                       fields="uvp")
    u, v, p = simulate(jax.device_put(w0, sharding))
    assert u.shape == (cfg.nt, cfg.nx, cfg.ny)
    np.testing.assert_allclose(np.asarray(u), u_ref, atol=1e-11)
    np.testing.assert_allclose(np.asarray(v), v_ref, atol=1e-11)
    # divergence-free by construction (streamfunction form): check the
    # SPECTRAL divergence (an FD stencil would only see its own truncation
    # error on a band-limited field)
    un, vn = np.asarray(u[-1]), np.asarray(v[-1])
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)[:, None]
    ky = np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny)[None, :]
    div_hat = 1j * kx * np.fft.rfft2(un) + 1j * ky * np.fft.rfft2(vn)
    div = np.fft.irfft2(div_hat, s=(cfg.nx, cfg.ny))
    assert np.abs(div).max() < 1e-10
    assert np.isfinite(np.asarray(p)).all()


def test_sharded_compact_rejects_fft_config():
    cfg = sp.SpectralPeriodicConfig(nx=32, ny=32, transform="fft")
    mesh = make_mesh({"x": 2}, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="matmul"):
        make_sharded_compact_rollout(cfg, mesh)


def test_sharded_compact_ensemble_by_spatial_mesh():
    """2D mesh (ensemble x spatial): a batch of trajectories sharded
    data-parallel, each spatially decomposed — every batch member matches
    its own single-device compact rollout."""
    cfg = _compact_cfg(nt=6)
    B = 4
    w0s = np.stack([np.asarray(sp.decaying_turbulence_vorticity(cfg, seed=s))
                    for s in range(B)])

    refs = []
    _, cinv = sp.make_compact_transforms(cfg)
    for b in range(B):
        carry0 = sp.init_from_vorticity(cfg, w0s[b])
        w_hat, _ = sp.rollout_final_compact(cfg, carry0)
        refs.append(np.asarray(jax.jit(cinv)(w_hat)))

    mesh = make_mesh({"ensemble": 2, "x": 2}, devices=jax.devices()[:4])
    from ns_tpu.parallel.spectral_sharded import make_sharded_compact_rollout
    roll, sharding = make_sharded_compact_rollout(cfg, mesh,
                                                  ens_axis="ensemble")
    w_fin = roll(jax.device_put(jnp.asarray(w0s), sharding))
    assert w_fin.shape == (B, cfg.nx, cfg.ny)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(w_fin[b]), refs[b], atol=1e-11)


def test_sharded_fft_simulate_stacked():
    """The distributed-FFT path also offers the stacked-rollout contract."""
    from ns_tpu.parallel.spectral_sharded import make_sharded_simulate
    cfg = sp.SpectralPeriodicConfig(nt=6, nx=32, ny=32, dt=0.005, nu=1e-3,
                                    dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=4)
    c0 = sp.init_from_vorticity(cfg, w0)
    w_hats = jax.jit(lambda c: sp.simulate_hat(cfg, c))(c0)
    w_ref = np.asarray(jax.vmap(
        lambda h: jnp.fft.irfft2(h, s=(cfg.nx, cfg.ny)))(w_hats))

    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    simulate, sharding = make_sharded_simulate(cfg, mesh)
    w_seq = simulate(jax.device_put(w0, sharding))
    assert w_seq.shape == (cfg.nt, cfg.nx, cfg.ny)
    np.testing.assert_allclose(np.asarray(w_seq), w_ref, atol=1e-11)
