"""Body forcing for the periodic spectral family (sustained turbulence).

The reference has no forced runs (its periodic showcase decays); forcing
is a new capability validated analytically: the Kolmogorov laminar flow
w_s = f_w/(nu k^2) is an exact fixed point of the forced vorticity
equation (u.grad(w) vanishes identically on it), which gates the forcing
spectrum, its placement in the RHS, and the IF-AB2 integration at once.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.solvers import spectral_periodic as sp


def test_forcing_config_validation():
    with pytest.raises(ValueError, match="forcing"):
        sp.SpectralPeriodicConfig(forcing="sinusoid")
    with pytest.raises(ValueError, match="forcing_k"):
        sp.SpectralPeriodicConfig(forcing="kolmogorov", forcing_k=0)
    # unforced configs don't validate forcing_k (it is unused)
    sp.SpectralPeriodicConfig(forcing="none", forcing_k=0)


def test_kolmogorov_laminar_fixed_point():
    """Starting AT the laminar solution w_s = f_w/(nu k^2), the forced
    rollout must stay there: advection vanishes identically on w_s, so
    any drift is an error in the forcing spectrum or its coupling into
    the IF-AB2 step (up to the O((nu k^2 dt)^2) discrete fixed-point
    offset, far below the tolerance here)."""
    nu, k, amp = 0.1, 2, 0.1
    cfg = sp.SpectralPeriodicConfig(nt=200, nx=32, ny=32, dt=1e-3, nu=nu,
                                    dtype="float64", forcing="kolmogorov",
                                    forcing_k=k, forcing_amp=amp)
    w_s = sp.forcing_vorticity_np(cfg) / (nu * k * k)
    carry = sp.init_from_vorticity(cfg, w_s)
    w_hat, _ = sp.rollout_final(cfg, carry)
    w_final = np.asarray(jnp.fft.irfft2(w_hat, s=(cfg.nx, cfg.ny)))
    np.testing.assert_allclose(w_final, w_s, rtol=0, atol=1e-8)


def test_kolmogorov_spinup_from_rest():
    """From w = 0 the forced flow spins up toward the laminar profile
    (energy grows monotonically from zero; an unforced run stays at 0)."""
    cfg = sp.SpectralPeriodicConfig(nt=100, nx=32, ny=32, dt=1e-3, nu=0.1,
                                    dtype="float64", forcing="kolmogorov",
                                    forcing_k=2, forcing_amp=0.1)
    carry = sp.init_from_vorticity(cfg, np.zeros((32, 32)))
    w_hats = sp.simulate_hat(cfg, carry)

    def energy(w_hat):
        _, spec = sp.energy_spectrum(cfg, w_hat)
        return float(jnp.sum(spec))

    e = [energy(w_hats[i]) for i in (0, 49, 99)]
    assert 0 < e[0] < e[1] < e[2]
    # and it heads toward the laminar fixed point, not past it
    nu, k = 0.1, 2
    w_s = sp.forcing_vorticity_np(cfg) / (nu * k * k)
    w_lam_hat = jnp.fft.rfft2(jnp.asarray(w_s))
    assert e[2] < energy(w_lam_hat) * 1.001


def test_fno_forcing_runs_and_alters_dynamics():
    cfg_f = sp.SpectralPeriodicConfig(nt=20, nx=32, ny=32, dt=2e-3,
                                      nu=1e-3, dtype="float64",
                                      forcing="fno", forcing_k=1,
                                      forcing_amp=0.1)
    cfg_0 = sp.SpectralPeriodicConfig(nt=20, nx=32, ny=32, dt=2e-3,
                                      nu=1e-3, dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg_f, seed=1)
    wf, _ = sp.rollout_final(cfg_f, sp.init_from_vorticity(cfg_f, w0))
    w0_, _ = sp.rollout_final(cfg_0, sp.init_from_vorticity(cfg_0, w0))
    wf, w0_ = np.asarray(wf), np.asarray(w0_)
    assert np.isfinite(wf).all()
    assert np.abs(wf - w0_).max() > 1e-6  # the forcing actually acts


def test_forced_engines_agree_f64():
    """fft / compact complex / real-GEMM engines integrate the SAME
    forced dynamics (band-limited IC, f64, highest precision)."""
    common = dict(nt=10, nx=32, ny=32, dt=2e-3, nu=1e-3, dtype="float64",
                  forcing="kolmogorov", forcing_k=2, forcing_amp=0.2)
    cfg_f = sp.SpectralPeriodicConfig(transform="fft", **common)
    cfg_c = sp.SpectralPeriodicConfig(transform="matmul",
                                      matmul_precision="highest",
                                      compact_spectrum=True, **common)
    cfg_r = sp.SpectralPeriodicConfig(transform="matmul",
                                      matmul_precision="highest",
                                      compact_spectrum=True,
                                      real_gemm=True, **common)
    w_raw = sp.decaying_turbulence_vorticity(cfg_f, seed=0)
    ops = sp.make_ops(cfg_f)
    w0 = jnp.fft.irfft2(jnp.where(ops["mask"], jnp.fft.rfft2(w_raw), 0.0),
                        s=(32, 32))

    wf, _ = sp.rollout_final(cfg_f, sp.init_from_vorticity(cfg_f, w0))
    wf_full = np.asarray(wf)

    zc, _ = jax.jit(lambda c: sp.rollout_final(cfg_c, c))(
        sp.init_from_vorticity(cfg_c, w0))
    zc_full = np.asarray(sp.expand_compact(cfg_c, zc))

    z2, _ = jax.jit(lambda c: sp.rollout_final(cfg_r, c))(
        sp.init_from_vorticity(cfg_r, w0))
    zr_full = np.asarray(
        sp.expand_compact(cfg_r, sp.compact_real_to_complex(z2)))

    np.testing.assert_allclose(zc_full, wf_full, atol=1e-10)
    np.testing.assert_allclose(zr_full, wf_full, atol=1e-10)


def test_forced_system_wrapper_and_uvp():
    """NavierStokesSystem carries the forcing kwargs; served (u, v, p)
    stay finite and divergence-free."""
    cfg = sp.SpectralPeriodicConfig(nx=32, ny=32)
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=2)
    sys_ = sp.NavierStokesSystem(w0, nt=5, nx=32, ny=32, dt=1e-3, nu=1e-3,
                                 forcing="fno", forcing_k=1,
                                 forcing_amp=0.1)
    u, v, p = (np.asarray(a) for a in sys_.simulate())
    assert u.shape == (5, 32, 32)
    assert np.isfinite(u).all() and np.isfinite(v).all() \
        and np.isfinite(p).all()


_FORCED = dict(forcing="kolmogorov", forcing_k=2, forcing_amp=0.2)


def test_sharded_fft_forced_matches_unsharded():
    """The distributed-FFT rollout integrates the SAME forced dynamics as
    the single-device path (forcing spectrum chunked per shard; the
    padded columns carry zeros)."""
    from ns_tpu.parallel import make_mesh
    from ns_tpu.parallel.spectral_sharded import make_sharded_rollout

    cfg = sp.SpectralPeriodicConfig(nt=10, nx=32, ny=32, dt=0.005,
                                    nu=1e-3, dtype="float64", **_FORCED)
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0)
    w_hat_ref, _ = sp.rollout_final(cfg, sp.init_from_vorticity(cfg, w0))
    w_ref = jnp.fft.irfft2(w_hat_ref, s=(cfg.nx, cfg.ny))

    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    rollout, sharding = make_sharded_rollout(cfg, mesh)
    w_final = rollout(jax.device_put(w0, sharding))
    np.testing.assert_allclose(np.asarray(w_final), np.asarray(w_ref),
                               atol=1e-11)


def test_sharded_compact_forced_matches_unsharded():
    from ns_tpu.parallel import make_mesh
    from ns_tpu.parallel.spectral_sharded import (
        make_sharded_compact_rollout)

    cfg = sp.SpectralPeriodicConfig(nt=8, nx=32, ny=32, dt=0.005, nu=1e-3,
                                    dtype="float64", transform="matmul",
                                    matmul_precision="highest",
                                    compact_spectrum=True, **_FORCED)
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=1)
    zc, _ = sp.rollout_final_compact(cfg, sp.init_from_vorticity(cfg, w0))
    _, cinv = sp.make_compact_transforms(cfg)
    w_ref = np.asarray(jax.jit(cinv)(zc))

    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    rollout, sharding = make_sharded_compact_rollout(cfg, mesh)
    w_final = rollout(jax.device_put(np.asarray(w0), sharding))
    np.testing.assert_allclose(np.asarray(w_final), w_ref, atol=1e-11)
