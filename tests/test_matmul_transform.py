"""DFT-by-matmul transform mode vs the FFT mode (exact in float64)."""

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.solvers import spectral_periodic as sp


def test_matmul_transforms_match_fft_f64_full():
    """Without dealiasing the matmul transforms are the exact rfft2 pair."""
    cfg = sp.SpectralPeriodicConfig(nx=32, ny=48, dtype="float64",
                                    transform="matmul", dealias=False,
                                    matmul_precision="highest")
    fwd, inv = sp.make_transforms(cfg)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(32, 48)))
    np.testing.assert_allclose(np.asarray(fwd(w)),
                               np.asarray(jnp.fft.rfft2(w)), atol=1e-10)
    z = jnp.fft.rfft2(w)
    np.testing.assert_allclose(np.asarray(inv(z)), np.asarray(w), atol=1e-10)


def test_matmul_transforms_match_masked_fft_f64():
    """With dealiasing the truncated transforms equal mask * rfft2."""
    cfg = sp.SpectralPeriodicConfig(nx=32, ny=48, dtype="float64",
                                    transform="matmul",
                                    matmul_precision="highest")
    fwd, inv = sp.make_transforms(cfg)
    ops = sp.make_ops(cfg)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(32, 48)))
    want = jnp.where(ops["mask"], jnp.fft.rfft2(w), 0.0)
    np.testing.assert_allclose(np.asarray(fwd(w)), np.asarray(want),
                               atol=1e-10)
    # inverse of a masked spectrum round-trips the band-limited field
    w_bl = jnp.fft.irfft2(want, s=(32, 48))
    np.testing.assert_allclose(np.asarray(inv(want)), np.asarray(w_bl),
                               atol=1e-10)


def test_matmul_rollout_matches_fft_rollout_f64():
    """Rollouts agree when the IC is band-limited (the truncated transforms
    drop above-cutoff IC modes at init by design; the FFT path carries them
    passively)."""
    common = dict(nt=10, nx=32, ny=32, dt=0.005, nu=1e-3, dtype="float64")
    cfg_f = sp.SpectralPeriodicConfig(transform="fft", **common)
    cfg_m = sp.SpectralPeriodicConfig(transform="matmul",
                                      matmul_precision="highest", **common)
    w_raw = sp.decaying_turbulence_vorticity(cfg_f, seed=0)
    ops = sp.make_ops(cfg_f)
    w0 = jnp.fft.irfft2(jnp.where(ops["mask"], jnp.fft.rfft2(w_raw), 0.0),
                        s=(32, 32))
    wf = sp.rollout_final(cfg_f, sp.init_from_vorticity(cfg_f, w0))[0]
    wm = sp.rollout_final(cfg_m, sp.init_from_vorticity(cfg_m, w0))[0]
    np.testing.assert_allclose(np.asarray(wm), np.asarray(wf), atol=1e-9)


def test_matmul_transforms_batch_polymorphic():
    """Leading batch axes broadcast through the truncated matmul transforms
    (the documented contract of the module)."""
    cfg = sp.SpectralPeriodicConfig(nx=16, ny=16, dtype="float64",
                                    transform="matmul",
                                    matmul_precision="highest")
    fwd, inv = sp.make_transforms(cfg)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(3, 16, 16)))
    z = fwd(w)
    assert z.shape == (3, 16, 9)
    for b in range(3):
        np.testing.assert_allclose(np.asarray(z[b]), np.asarray(fwd(w[b])),
                                   atol=1e-12)
    back = inv(z)
    assert back.shape == (3, 16, 16)
    np.testing.assert_allclose(np.asarray(back[1]), np.asarray(inv(z[1])),
                               atol=1e-12)


def test_ensemble_with_matmul_transform():
    from ns_tpu.parallel import make_mesh
    from ns_tpu.parallel.ensemble import ensemble_init, ensemble_rollout_final
    import jax

    cfg = sp.SpectralPeriodicConfig(nt=5, nx=16, ny=16, dt=0.005, nu=1e-3,
                                    dtype="float64", transform="matmul",
                                    matmul_precision="highest")
    w0s = np.stack([np.asarray(sp.taylor_green_vorticity(cfg, k=1))
                    for _ in range(4)])
    mesh = make_mesh({"ensemble": 4}, devices=jax.devices()[:4])
    carry = ensemble_init(cfg, w0s, mesh)
    w_hat, _ = ensemble_rollout_final(cfg, carry)
    assert w_hat.shape[0] == 4
    assert np.isfinite(np.abs(np.asarray(w_hat))).all()


def test_compact_spectrum_rollout_matches_padded():
    """The compact-carry path is the padded truncated path exactly."""
    common = dict(nt=10, nx=64, ny=64, dt=5e-3, nu=1e-3, dtype="float64",
                  transform="matmul", matmul_precision="highest")
    cfg_c = sp.SpectralPeriodicConfig(compact_spectrum=True, **common)
    cfg_p = sp.SpectralPeriodicConfig(**common)
    w0 = sp.decaying_turbulence_vorticity(cfg_c, seed=0)
    zc, _ = sp.rollout_final_compact(cfg_c, sp.init_from_vorticity_compact(cfg_c, w0))
    z_full = sp.expand_compact(cfg_c, zc)
    zp, _ = sp.rollout_final(cfg_p, sp.init_from_vorticity(cfg_p, w0))
    np.testing.assert_allclose(np.asarray(z_full), np.asarray(zp),
                               atol=1e-10)


def test_compact_flag_dispatches_through_public_api():
    """cfg.compact_spectrum must actually switch the carry layout through
    make_step/init_from_vorticity and the System wrapper (it was once a
    decorative flag — regression guard)."""
    cfg = sp.SpectralPeriodicConfig(nt=4, nx=32, ny=32, dt=0.005, nu=1e-3,
                                    dtype="float64", transform="matmul",
                                    matmul_precision="highest",
                                    compact_spectrum=True)
    w0 = sp.taylor_green_vorticity(cfg)
    carry = sp.init_from_vorticity(cfg, w0)
    rows, kxc, n_neg, kyc = sp._compact_meta(cfg)
    assert carry[0].shape == (kxc + n_neg, kyc)  # compact, not (nx, nyh)
    final = sp.rollout_final(cfg, carry)
    assert final[0].shape == (kxc + n_neg, kyc)

    sys_c = sp.NavierStokesSystem(w0, nt=4, nx=32, ny=32, dt=0.005,
                                  nu=1e-3, dtype="float64",
                                  transform="matmul",
                                  matmul_precision="highest",
                                  compact_spectrum=True)
    u, v, p = sys_c.simulate()
    assert u.shape == (4, 32, 32)
    assert np.isfinite(np.asarray(u)).all()


def test_compact_requires_matmul_dealias():
    import pytest
    with pytest.raises(ValueError):
        sp.make_step_compact(sp.SpectralPeriodicConfig(transform="fft"))


def test_bad_transform_name():
    """Invalid engine names are rejected at CONFIG CONSTRUCTION (the
    'auto' resolver validates the final value in __post_init__)."""
    import pytest
    with pytest.raises(ValueError, match="transform"):
        sp.SpectralPeriodicConfig(transform="dct")


# ---------------------------------------------------------------------------
# Real-GEMM engine (cfg.real_gemm): stacked real/imag block matmuls
# ---------------------------------------------------------------------------

def _rg_cfg(**kw):
    base = dict(nt=6, nx=32, ny=32, dt=0.005, nu=1e-3, dtype="float64",
                transform="matmul", matmul_precision="highest",
                compact_spectrum=True, real_gemm=True, dealias=True)
    base.update(kw)
    return sp.SpectralPeriodicConfig(**base)


def test_real_gemm_transforms_match_complex():
    """fwd/inv of the real-GEMM engine equal the complex compact
    transforms elementwise (f64)."""
    cfg = _rg_cfg()
    w = np.asarray(sp.decaying_turbulence_vorticity(cfg, seed=5))
    cfwd, cinv = sp.make_compact_transforms(cfg)
    rfwd, rinv = sp.make_real_gemm_transforms(cfg)
    zc = np.asarray(jax.jit(cfwd)(jnp.asarray(w)))
    z2 = np.asarray(jax.jit(rfwd)(jnp.asarray(w)))
    np.testing.assert_allclose(z2[0], zc.real, atol=1e-12)
    np.testing.assert_allclose(z2[1], zc.imag, atol=1e-12)
    wc = np.asarray(jax.jit(cinv)(jnp.asarray(zc)))
    wr = np.asarray(jax.jit(rinv)(jnp.asarray(z2)))
    np.testing.assert_allclose(wr, wc, atol=1e-12)


def test_real_gemm_rollout_matches_complex_compact():
    """Full nt-step rollouts agree elementwise between the complex compact
    carry and the real-GEMM carry (f64)."""
    cfgc = _rg_cfg(real_gemm=False)
    cfgr = _rg_cfg()
    w0 = sp.decaying_turbulence_vorticity(cfgc, seed=6)

    cc = sp.init_from_vorticity(cfgc, w0)
    w_hat_c, _ = jax.jit(lambda c: sp.rollout_final(cfgc, c))(cc)

    cr = sp.init_from_vorticity(cfgr, w0)
    w2_r, _ = jax.jit(lambda c: sp.rollout_final(cfgr, c))(cr)
    np.testing.assert_allclose(np.asarray(w2_r[0]), np.asarray(w_hat_c.real),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(w2_r[1]), np.asarray(w_hat_c.imag),
                               atol=1e-12)


def test_real_gemm_system_wrapper():
    """NavierStokesSystem(real_gemm=True) produces the same (u,v,p) as the
    complex compact wrapper."""
    cfg = _rg_cfg(nt=4)
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=7)
    kw = dict(nt=4, nx=32, ny=32, dt=0.005, nu=1e-3, dtype="float64",
              transform="matmul", matmul_precision="highest")
    s_c = sp.NavierStokesSystem(w0, compact_spectrum=True, **kw)
    s_r = sp.NavierStokesSystem(w0, real_gemm=True, **kw)
    for a, b in zip(s_c.simulate(), s_r.simulate()):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-12)


def test_real_gemm_taylor_green_decay():
    cfg = _rg_cfg(nt=10)
    w0 = sp.taylor_green_vorticity(cfg)
    carry = sp.init_from_vorticity(cfg, w0)
    w2, _ = jax.jit(lambda c: sp.rollout_final(cfg, c))(carry)
    _, rinv = sp.make_real_gemm_transforms(cfg)
    w = np.asarray(jax.jit(rinv)(w2))
    t = cfg.nt * cfg.dt
    np.testing.assert_allclose(w, np.asarray(w0) * np.exp(-2 * cfg.nu * t),
                               atol=1e-10)
