"""DFT-by-matmul transform mode vs the FFT mode (exact in float64)."""

import jax.numpy as jnp
import numpy as np

from ns_tpu.solvers import spectral_periodic as sp


def test_matmul_transforms_match_fft_f64():
    cfg = sp.SpectralPeriodicConfig(nx=32, ny=48, dtype="float64",
                                    transform="matmul",
                                    matmul_precision="highest")
    fwd, inv = sp.make_transforms(cfg)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(32, 48)))
    np.testing.assert_allclose(np.asarray(fwd(w)),
                               np.asarray(jnp.fft.rfft2(w)), atol=1e-10)
    z = jnp.fft.rfft2(w)
    np.testing.assert_allclose(np.asarray(inv(z)), np.asarray(w), atol=1e-10)


def test_matmul_rollout_matches_fft_rollout_f64():
    common = dict(nt=10, nx=32, ny=32, dt=0.005, nu=1e-3, dtype="float64")
    cfg_f = sp.SpectralPeriodicConfig(transform="fft", **common)
    cfg_m = sp.SpectralPeriodicConfig(transform="matmul",
                                      matmul_precision="highest", **common)
    w0 = sp.decaying_turbulence_vorticity(cfg_f, seed=0)
    wf = sp.rollout_final(cfg_f, sp.init_from_vorticity(cfg_f, w0))[0]
    wm = sp.rollout_final(cfg_m, sp.init_from_vorticity(cfg_m, w0))[0]
    np.testing.assert_allclose(np.asarray(wm), np.asarray(wf), atol=1e-9)


def test_bad_transform_name():
    import pytest
    cfg = sp.SpectralPeriodicConfig(transform="dct")
    with pytest.raises(ValueError):
        sp.make_transforms(cfg)
