"""Physics-validation tests beyond golden parity: spectra and invariants
(the north star gates fidelity on divergence residuals AND vorticity
spectra — BASELINE.json)."""

import jax.numpy as jnp
import numpy as np

from ns_tpu.solvers import spectral_periodic as sp


def test_turbulence_spectrum_no_dealiasing_pileup():
    """After a decaying-turbulence rollout, the energy spectrum must decay
    with k and show no energy pile-up at the 2/3 cutoff (the classic
    symptom of broken dealiasing)."""
    cfg = sp.SpectralPeriodicConfig(nt=200, nx=128, ny=128, dt=2e-3,
                                    nu=2e-3, dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0, k_peak=8.0)
    carry = sp.init_from_vorticity(cfg, w0)
    w_hat, _ = sp.rollout_final(cfg, carry)
    k, E = sp.energy_spectrum(cfg, w_hat)
    E = np.asarray(E)
    peak = E[1:20].max()
    cutoff = cfg.nx // 3
    tail = E[cutoff - 4:cutoff + 1].max()
    assert np.isfinite(E).all()
    assert tail < 1e-4 * peak, (peak, tail)


def test_enstrophy_decays():
    """Total enstrophy (0.5 |w|^2) is monotically dissipated by viscosity
    in unforced 2D turbulence."""
    cfg = sp.SpectralPeriodicConfig(nt=100, nx=64, ny=64, dt=2e-3,
                                    nu=5e-3, dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=2, k_peak=6.0)
    carry = sp.init_from_vorticity(cfg, w0)
    w_hats = sp.simulate_hat(cfg, carry)

    def enstrophy(w_hat):
        w = jnp.fft.irfft2(w_hat, s=(cfg.nx, cfg.ny))
        return float(jnp.mean(w * w))

    z = [enstrophy(w_hats[t]) for t in (0, 25, 50, 99)]
    assert all(z[i + 1] < z[i] for i in range(3)), z


def test_mean_vorticity_conserved():
    """The k=0 vorticity mode is exactly conserved (no forcing, periodic)."""
    cfg = sp.SpectralPeriodicConfig(nt=50, nx=32, ny=32, dt=5e-3,
                                    nu=1e-3, dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=1)
    carry = sp.init_from_vorticity(cfg, w0)
    w_hat, _ = sp.rollout_final(cfg, carry)
    mean0 = float(jnp.fft.rfft2(w0)[0, 0].real)
    meanT = float(w_hat[0, 0].real)
    np.testing.assert_allclose(meanT, mean0, atol=1e-10)
