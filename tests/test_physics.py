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


def test_temporal_convergence_is_second_order():
    """IF-AB2 global error is O(dt^2): halving dt cuts the error ~4x
    (measured against a tiny-dt reference of the same spatial scheme)."""
    import jax

    def run(dt, T=0.08, nx=32):
        nt = int(round(T / dt))
        cfg = sp.SpectralPeriodicConfig(nt=nt, nx=nx, ny=nx, dt=dt,
                                        nu=5e-3, dtype="float64")
        w0 = sp.decaying_turbulence_vorticity(cfg, seed=0, k_peak=4.0)
        c0 = sp.init_from_vorticity(cfg, w0)
        w_hat, _ = jax.jit(lambda c: sp.rollout_final(cfg, c))(c0)
        return np.asarray(jnp.fft.irfft2(w_hat, s=(nx, nx)))

    ref = run(1e-4)
    errs = [np.abs(run(dt) - ref).max() for dt in (4e-3, 2e-3, 1e-3)]
    r1, r2 = errs[0] / errs[1], errs[1] / errs[2]
    assert 3.0 < r1 < 5.5, (errs, r1)
    assert 3.0 < r2 < 5.5, (errs, r2)


def test_spatial_convergence_is_spectral():
    """Grid refinement converges faster than any fixed power: the error of
    a short rollout vs a 4x-resolved reference drops by >=30x from N=32 to
    N=64 (an O(N^-2) FD scheme would drop 4x)."""
    import jax

    def run(nx, nt=40, dt=1e-3):
        cfg = sp.SpectralPeriodicConfig(nt=nt, nx=nx, ny=nx, dt=dt,
                                        nu=5e-3, dtype="float64",
                                        dealias=True)
        # band-limited IC identical across resolutions (k_peak=3 content
        # lives far below every grid's dealias cutoff)
        x = np.arange(nx) * 2 * np.pi / nx
        X, Y = np.meshgrid(x, x, indexing="ij")
        w0 = (np.sin(3 * X) * np.cos(2 * Y) + 0.7 * np.cos(X + Y)
              + 0.3 * np.sin(2 * X - 3 * Y))
        c0 = sp.init_from_vorticity(cfg, jnp.asarray(w0))
        w_hat, _ = jax.jit(lambda c: sp.rollout_final(cfg, c))(c0)
        return np.asarray(jnp.fft.irfft2(w_hat, s=(nx, nx)))

    w256 = run(256)
    errs = {}
    for nx in (32, 64):
        w = run(nx)
        stride = 256 // nx
        errs[nx] = np.abs(w - w256[::stride, ::stride]).max()
    assert errs[64] < errs[32] / 30.0, errs
