"""Differentiable-physics tests: gradients through solver rollouts."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.solvers import spectral_periodic as sp
from ns_tpu.solvers.diffable import (fit_initial_vorticity, rollout_chunked_remat,
                                     rollout_final)


@pytest.mark.slow
def test_gradient_through_spectral_rollout_nonzero():
    cfg = sp.SpectralPeriodicConfig(nt=8, nx=16, ny=16, dt=0.005, nu=1e-2,
                                    dtype="float64")
    ops = sp.make_ops(cfg)
    step_pair, _ = sp.make_step(cfg)
    step = lambda c: step_pair(c)[0]
    w_t = sp.taylor_green_vorticity(cfg)

    def loss(w0):
        h = jnp.fft.rfft2(w0)
        carry = (h, sp.nonlinear_term(h, ops, cfg))
        final = rollout_final(step, carry, cfg.nt)
        w_fin = jnp.fft.irfft2(final[0], s=(cfg.nx, cfg.ny))
        return jnp.mean((w_fin - w_t) ** 2)

    g = jax.grad(loss)(jnp.zeros((16, 16), jnp.float64))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_chunked_remat_same_values_and_grads():
    cfg = sp.SpectralPeriodicConfig(nt=8, nx=16, ny=16, dt=0.005, nu=1e-2,
                                    dtype="float64")
    ops = sp.make_ops(cfg)
    step_pair, _ = sp.make_step(cfg)
    step = lambda c: step_pair(c)[0]
    w_t = sp.taylor_green_vorticity(cfg)

    def make_loss(chunk):
        def loss(w0):
            h = jnp.fft.rfft2(w0)
            carry = (h, sp.nonlinear_term(h, ops, cfg))
            if chunk:
                final = rollout_chunked_remat(step, carry, cfg.nt, chunk)
            else:
                final = rollout_final(step, carry, cfg.nt)
            w_fin = jnp.fft.irfft2(final[0], s=(cfg.nx, cfg.ny))
            return jnp.mean((w_fin - w_t) ** 2)
        return loss

    w0 = jnp.asarray(np.random.default_rng(0).normal(size=(16, 16)) * 0.1)
    v1, g1 = jax.value_and_grad(make_loss(0))(w0)
    v2, g2 = jax.value_and_grad(make_loss(4))(w0)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-12)


def test_fit_initial_vorticity_converges():
    """Adjoint data assimilation: recover an IC whose rollout hits the
    (decayed) Taylor-Green target."""
    cfg = sp.SpectralPeriodicConfig(nt=10, nx=16, ny=16, dt=0.01, nu=1e-2,
                                    dtype="float64")
    w_true = sp.taylor_green_vorticity(cfg)
    c0 = sp.init_from_vorticity(cfg, w_true)
    w_hat_fin, _ = sp.rollout_final(cfg, c0)
    target = jnp.fft.irfft2(w_hat_fin, s=(cfg.nx, cfg.ny))

    _, losses = fit_initial_vorticity(cfg, target, nt=cfg.nt, n_iters=40,
                                      lr=100.0)
    assert losses[-1] < losses[0] * 1e-2, losses[::10]
