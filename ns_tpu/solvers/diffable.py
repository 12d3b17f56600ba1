"""Differentiable rollouts: gradients through the physics.

The reference's classical solvers are NumPy — opaque to autodiff; only its
neural surrogates train. Here every solver is a pure jitted function, so
the SAME rollout code is differentiable end-to-end: losses defined on
rollout outputs yield gradients w.r.t. initial conditions or physics
parameters (adjoint method for free), enabling data assimilation /
IC optimization / hybrid physics-ML training the reference cannot express.

Memory: an nt-step rollout's reverse pass normally stores O(nt) states;
`rollout_chunked_remat` splits time into chunks wrapped in jax.checkpoint
(SURVEY.md §5 long-context: "time stays sequential under lax.scan,
optionally chunked w/ remat for memory"), storing O(nt / chunk + chunk)
states instead.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def rollout_final(step_fn: Callable, state0, nt: int):
    """Plain differentiable rollout to the final state."""
    def body(state, _):
        return step_fn(state), None

    final, _ = jax.lax.scan(body, state0, None, length=nt)
    return final


def rollout_chunked_remat(step_fn: Callable, state0, nt: int,
                          chunk: int = 16):
    """Rollout with per-chunk rematerialization: the backward pass
    recomputes inside each chunk instead of storing every step."""
    if nt % chunk:
        raise ValueError(f"nt={nt} must be divisible by chunk={chunk}")

    @jax.checkpoint
    def run_chunk(state, _):
        def body(s, _):
            return step_fn(s), None
        s, _ = jax.lax.scan(body, state, None, length=chunk)
        return s, None

    final, _ = jax.lax.scan(run_chunk, state0, None, length=nt // chunk)
    return final


def fit_initial_vorticity(cfg, target_w, nt: int, n_iters: int = 50,
                          lr: float = 0.5, w_init=None, chunk: int = 0):
    """Demo/utility: optimize the initial vorticity of the periodic
    spectral solver so the rollout's final state matches `target_w` —
    gradient descent THROUGH the solver (adjoint data assimilation)."""
    from ns_tpu.solvers import spectral_periodic as sp

    ops = sp.make_ops(cfg)
    step_pair, _ = sp.make_step(cfg)

    def step(carry):
        new_carry, _ = step_pair(carry)
        return new_carry

    target = jnp.asarray(target_w, cfg.real_dtype)

    def loss_fn(w0):
        w_hat = jnp.fft.rfft2(w0)
        carry = (w_hat, sp.nonlinear_term(w_hat, ops, cfg))
        if chunk:
            carry = rollout_chunked_remat(step, carry, nt, chunk)
        else:
            carry = rollout_final(step, carry, nt)
        w_fin = jnp.fft.irfft2(carry[0], s=(cfg.nx, cfg.ny))
        return jnp.mean((w_fin - target) ** 2)

    @jax.jit
    def descend(w0):
        # all n_iters GD steps fused into ONE dispatch (scan over the
        # value_and_grad step) with a single bulk loss readback at the end —
        # a per-iter float(loss) costs a full tunnel round trip each
        def body(w0, _):
            loss, g = jax.value_and_grad(loss_fn)(w0)
            return w0 - lr * g, loss

        return jax.lax.scan(body, w0, None, length=n_iters)

    w0 = (jnp.zeros((cfg.nx, cfg.ny), cfg.real_dtype)
          if w_init is None else jnp.asarray(w_init, cfg.real_dtype))
    w0, losses = descend(w0)
    return w0, [float(x) for x in np.asarray(losses)]
