"""Failure detection for rollouts: NaN/divergence guards with early exit.

The reference has no failure handling — solvers run to completion or crash
(SURVEY.md §5: the SOR tolerance cap is its only graceful degradation).
Here a rollout can be wrapped so that once the state goes non-finite or
exceeds a magnitude bound, stepping FREEZES (lax.cond skips the step), the
first bad step index is recorded, and the caller gets the last-good state
to dump — all inside jit, no host round-trips in the loop.

Debug-mode numerics tripwires (the TPU analogue of the reference's
warnings-as-errors, chorin_fd/simulate.py:1-3): `enable_nan_checks` flips
jax_debug_nans so any NaN-producing op raises at the op.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class GuardedCarry(NamedTuple):
    state: object          # solver pytree
    bad: Array             # bool scalar: tripped
    first_bad_step: Array  # int32: step index of first trip (-1 = clean)


def state_is_bad(state, max_abs: float = 1e6) -> Array:
    """True if any leaf is non-finite or exceeds max_abs."""
    flags = []
    for leaf in jax.tree_util.tree_leaves(state):
        a = jnp.abs(leaf)
        flags.append(jnp.any(~jnp.isfinite(leaf)) | jnp.any(a > max_abs))
    return jnp.any(jnp.stack(flags))


def guarded_rollout(step_fn: Callable, state0, nt: int,
                    max_abs: float = 1e6, collect: bool = True):
    """Run nt steps of `step_fn` with a divergence guard.

    Returns (final GuardedCarry, stacked states or None). Once the guard
    trips, subsequent steps are skipped (the state freezes at the last good
    value) — the rollout still costs nt scan iterations (static shapes) but
    no further solver math.
    """
    carry0 = GuardedCarry(state=state0,
                          bad=jnp.asarray(False),
                          first_bad_step=jnp.asarray(-1, jnp.int32))

    def body(carry, n):
        def do_step(_):
            new_state = step_fn(carry.state)
            now_bad = state_is_bad(new_state, max_abs)
            # a step that produced a bad state is rolled back
            kept = jax.tree_util.tree_map(
                lambda new, old: jnp.where(now_bad, old, new),
                new_state, carry.state)
            first = jnp.where(now_bad & (carry.first_bad_step < 0),
                              n.astype(jnp.int32), carry.first_bad_step)
            return GuardedCarry(kept, carry.bad | now_bad, first)

        new_carry = jax.lax.cond(carry.bad, lambda _: carry, do_step, None)
        out = new_carry.state if collect else None
        return new_carry, out

    final, states = jax.lax.scan(body, carry0, jnp.arange(nt))
    return final, states


def enable_nan_checks(enable: bool = True):
    """Debug-mode NaN tripwire (SURVEY.md §5 race-detection analogue)."""
    jax.config.update("jax_debug_nans", enable)


def shadow_check(fn: Callable, *args, rtol: float = 1e-4,
                 atol: float = 1e-5):
    """Numerics validation by dtype shadow run (SURVEY.md §5: "float64-vs-
    float32 shadow runs"): run fn on the args as-is (f32 path) and again
    with every float leaf upcast to f64; return
    (f32_result, f64_result, dict of per-leaf max abs deviations).
    Requires jax_enable_x64 for the shadow to be a true f64 run.

    This is a CPU/debug tool: the f64 shadow itself has no TPU form (no
    f64 on the chip), so the whole comparison runs wherever x64 is real.
    Complex leaves deviate on |a - b| (both components — casting to real
    would silently discard the imaginary part); all deviations compute
    in one jitted program and read back in one to_host batch (not a
    per-leaf float() loop)."""
    def upcast(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(jnp.float64)
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            return x.astype(jnp.complex128)
        return x

    lo = fn(*args)
    hi = fn(*jax.tree_util.tree_map(upcast, args))

    @jax.jit
    def deviations(a_tree, b_tree):
        def one(a, b):
            a = jnp.asarray(a)
            up = (jnp.complex128 if jnp.issubdtype(a.dtype,
                                                   jnp.complexfloating)
                  else jnp.float64)
            return jnp.max(jnp.abs(a.astype(up)
                                   - jnp.asarray(b).astype(up)))
        return jax.tree_util.tree_map(one, a_tree, b_tree)

    from ns_tpu.utils.host import to_host
    devs = jax.tree_util.tree_map(float, to_host(deviations(lo, hi)))
    return lo, hi, devs
