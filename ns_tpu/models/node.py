"""Fixed-grid neural-ODE integrators with a recompute adjoint.

Capability parity with the vendored ANODE runtime (reference
src/neural_spectral/anode/): `odeint(func, z0, nt, method)` integrates
dz/dt = func(t, z) on the uniform grid t in [0,1), dt = 1/nt, and returns
ALL nt states stacked (time_stepper.py:24-45). Butcher schemes Euler / RK2 /
RK4 match scheme.py:21-42. `odeint_checkpoint` reproduces the semantics of
ANODE's Checkpointing_Adjoint (adjoint.py:41-70): the forward stores
nothing; the backward pass re-runs the whole integration and differentiates
it — in JAX this is exactly `jax.checkpoint` around the integration, so
memory stays O(1) in nt on the forward pass while gradients flow to both z0
and the function's parameters.

TPU design: the time loop is a `lax.scan` (one compiled step body, no
python unrolling), so the MLP vector-field evaluations batch onto the MXU
and the whole integrate -> loss -> grad train step fuses into a single XLA
program (SURVEY.md §3.4).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def _euler_step(func, t, dt, y):
    return y + dt * func(t, y)


def _rk2_step(func, t, dt, y):
    k1 = dt * func(t, y)
    k2 = dt * func(t + dt / 2.0, y + 0.5 * k1)
    return y + k2


def _rk4_step(func, t, dt, y):
    k1 = dt * func(t, y)
    k2 = dt * func(t + dt / 2.0, y + 0.5 * k1)
    k3 = dt * func(t + dt / 2.0, y + 0.5 * k2)
    k4 = dt * func(t + dt, y + k3)
    return y + k1 / 6.0 + k2 / 3.0 + k3 / 3.0 + k4 / 6.0


_STEPPERS = {"Euler": _euler_step, "RK2": _rk2_step, "RK4": _rk4_step}


def odeint(func: Callable, z0: Array, nt: int, method: str = "RK4") -> Array:
    """Integrate and return the nt states AFTER each step, stacked on axis 0
    (the reference's integrate contract, time_stepper.py:35-45: z0 itself is
    not included)."""
    if method not in _STEPPERS:
        raise ValueError(f"method must be one of {sorted(_STEPPERS)}, got {method!r}")
    stepper = _STEPPERS[method]
    dt = 1.0 / float(nt)

    def body(carry, n):
        t0 = n.astype(z0.dtype) * dt
        z = stepper(func, t0, dt, carry)
        return z, z

    _, zs = jax.lax.scan(body, z0, jnp.arange(nt))
    return zs


def odeint_checkpoint(func: Callable, z0: Array, nt: int,
                      method: str = "RK4") -> Array:
    """`odeint` wrapped in jax.checkpoint: the backward pass recomputes the
    forward integration instead of storing intermediates — the ANODE
    recompute-adjoint semantics (adjoint.py:52-70)."""
    integrate = jax.checkpoint(lambda z: odeint(func, z, nt, method))
    return integrate(z0)


# --- reference-named entry points (migration aliases) -----------------------


def odesolver(func: Callable, z0: Array, options: dict) -> Array:
    """Reference ANODE entry signature (anode/odesolver.py:21): options
    carries {'Nt': nt, 'method': 'Euler'|'RK2'|'RK4'}."""
    return odeint(func, z0, int(options["Nt"]),
                  method=options.get("method", "RK4"))


def odesolver_adjoint(func: Callable, z0: Array, options: dict) -> Array:
    """Reference recompute-adjoint entry (anode/adjoint.py:73): same
    contract, backward pass re-runs the integration (jax.checkpoint)."""
    return odeint_checkpoint(func, z0, int(options["Nt"]),
                             method=options.get("method", "RK4"))
