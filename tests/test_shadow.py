"""Shadow-run numerics validation utility."""

import jax.numpy as jnp
import numpy as np

from ns_tpu.utils.guard import shadow_check


def test_shadow_check_flags_precision_loss():
    # summing many small numbers: f32 loses precision the f64 shadow keeps
    def fn(x):
        return jnp.cumsum(x)[-1:]

    x = jnp.full((1_000_000,), 0.1, jnp.float32)
    lo, hi, devs = shadow_check(fn, x)
    assert float(devs[0] if isinstance(devs, (list, tuple)) else devs) > 1e-3


def test_shadow_check_agrees_on_stable_fn():
    def fn(x):
        return x * 2.0 + 1.0

    x = jnp.linspace(0, 1, 64, dtype=jnp.float32)
    lo, hi, devs = shadow_check(fn, x)
    assert float(devs) < 1e-6


def test_shadow_check_sees_imaginary_deviation():
    """Complex outputs deviate on |a - b| over BOTH components — casting
    to real silently dropped purely-imaginary f32 drift."""
    import jax
    import jax.numpy as jnp
    from ns_tpu.utils.guard import shadow_check

    def fn(x):
        # imaginary part carries the precision-sensitive term
        return jax.lax.complex(jnp.zeros_like(x),
                               (x + 1e4) - 1e4)

    x = jnp.linspace(0.0, 1.0, 64, dtype=jnp.float32)
    _, _, devs = shadow_check(fn, x)
    assert devs > 1e-6  # f32 catastrophic cancellation, imaginary-only
