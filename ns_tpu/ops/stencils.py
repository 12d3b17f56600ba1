"""Interior finite-difference stencils as pure jnp slice algebra.

These mirror the discrete operators the reference builds inline with numpy
slicing (e.g. direct_fd/simulate.py:56-118, chorin_fd/simulate.py:63-165).
Each returns the *interior* (n-2, m-2) block; callers compose them with
`.at[1:-1, 1:-1].set/add` so boundary handling stays explicit.

Axis conventions differ between reference families and are preserved by
letting the caller choose the axis:
  - direct_fd treats axis 1 as x in its stencils (direct_fd/simulate.py:60)
  - chorin_fd treats axis 0 as x (chorin_fd/simulate.py:73)
All functions are shape-static and fuse into surrounding XLA programs; the
Pallas kernels in ns_tpu/ops/pallas provide fused alternatives for the hot
paths on real TPU hardware.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def d_central(f: Array, h: float, axis: int) -> Array:
    """Central first difference on the interior: (f[i+1]-f[i-1])/(2h)."""
    if axis == 0:
        return (f[2:, 1:-1] - f[:-2, 1:-1]) / (2.0 * h)
    return (f[1:-1, 2:] - f[1:-1, :-2]) / (2.0 * h)


def d2(f: Array, h: float, axis: int) -> Array:
    """Second central difference on the interior: (f[i+1]-2f[i]+f[i-1])/h^2."""
    if axis == 0:
        return (f[2:, 1:-1] - 2.0 * f[1:-1, 1:-1] + f[:-2, 1:-1]) / (h * h)
    return (f[1:-1, 2:] - 2.0 * f[1:-1, 1:-1] + f[1:-1, :-2]) / (h * h)


def d_backward(f: Array, h: float, axis: int) -> Array:
    """Backward (upwind) first difference on the interior: (f[i]-f[i-1])/h."""
    if axis == 0:
        return (f[1:-1, 1:-1] - f[:-2, 1:-1]) / h
    return (f[1:-1, 1:-1] - f[1:-1, :-2]) / h


def interior(f: Array) -> Array:
    return f[1:-1, 1:-1]


def set_interior(f: Array, values: Array) -> Array:
    return f.at[1:-1, 1:-1].set(values)
