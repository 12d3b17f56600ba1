"""Declarative boundary conditions, applied as pure functions.

Capability parity with the reference BC spec (reference src/boundary.py:1-86):
a BC names one edge of a 2D field and either pins it to a value (Dirichlet,
boundary.py:34-48) or imposes a one-sided-difference derivative
(Neumann, boundary.py:56-86). Edge naming follows the reference exactly:

    left   -> A[0,  :]        right -> A[-1, :]
    bottom -> A[:,  0]        top   -> A[:, -1]

BCs are applied *in list order* (the reference mutates the array through a
sequential python loop, e.g. direct_fd/simulate.py:121-125); order matters at
corners, so `apply_bcs` preserves it.

TPU-native design: a BC list is static configuration, so application is a
trace-time python loop of functional `.at[...]` updates inside jit — XLA
fuses the edge writes into the surrounding stencil computation; there is no
runtime dispatch. No in-place mutation anywhere.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp

Array = jnp.ndarray

_SIDES = ("left", "right", "bottom", "top")


@dataclasses.dataclass(frozen=True)
class BC:
    """One boundary condition on one edge of a 2D field.

    Attributes:
      kind:  'dirichlet' (pin edge to `value`) or 'neumann' (impose the
             one-sided derivative `value` across the edge).
      value: the pinned value / imposed derivative.
      side:  'left' | 'right' | 'bottom' | 'top' (reference edge naming).
      dx, dy: grid spacings used by the Neumann one-sided difference.
    """

    kind: str
    value: float
    side: str
    dx: float = 0.0
    dy: float = 0.0

    def __post_init__(self):
        if self.side not in _SIDES:
            raise ValueError(f"side must be one of {_SIDES}, got {self.side!r}")
        if self.kind not in ("dirichlet", "neumann"):
            raise ValueError(f"kind must be dirichlet|neumann, got {self.kind!r}")

    # Convenience mirror of the reference's `bc.type` attribute.
    @property
    def type(self) -> str:
        return self.kind

    @property
    def boundary(self) -> str:
        return self.side


def dirichlet(value: float, side: str, dx: float = 0.0, dy: float = 0.0) -> BC:
    return BC("dirichlet", value, side, dx, dy)


def neumann(value: float, side: str, dx: float, dy: float) -> BC:
    return BC("neumann", value, side, dx, dy)


def apply_bc(A: Array, bc: BC) -> Array:
    """Apply a single BC to a 2D field, returning a new array.

    Semantics match reference boundary.py:34-48 (Dirichlet) and :56-86
    (Neumann one-sided differences: left edge A[0,:]=A[1,:]-dx*g, right edge
    A[-1,:]=A[-2,:]+dx*g, and the dy analogues for bottom/top).
    """
    v = jnp.asarray(bc.value, dtype=A.dtype)
    if bc.kind == "dirichlet":
        if bc.side == "left":
            return A.at[0, :].set(v)
        if bc.side == "right":
            return A.at[-1, :].set(v)
        if bc.side == "bottom":
            return A.at[:, 0].set(v)
        return A.at[:, -1].set(v)
    # neumann
    if bc.side == "left":
        return A.at[0, :].set(A[1, :] - bc.dx * v)
    if bc.side == "right":
        return A.at[-1, :].set(A[-2, :] + bc.dx * v)
    if bc.side == "bottom":
        return A.at[:, 0].set(A[:, 1] - bc.dy * v)
    return A.at[:, -1].set(A[:, -2] + bc.dy * v)


def apply_bcs(A: Array, bcs: Sequence[BC]) -> Array:
    """Apply a list of BCs in order (reference sequential-list semantics)."""
    for bc in bcs:
        A = apply_bc(A, bc)
    return A


# --- reference-named constructors (migration aliases) -----------------------
# The reference exposes BCs as classes (boundary.py:29,51) with signature
# (value, boundary, dx, dy). These aliases let reference code construct
# ns_tpu BCs unchanged; BC's .type/.boundary properties mirror the
# attribute names reference code reads.


def DirichletBoundaryCondition(value, boundary, dx=0.0, dy=0.0) -> BC:
    return BC("dirichlet", value, boundary, float(dx), float(dy))


def NeumannBoundaryCondition(value, boundary, dx, dy) -> BC:
    return BC("neumann", value, boundary, float(dx), float(dy))
