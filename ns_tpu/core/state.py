"""Flow state pytrees.

The reference threads (u, v, p) plus — for the two-step Chorin schemes — the
previous-step velocities (u^{n-1}, v^{n-1}) through its python loops
(chorin_fd/simulate.py:251-271, chorin_spectral/simulate.py:547-570).
Here the same state is a registered pytree so it flows through jit /
lax.scan / shard_map / grad unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

Array = jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FlowState:
    """Primitive-variable flow state.

    u, v, p: (nx, ny) fields (or any leading batch dims under vmap/shard_map).
    u_prev, v_prev: previous-step velocities for Adams-Bashforth two-step
    history (None for single-step schemes like direct_fd).
    """

    u: Array
    v: Array
    p: Array
    u_prev: Optional[Array] = None
    v_prev: Optional[Array] = None

    def with_history(self) -> "FlowState":
        """Seed AB history with the current fields (reference initialises
        u1, v1 = u.copy(), v.copy(); chorin_fd/simulate.py:256)."""
        return dataclasses.replace(self, u_prev=self.u, v_prev=self.v)

    def astype(self, dtype) -> "FlowState":
        cast = lambda a: None if a is None else a.astype(dtype)
        return FlowState(
            u=cast(self.u), v=cast(self.v), p=cast(self.p),
            u_prev=cast(self.u_prev), v_prev=cast(self.v_prev),
        )


def zeros_state(nx: int, ny: int, dtype=jnp.float32, history: bool = False) -> FlowState:
    z = jnp.zeros((nx, ny), dtype=dtype)
    st = FlowState(u=z, v=z, p=z)
    return st.with_history() if history else st
