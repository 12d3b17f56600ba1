"""Halo exchange for spatially-sharded FD stencils.

TPU-native replacement for what a multi-node FD code would do with MPI
send/recv: a 1-cell halo exchange expressed as jax.lax.ppermute inside
shard_map, which XLA lowers to fused ICI collective-permutes
(SURVEY.md §5 long-context/distributed rows).

Convention: fields are sharded along axis 0 ("rows") on a named mesh axis.
The domain is non-periodic (cavity flows): ppermute delivers zeros to the
ends of the chain, and the physical-boundary shards overwrite their edge
rows via the BC masks afterwards, so the zero halos are never read.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def exchange_halo_rows(a: Array, axis_name: str) -> Array:
    """(bx, ny) local block -> (bx+2, ny) padded with neighbor edge rows.

    Row 0 of the pad is the lower neighbor's last row (zeros on the first
    shard); row -1 is the upper neighbor's first row (zeros on the last
    shard).
    """
    n = jax.lax.axis_size(axis_name)
    from_below = jax.lax.ppermute(
        a[-1:], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_above = jax.lax.ppermute(
        a[:1], axis_name, [(i, i - 1) for i in range(1, n)])
    return jnp.concatenate([from_below, a, from_above], axis=0)


def exchange_halo_cols(a: Array, axis_name: str) -> Array:
    """(bx, by) local block -> (bx, by+2) padded with neighbor edge columns
    (the axis-1 analogue of exchange_halo_rows)."""
    n = jax.lax.axis_size(axis_name)
    from_left = jax.lax.ppermute(
        a[:, -1:], axis_name, [(i, i + 1) for i in range(n - 1)])
    from_right = jax.lax.ppermute(
        a[:, :1], axis_name, [(i, i - 1) for i in range(1, n)])
    return jnp.concatenate([from_left, a, from_right], axis=1)


def global_row_index(bx: int, axis_name: str) -> Array:
    """(bx, 1) global row indices of this shard's rows."""
    i = jax.lax.axis_index(axis_name)
    local = jax.lax.broadcasted_iota(jnp.int32, (bx, 1), 0)
    return local + i * bx


def is_first(axis_name: str) -> Array:
    return jax.lax.axis_index(axis_name) == 0


def is_last(axis_name: str) -> Array:
    return jax.lax.axis_index(axis_name) == jax.lax.axis_size(axis_name) - 1
