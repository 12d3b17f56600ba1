"""Spatially-sharded direct_fd solver: shard_map + halo exchange.

The single-device solver (ns_tpu/solvers/direct_fd.py) re-expressed as an
SPMD program: fields are row-sharded over a named mesh axis, every stencil
neighbor access across the shard boundary rides a 1-cell ppermute halo
exchange (ns_tpu/parallel/halo.py), and BC edge writes happen only on the
shards owning the physical boundary. The Jacobi pressure sweeps exchange
halos once per sweep — the dominant communication, one ICI hop each.

Numerics are the single-device algorithm exactly (same update expressions,
reference direct_fd/simulate.py:56-127); the sharded rollout is validated
elementwise against the unsharded one in tests/test_parallel.py on a fake
8-device CPU mesh (SURVEY.md §4d).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.core.bc import BC
from ns_tpu.core.state import FlowState
from ns_tpu.parallel.halo import exchange_halo_rows, global_row_index, is_first, is_last
from ns_tpu.solvers.direct_fd import DirectFDConfig

Array = jnp.ndarray


def _apply_bc_block(a: Array, bc: BC, axis_name: str) -> Array:
    """One BC on a row-sharded local block, preserving the reference's edge
    semantics (boundary.py:34-86): 'left'/'right' are global rows 0 / nx-1
    (owned by the first/last shard), 'bottom'/'top' are local columns."""
    v = jnp.asarray(bc.value, a.dtype)
    if bc.side == "left":
        def on_first(a):
            row = v if bc.kind == "dirichlet" else a[1, :] - bc.dx * v
            return a.at[0, :].set(row)
        return jax.lax.cond(is_first(axis_name), on_first, lambda a: a, a)
    if bc.side == "right":
        def on_last(a):
            row = v if bc.kind == "dirichlet" else a[-2, :] + bc.dx * v
            return a.at[-1, :].set(row)
        return jax.lax.cond(is_last(axis_name), on_last, lambda a: a, a)
    if bc.side == "bottom":
        col = v if bc.kind == "dirichlet" else a[:, 1] - bc.dy * v
        return a.at[:, 0].set(col)
    col = v if bc.kind == "dirichlet" else a[:, -2] + bc.dy * v
    return a.at[:, -1].set(col)


def _apply_bcs_block(a: Array, bcs: Sequence[BC], axis_name: str) -> Array:
    for bc in bcs:
        a = _apply_bc_block(a, bc, axis_name)
    return a


def make_sharded_step(cfg: DirectFDConfig, u_bc, v_bc, p_bc,
                      mesh: Mesh, axis: str = "x"):
    """Build the jitted sharded step on globally-shaped arrays with
    NamedSharding P(axis, None); returns (step, sharding)."""
    n_shards = mesh.shape[axis]
    if cfg.nx % n_shards:
        raise ValueError(f"nx={cfg.nx} not divisible by mesh axis {axis}={n_shards}")
    bx = cfg.nx // n_shards
    if bx < 2:
        raise ValueError("need at least 2 rows per shard for the BC stencils")
    dt, dx, dy = cfg.dt, cfg.dx, cfg.dy
    rho, nu = cfg.rho, cfg.nu
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)

    def interior_mask(dtype):
        g = global_row_index(bx, axis)  # (bx, 1)
        jj = jax.lax.broadcasted_iota(jnp.int32, (bx, cfg.ny), 1)
        m = (g > 0) & (g < cfg.nx - 1) & (jj > 0) & (jj < cfg.ny - 1)
        return m

    def shift_cols(a, by):
        return jnp.roll(a, by, axis=1)

    def block_step(u: Array, v: Array, p: Array):
        mask = interior_mask(u.dtype)

        # --- source term b (ref :56-66; x along axis 1, y along axis 0) ---
        u_pad = exchange_halo_rows(u, axis)
        v_pad = exchange_halo_rows(v, axis)
        dudx = (shift_cols(u, -1) - shift_cols(u, 1)) / (2 * dx)
        dvdx = (shift_cols(v, -1) - shift_cols(v, 1)) / (2 * dx)
        dudy = (u_pad[2:] - u_pad[:-2]) / (2 * dy)
        dvdy = (v_pad[2:] - v_pad[:-2]) / (2 * dy)
        b = jnp.where(
            mask,
            rho / dt * (dudx + dvdy) - dudx**2 - 2 * dudy * dvdx - dvdy**2,
            0.0)

        # --- pressure: nit Jacobi sweeps, halo exchange per sweep ---
        def sweep(_, p):
            p_pad = exchange_halo_rows(p, axis)
            p_new = (((shift_cols(p, -1) + shift_cols(p, 1)) * dy2
                      + (p_pad[2:] + p_pad[:-2]) * dx2) / denom
                     - dx2 * dy2 / denom * b)
            p = jnp.where(mask, p_new, p)
            return _apply_bcs_block(p, p_bc, axis)

        p = jax.lax.fori_loop(0, cfg.nit, sweep, p)

        # --- momentum (ref :98-118) ---
        p_pad = exchange_halo_rows(p, axis)
        u_new = (u
                 - u * dt / dx * (u - shift_cols(u, 1))
                 - v * dt / dy * (u - u_pad[:-2])
                 - dt / (2 * rho * dx) * (shift_cols(p, -1) - shift_cols(p, 1))
                 + nu * (dt / dx2 * (shift_cols(u, -1) - 2 * u + shift_cols(u, 1))
                         + dt / dy2 * (u_pad[2:] - 2 * u + u_pad[:-2])))
        v_new = (v
                 - u * dt / dx * (v - shift_cols(v, 1))
                 - v * dt / dy * (v - v_pad[:-2])
                 - dt / (2 * rho * dy) * (p_pad[2:] - p_pad[:-2])
                 + nu * (dt / dx2 * (shift_cols(v, -1) - 2 * v + shift_cols(v, 1))
                         + dt / dy2 * (v_pad[2:] - 2 * v + v_pad[:-2])))
        u = jnp.where(mask, u_new, u)
        v = jnp.where(mask, v_new, v)
        u = _apply_bcs_block(u, u_bc, axis)
        v = _apply_bcs_block(v, v_bc, axis)
        return u, v, p

    spec = P(axis, None)
    sharded = jax.shard_map(block_step, mesh=mesh,
                            in_specs=(spec, spec, spec),
                            out_specs=(spec, spec, spec))

    @jax.jit
    def step(state: FlowState) -> FlowState:
        u, v, p = sharded(state.u, state.v, state.p)
        return FlowState(u=u, v=v, p=p)

    return step, NamedSharding(mesh, spec)


def simulate(cfg: DirectFDConfig, state0: FlowState, u_bc, v_bc, p_bc,
             mesh: Mesh, axis: str = "x"):
    """Sharded rollout under lax.scan returning stacked (nt, nx, ny) fields
    (sharded on their row axis)."""
    step, sharding = make_sharded_step(cfg, u_bc, v_bc, p_bc, mesh, axis)
    state0 = FlowState(u=jax.device_put(state0.u, sharding),
                       v=jax.device_put(state0.v, sharding),
                       p=jax.device_put(state0.p, sharding))

    @jax.jit
    def roll(state0):
        def body(state, _):
            state = step(state)
            return state, (state.u, state.v, state.p)
        _, seqs = jax.lax.scan(body, state0, None, length=cfg.nt)
        return seqs

    return roll(state0)
