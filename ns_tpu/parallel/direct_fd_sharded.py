"""Spatially-sharded direct_fd solver: shard_map + halo exchange (1D or 2D).

The single-device solver (ns_tpu/solvers/direct_fd.py) re-expressed as an
SPMD program: fields are sharded over one ('x' rows) or two ('x' rows x
'y' columns) named mesh axes; every stencil neighbor access across a shard
boundary rides a 1-cell ppermute halo exchange (ns_tpu/parallel/halo.py),
and BC edge writes happen only on the shards owning the physical boundary.
The Jacobi pressure sweeps exchange halos once per sweep per axis — the
dominant communication, one ICI hop each. With `pressure_mode='exact'`
(1D row decomposition) the sweeps are replaced by the direct mixed-BC
eigenbasis solve: four local MXU GEMMs + two all_to_all transposes per
step (same skeleton as parallel/chorin_fd_sharded.py's dst path).

Numerics are the single-device algorithm exactly (same update expressions,
reference direct_fd/simulate.py:56-127); the sharded rollout is validated
elementwise against the unsharded one in tests/test_parallel.py on fake
CPU meshes (1D and 2D decompositions).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.core.bc import BC
from ns_tpu.core.state import FlowState
from ns_tpu.parallel.halo import (exchange_halo_cols, exchange_halo_rows,
                                  is_first, is_last)
from ns_tpu.solvers.direct_fd import DirectFDConfig

Array = jnp.ndarray


def _on_first(axis: Optional[str]) -> Array:
    return jnp.asarray(True) if axis is None else is_first(axis)


def _on_last(axis: Optional[str]) -> Array:
    return jnp.asarray(True) if axis is None else is_last(axis)


def _apply_bc_block(a: Array, bc: BC, ax_r: Optional[str],
                    ax_c: Optional[str]) -> Array:
    """One BC on a sharded local block, preserving the reference's edge
    semantics (boundary.py:34-86): 'left'/'right' are global rows 0 / nx-1
    (first/last row-shard), 'bottom'/'top' are global cols 0 / ny-1
    (first/last col-shard)."""
    v = jnp.asarray(bc.value, a.dtype)
    if bc.side == "left":
        def fn(a):
            row = v if bc.kind == "dirichlet" else a[1, :] - bc.dx * v
            return a.at[0, :].set(row)
        return jax.lax.cond(_on_first(ax_r), fn, lambda a: a, a)
    if bc.side == "right":
        def fn(a):
            row = v if bc.kind == "dirichlet" else a[-2, :] + bc.dx * v
            return a.at[-1, :].set(row)
        return jax.lax.cond(_on_last(ax_r), fn, lambda a: a, a)
    if bc.side == "bottom":
        def fn(a):
            col = v if bc.kind == "dirichlet" else a[:, 1] - bc.dy * v
            return a.at[:, 0].set(col)
        return jax.lax.cond(_on_first(ax_c), fn, lambda a: a, a)

    def fn(a):
        col = v if bc.kind == "dirichlet" else a[:, -2] + bc.dy * v
        return a.at[:, -1].set(col)
    return jax.lax.cond(_on_last(ax_c), fn, lambda a: a, a)


def _apply_bcs_block(a: Array, bcs: Sequence[BC], ax_r, ax_c) -> Array:
    for bc in bcs:
        a = _apply_bc_block(a, bc, ax_r, ax_c)
    return a


def make_sharded_step(cfg: DirectFDConfig, u_bc, v_bc, p_bc,
                      mesh: Mesh, axis: str = "x",
                      axis_y: Optional[str] = None):
    """Build the jitted sharded step on globally-shaped arrays. `axis`
    shards rows; `axis_y` (optional) shards columns too (2D decomposition).
    Returns (step, NamedSharding)."""
    ax_r, ax_c = axis, axis_y
    n_r = mesh.shape[ax_r]
    n_c = mesh.shape[ax_c] if ax_c else 1
    if cfg.nx % n_r or cfg.ny % n_c:
        raise ValueError(f"grid {cfg.nx}x{cfg.ny} not divisible by mesh "
                         f"{n_r}x{n_c}")
    bx, by = cfg.nx // n_r, cfg.ny // n_c
    if bx < 2 or by < 2:
        raise ValueError("need at least 2 rows and columns per shard")
    dt, dx, dy = cfg.dt, cfg.dx, cfg.dy
    rho, nu = cfg.rho, cfg.nu
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)
    if cfg.pressure_mode == "exact":
        if ax_c is not None:
            raise ValueError("sharded pressure_mode='exact' supports the "
                             "1D row decomposition only (the eigenbasis "
                             "transposes assume one sharded axis)")
        if cfg.ny % n_r:
            raise ValueError(f"pressure_mode='exact' needs ny={cfg.ny} "
                             f"divisible by mesh axis size {n_r} "
                             "(all_to_all transpose)")
        import numpy as np
        from ns_tpu.ops.fast_poisson import (_mixed_axis_operator,
                                             _side_bcs)
        eff = _side_bcs(p_bc)
        # axis 0 carries the y-differences (ref :60-65): h0=dy, h1=dx
        V0_h, lam0, lift0 = _mixed_axis_operator(cfg.nx, dy, eff["left"],
                                                 eff["right"])
        V1_h, lam1, lift1 = _mixed_axis_operator(cfg.ny, dx, eff["bottom"],
                                                 eff["top"])
        den = lam0[:, None] + lam1[None, :]
        tiny = np.abs(den) < 1e-12 * max(1.0 / dy**2, 1.0 / dx**2)
        inv_den_h = np.where(tiny, 0.0, 1.0 / np.where(tiny, 1.0, den))
        inv_den_full_h = np.zeros((cfg.nx, cfg.ny))
        inv_den_full_h[1:-1, 1:-1] = inv_den_h
        lift_full_h = np.zeros((cfg.nx, cfg.ny))
        lift_full_h[1:-1, 1:-1] = lift0[:, None] + lift1[None, :]
        V0_pad = jnp.asarray(np.pad(V0_h, 1))                 # (nx, nx)
        V1_pad = jnp.asarray(np.pad(V1_h, 1))                 # (ny, ny)
        inv_den_full = jnp.asarray(inv_den_full_h)
        lift_full = jnp.asarray(lift_full_h)
        cy = cfg.ny // n_r

    def pad_cols(a):
        if ax_c is None:
            # unsharded columns: wrap-pad; wrap cells are masked off
            return jnp.concatenate([a[:, -1:], a, a[:, :1]], axis=1)
        return exchange_halo_cols(a, ax_c)

    def interior_mask():
        gi = jax.lax.broadcasted_iota(jnp.int32, (bx, by), 0) \
            + jax.lax.axis_index(ax_r) * bx
        gj = jax.lax.broadcasted_iota(jnp.int32, (bx, by), 1)
        if ax_c is not None:
            gj = gj + jax.lax.axis_index(ax_c) * by
        return (gi > 0) & (gi < cfg.nx - 1) & (gj > 0) & (gj < cfg.ny - 1)

    def block_step(u: Array, v: Array, p: Array):
        mask = interior_mask()

        def nbrs(a):
            """(left j-1, right j+1, down i-1, up i+1) neighbor blocks."""
            pr = exchange_halo_rows(a, ax_r)
            pc = pad_cols(a)
            return pc[:, :-2], pc[:, 2:], pr[:-2], pr[2:]

        # --- source term b (ref :56-66; x along axis 1, y along axis 0) ---
        uL, uR, uD, uU = nbrs(u)
        vL, vR, vD, vU = nbrs(v)
        dudx = (uR - uL) / (2 * dx)
        dvdx = (vR - vL) / (2 * dx)
        dudy = (uU - uD) / (2 * dy)
        dvdy = (vU - vD) / (2 * dy)
        b = jnp.where(
            mask,
            rho / dt * (dudx + dvdy) - dudx**2 - 2 * dudy * dvdx - dvdy**2,
            0.0)

        # --- pressure ------------------------------------------------------
        if cfg.pressure_mode == "exact":
            # direct mixed-BC eigenbasis solve (ops/fast_poisson.py::
            # make_mixed_poisson) distributed over the row axis: the
            # axis-1 contractions are local on row blocks, the axis-0
            # ones ride two all_to_all transposes. V0/V1 are orthonormal
            # (not symmetric), so transpose orientation matters.
            i0 = jax.lax.axis_index(ax_r)
            dt_ = p.dtype
            f = b + jax.lax.dynamic_slice_in_dim(
                lift_full.astype(dt_), i0 * bx, bx, 0)        # (bx, ny)
            hi = jax.lax.Precision.HIGHEST
            t = jnp.matmul(f, V1_pad.astype(dt_), precision=hi)
            t = jax.lax.all_to_all(t, ax_r, split_axis=1, concat_axis=0,
                                   tiled=True)                # (nx, cy)
            t = jnp.matmul(V0_pad.T.astype(dt_), t, precision=hi)
            t = t * jax.lax.dynamic_slice_in_dim(
                inv_den_full.astype(dt_), i0 * cy, cy, 1)
            t = jnp.matmul(V0_pad.astype(dt_), t, precision=hi)
            t = jax.lax.all_to_all(t, ax_r, split_axis=0, concat_axis=1,
                                   tiled=True)                # (bx, ny)
            P = jnp.matmul(t, V1_pad.T.astype(dt_), precision=hi)
            p = jnp.where(mask, P, 0.0)
            p = _apply_bcs_block(p, p_bc, ax_r, ax_c)
        else:
            def sweep(_, p):
                pL, pR, pD, pU = nbrs(p)
                p_new = (((pR + pL) * dy2 + (pU + pD) * dx2) / denom
                         - dx2 * dy2 / denom * b)
                p = jnp.where(mask, p_new, p)
                return _apply_bcs_block(p, p_bc, ax_r, ax_c)

            p = jax.lax.fori_loop(0, cfg.nit, sweep, p)

        # --- momentum (ref :98-118) ---------------------------------------
        pL, pR, pD, pU = nbrs(p)
        u_new = (u
                 - u * dt / dx * (u - uL)
                 - v * dt / dy * (u - uD)
                 - dt / (2 * rho * dx) * (pR - pL)
                 + nu * (dt / dx2 * (uR - 2 * u + uL)
                         + dt / dy2 * (uU - 2 * u + uD)))
        v_new = (v
                 - u * dt / dx * (v - vL)
                 - v * dt / dy * (v - vD)
                 - dt / (2 * rho * dy) * (pU - pD)
                 + nu * (dt / dx2 * (vR - 2 * v + vL)
                         + dt / dy2 * (vU - 2 * v + vD)))
        u = jnp.where(mask, u_new, u)
        v = jnp.where(mask, v_new, v)
        u = _apply_bcs_block(u, u_bc, ax_r, ax_c)
        v = _apply_bcs_block(v, v_bc, ax_r, ax_c)
        return u, v, p

    spec = P(ax_r, ax_c) if ax_c else P(ax_r, None)
    sharded = jax.shard_map(block_step, mesh=mesh,
                            in_specs=(spec, spec, spec),
                            out_specs=(spec, spec, spec))

    @jax.jit
    def step(state: FlowState) -> FlowState:
        u, v, p = sharded(state.u, state.v, state.p)
        return FlowState(u=u, v=v, p=p)

    return step, NamedSharding(mesh, spec)


def simulate(cfg: DirectFDConfig, state0: FlowState, u_bc, v_bc, p_bc,
             mesh: Mesh, axis: str = "x", axis_y: Optional[str] = None):
    """Sharded rollout under lax.scan returning stacked (nt, nx, ny) fields."""
    step, sharding = make_sharded_step(cfg, u_bc, v_bc, p_bc, mesh,
                                       axis, axis_y)
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
