"""Fused explicit-momentum Pallas kernel (SURVEY.md §7 build-plan item 5:
"advection+diffusion+BC-mask in one pass").

The chorin_fd explicit predictor (reference chorin_fd/simulate.py:63-91,
ns_tpu/solvers/chorin_fd.py::_explicit_predictor) reads four fields
(u^n, v^n, u^{n-1}, v^{n-1}), evaluates AB2 advection + diffusion
stencils, and writes the two starred velocities — then the step applies
the velocity BCs. Under XLA that is one (or a few) elementwise fusions
with ~6 grid-sized HBM streams; this kernel runs the whole phase —
BOTH fields' stencils AND the BC edge writes — as one launch over
overlapped row strips, so the four inputs are read exactly once, the two
outputs written exactly once, and nothing else touches HBM.

Layout: grid over row strips of `tile_rows`; each program sees a
(tile_rows + 16, ny) working strip per field (its own rows plus an 8-row
halo block from each neighbor, the minimum f32 sublane tile — the stencil
needs 1 halo row; the other 7 ride along for alignment). Out-of-range
halo blocks at the boundary strips clamp to in-range blocks and are
masked off by the global-row interior mask, exactly as in
poisson_kernels.sor_redblack_tiled_pallas.

The pure-XLA twin is `_explicit_predictor` + `apply_bcs`
(solvers/chorin_fd.py); `tests/test_pallas_kernels.py` compares the two
elementwise in interpret mode (repo convention: every Pallas kernel keeps
a pure-XLA twin and an interpret-mode parity test).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ns_tpu.core.bc import BC

Array = jnp.ndarray

_H = 8  # halo block rows (f32 sublane tile); stencil uses 1, rest pad


def _apply_bcs_tiled(q: Array, bcs: Sequence[BC], rows: Array, cols: Array,
                     nx: int, ny: int) -> Array:
    """List-order BC edge writes on a working strip, masks built from
    GLOBAL row/col indices (the strip sees only part of the grid).
    Neumann pulls the inner neighbor via pltpu.roll — the 1-row/col
    neighbor is always inside the working strip for the edge rows that
    are inside it. nx/ny are the LOGICAL grid bounds (masks); roll
    distances use the buffer's own shape (which may be padded)."""
    W, Wc = q.shape
    for bc in bcs:
        v = jnp.asarray(bc.value, q.dtype)
        if bc.side == "left":
            mask = rows == 0
            val = v if bc.kind == "dirichlet" else \
                pltpu.roll(q, W - 1, 0) - bc.dx * v
        elif bc.side == "right":
            mask = rows == nx - 1
            val = v if bc.kind == "dirichlet" else \
                pltpu.roll(q, 1, 0) + bc.dx * v
        elif bc.side == "bottom":
            mask = cols == 0
            val = v if bc.kind == "dirichlet" else \
                pltpu.roll(q, Wc - 1, 1) - bc.dy * v
        else:
            mask = cols == ny - 1
            val = v if bc.kind == "dirichlet" else \
                pltpu.roll(q, 1, 1) + bc.dy * v
        q = jnp.where(mask, val, q)
    return q


def momentum_explicit_fused_pallas(
        un: Array, vn: Array, un1: Array, vn1: Array,
        dt: float, dx: float, dy: float, nu: float,
        u_bc: Sequence[BC], v_bc: Sequence[BC],
        quirk_compat: bool = True, tile_rows: int = 128,
        interpret: bool = False,
        logical_shape: tuple | None = None) -> tuple[Array, Array]:
    """(u*, v*) = AB2 advection + diffusion + velocity BCs, one launch.

    Numerics identical to _explicit_predictor (incl. the reference's
    y-advection axis quirk under quirk_compat, ref :74,76,82-85) followed
    by apply_bcs(u_bc)/apply_bcs(v_bc). `logical_shape` supports the
    pad-and-mask entry (`momentum_explicit_fused_any`): masks and BC
    edges key on the logical grid, pad cells pass through untouched."""
    nx, ny = un.shape
    nx_log, ny_log = logical_shape or (nx, ny)
    tm = tile_rows
    if nx % tm or tm % _H:
        raise ValueError(f"need tile_rows | nx and 8 | tile_rows; got "
                         f"nx={nx}, tile_rows={tm}")
    n_strips = nx // tm
    sub = tm // _H
    W = tm + 2 * _H
    dx2, dy2 = dx * dx, dy * dy

    def kernel(ut, um, ub, vt, vm, vb, u1t, u1m, u1b, v1t, v1m, v1b,
               uo, vo):
        i = pl.program_id(0)
        uw = jnp.concatenate([ut[:, :], um[:, :], ub[:, :]], axis=0)
        vw = jnp.concatenate([vt[:, :], vm[:, :], vb[:, :]], axis=0)
        u1w = jnp.concatenate([u1t[:, :], u1m[:, :], u1b[:, :]], axis=0)
        v1w = jnp.concatenate([v1t[:, :], v1m[:, :], v1b[:, :]], axis=0)
        g0 = i * tm - _H
        rows = g0 + jax.lax.broadcasted_iota(jnp.int32, (W, ny), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W, ny), 1)
        interior = ((rows >= 1) & (rows <= nx_log - 2)
                    & (cols >= 1) & (cols <= ny_log - 2))

        def derivs(f):
            up = pltpu.roll(f, W - 1, 0)       # f[i+1, j]
            down = pltpu.roll(f, 1, 0)         # f[i-1, j]
            right = pltpu.roll(f, ny - 1, 1)   # f[i, j+1]
            left = pltpu.roll(f, 1, 1)         # f[i, j-1]
            f_dx = (up - down) / (2.0 * dx)
            if quirk_compat:
                # reference reuses the axis-0 difference for the y term
                f_dy = (up - down) / (2.0 * dy)
            else:
                f_dy = (right - left) / (2.0 * dy)
            lap = ((up - 2.0 * f + down) / dx2
                   + (right - 2.0 * f + left) / dy2)
            return f_dx, f_dy, lap

        u_dx, u_dy, lap_u = derivs(uw)
        u1_dx, u1_dy, lap_u1 = derivs(u1w)
        v_dx, v_dy, lap_v = derivs(vw)
        v1_dx, v1_dy, lap_v1 = derivs(v1w)

        ui = uw - dt * (1.5 * (uw * u_dx + vw * u_dy)
                        - 0.5 * (u1w * u1_dx + v1w * u1_dy)) \
            + dt * nu * (1.5 * lap_u - 0.5 * lap_u1)
        vi = vw - dt * (1.5 * (uw * v_dx + vw * v_dy)
                        - 0.5 * (u1w * v1_dx + v1w * v1_dy)) \
            + dt * nu * (1.5 * lap_v - 0.5 * lap_v1)
        ui = jnp.where(interior, ui, uw)
        vi = jnp.where(interior, vi, vw)
        ui = _apply_bcs_tiled(ui, u_bc, rows, cols, nx_log, ny_log)
        vi = _apply_bcs_tiled(vi, v_bc, rows, cols, nx_log, ny_log)
        uo[:, :] = ui[_H:_H + tm, :]
        vo[:, :] = vi[_H:_H + tm, :]

    mem = pl.ANY if interpret else pltpu.VMEM
    n_hblocks = nx // _H
    # boundary strips clamp their out-of-range halo block to an in-range
    # one (the compiled path would clamp anyway; the strict interpreter
    # rejects negative block indices) — the clamped rows carry global-row
    # indices outside [0, nx) in the kernel and are masked off
    top = pl.BlockSpec((_H, ny),
                       lambda i: (jnp.maximum(i * sub - 1, 0), 0),
                       memory_space=mem)
    main = pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=mem)
    bot = pl.BlockSpec((_H, ny),
                       lambda i: (jnp.minimum((i + 1) * sub,
                                              n_hblocks - 1), 0),
                       memory_space=mem)

    launch = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        out_shape=(jax.ShapeDtypeStruct(un.shape, un.dtype),
                   jax.ShapeDtypeStruct(un.shape, un.dtype)),
        in_specs=[top, main, bot] * 4,
        out_specs=(main, main),
        interpret=interpret,
    )
    return launch(un, un, un, vn, vn, vn, un1, un1, un1, vn1, vn1, vn1)


def tpu_interpret_active() -> bool:
    """True inside pltpu.force_tpu_interpret_mode() — lets solver-level
    gating keep Pallas paths live for CPU interpret-mode validation while
    still falling back to XLA on plain non-TPU backends."""
    try:
        from jax._src import config as _jcfg
        return (_jcfg.pallas_tpu_interpret_mode_context_manager.value
                is not None)
    except Exception:
        return False


def momentum_tile_rows(ny: int, itemsize: int = 4,
                       budget_bytes: int = 6 << 20) -> int:
    """Largest tile_rows (multiple of 8, <= 128) whose per-strip working
    set fits the VMEM budget. The footprint scales with ny (every block
    spans all columns): ~6 tm-row buffers (4 inputs incl. working
    windows, 2 outputs) plus ~64 halo/temp rows per strip. Wide grids
    shrink the strip instead of failing to compile (the guard the
    pressure kernels get from vmem_fits)."""
    rows_budget = budget_bytes // max(1, ny * itemsize)
    tm = int((rows_budget - 64) // 6)
    return max(_H, min(128, (tm // _H) * _H))


def momentum_explicit_fused_any(
        un: Array, vn: Array, un1: Array, vn1: Array,
        dt: float, dx: float, dy: float, nu: float,
        u_bc, v_bc, quirk_compat: bool = True, tile_rows: int | None = 128,
        interpret: bool = False) -> tuple[Array, Array]:
    """Pad-and-mask entry for ARBITRARY grid shapes (same scheme as
    poisson_kernels.sor_redblack_tiled_any): rows pad to a tile_rows
    multiple, columns to a lane (128) multiple; masks and BC edges key on
    the logical shape, pad cells pass through and are sliced away.
    tile_rows=None picks the widest strip that fits VMEM
    (momentum_tile_rows)."""
    nx, ny = un.shape
    if tile_rows is None:
        tile_rows = momentum_tile_rows(
            -(-ny // 128) * 128, jnp.dtype(un.dtype).itemsize)
    nxp = -(-nx // tile_rows) * tile_rows
    nyp = -(-ny // 128) * 128
    if (nxp, nyp) == (nx, ny):
        return momentum_explicit_fused_pallas(
            un, vn, un1, vn1, dt, dx, dy, nu, u_bc, v_bc,
            quirk_compat, tile_rows, interpret)
    pad = ((0, nxp - nx), (0, nyp - ny))
    ui, vi = momentum_explicit_fused_pallas(
        jnp.pad(un, pad), jnp.pad(vn, pad), jnp.pad(un1, pad),
        jnp.pad(vn1, pad), dt, dx, dy, nu, u_bc, v_bc,
        quirk_compat, tile_rows, interpret, logical_shape=(nx, ny))
    return ui[:nx, :ny], vi[:nx, :ny]
