"""Pallas TPU kernels for the elliptic pressure solves.

The hot loop of the FD families is the pressure iteration: direct_fd runs
nt*nit full-grid Jacobi sweeps (reference direct_fd/simulate.py:68-88 —
10k sweeps at the default config, SURVEY.md §3.1), chorin_fd runs SOR to a
tolerance (chorin_fd/simulate.py:169-202). Under plain XLA each sweep
round-trips the grid through HBM; these kernels keep the whole grid
resident in VMEM and run ALL sweeps inside one kernel launch — one HBM read
and one write for the entire solve (the in-VMEM ping-pong of SURVEY.md §7
item 5).

Both kernels are single-block (the grid must fit VMEM — `vmem_fits` guards;
the reference workloads are 50^2/51^2, far under the ~16 MB budget). BCs
arrive as a compile-time spec and are applied as in-kernel edge writes in
list order, preserving the reference's sequential semantics.

The jnp implementations in ns_tpu/ops/poisson.py remain the portable
fallback; solvers select via their `use_pallas` flag and tests compare the
two paths elementwise (interpret mode on CPU).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ns_tpu.core.bc import BC

Array = jnp.ndarray


def vmem_fits(nx: int, ny: int, n_buffers: int = 6,
              bytes_per: int = 4, budget: int = 14 * 1024 * 1024) -> bool:
    """Mosaic's scoped-vmem limit is 16 MB; the fused sweeps keep the grid
    plus roll/select temporaries live (~6 grid-sized buffers measured —
    1024^2 f32 needs 23.8 MB and is rejected; 512^2 fits). Pass
    `bytes_per=jnp.dtype(dtype).itemsize` — an f64 grid needs twice the
    f32 budget."""
    return nx * ny * n_buffers * bytes_per <= budget


def _edge_masks(nx: int, ny: int):
    ii = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1)
    return ii, jj


def _apply_bcs_in_kernel(p: Array, bcs: Sequence[BC], ii: Array,
                         jj: Array) -> Array:
    """Edge writes on a full-grid VMEM value, expressed as mask + roll
    (Mosaic has no scatter lowering, so .at[...].set is unavailable);
    same order semantics as ns_tpu.core.bc.apply_bcs. Neumann pulls the
    inner neighbor row/col via pltpu.roll (which wraps, but the wrap cells
    are masked off)."""
    nx, ny = p.shape
    for bc in bcs:
        v = jnp.asarray(bc.value, p.dtype)
        if bc.side == "left":
            mask = ii == 0
            val = v if bc.kind == "dirichlet" else pltpu.roll(p, nx - 1, 0) - bc.dx * v
        elif bc.side == "right":
            mask = ii == nx - 1
            val = v if bc.kind == "dirichlet" else pltpu.roll(p, 1, 0) + bc.dx * v
        elif bc.side == "bottom":
            mask = jj == 0
            val = v if bc.kind == "dirichlet" else pltpu.roll(p, ny - 1, 1) - bc.dy * v
        else:
            mask = jj == ny - 1
            val = v if bc.kind == "dirichlet" else pltpu.roll(p, 1, 1) + bc.dy * v
        p = jnp.where(mask, val, p)
    return p


def jacobi_fused_pallas(p: Array, b: Array, dx: float, dy: float,
                        n_iter: int, p_bc: Sequence[BC],
                        interpret: bool = False) -> Array:
    """All `n_iter` Jacobi sweeps (with per-sweep BC re-application, the
    direct_fd pattern) in ONE kernel launch, grid resident in VMEM."""
    nx, ny = p.shape
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)

    def kernel(p_ref, b_ref, out_ref):
        ii, jj = _edge_masks(nx, ny)
        interior = (ii > 0) & (ii < nx - 1) & (jj > 0) & (jj < ny - 1)
        b = b_ref[:, :]

        def sweep(_, p):
            up = pltpu.roll(p, nx - 1, 0)      # p[i+1, j]
            down = pltpu.roll(p, 1, 0)         # p[i-1, j]
            right = pltpu.roll(p, ny - 1, 1)   # p[i, j+1]
            left = pltpu.roll(p, 1, 1)         # p[i, j-1]
            p_new = ((right + left) * dy2 + (up + down) * dx2) / denom \
                - dx2 * dy2 / denom * b
            p = jnp.where(interior, p_new, p)
            return _apply_bcs_in_kernel(p, p_bc, ii, jj)

        out_ref[:, :] = jax.lax.fori_loop(0, n_iter, sweep, p_ref[:, :])

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(p, b)


def sor_redblack_fused_pallas(p: Array, rhs_c: Array, dx: float, dy: float,
                              beta: float, tol: float, max_iter: int,
                              p_boundary_fixed: bool = True,
                              interpret: bool = False) -> Array:
    """Red-black SOR to tolerance inside one kernel: while_loop over sweeps
    with the convergence gate evaluated in VMEM (chorin_fd semantics:
    err = max|p - p_prev_sweep| vs tol, iteration cap, boundary rows held
    fixed during the solve — ref chorin_fd/simulate.py:183-200)."""
    nx, ny = p.shape
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)

    def kernel(p_ref, c_ref, out_ref):
        ii = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 0)
        jj = jax.lax.broadcasted_iota(jnp.int32, (nx, ny), 1)
        interior = (ii > 0) & (ii < nx - 1) & (jj > 0) & (jj < ny - 1)
        red = (((ii + jj) % 2) == 0) & interior
        black = (((ii + jj) % 2) == 1) & interior
        c = c_ref[:, :]
        bta = jnp.asarray(beta, p_ref.dtype)

        def gs(p):
            # pltpu.roll requires non-negative shifts: -1 == size-1
            up = pltpu.roll(p, nx - 1, 0)
            down = pltpu.roll(p, 1, 0)
            right = pltpu.roll(p, ny - 1, 1)
            left = pltpu.roll(p, 1, 1)
            return bta * (dy2 * (up + down) + dx2 * (right + left) - c) / denom \
                + (1.0 - bta) * p

        def sweep(p):
            p = jnp.where(red, gs(p), p)
            p = jnp.where(black, gs(p), p)
            return p

        def cond(carry):
            _, err, it = carry
            return (err > tol) & (it < max_iter)

        def body(carry):
            p, _, it = carry
            p_new = sweep(p)
            err = jnp.max(jnp.abs(p_new - p))
            return p_new, err, it + 1

        p0 = p_ref[:, :]
        p_out, _, _ = jax.lax.while_loop(
            cond, body,
            (p0, jnp.asarray(1.0, p0.dtype), jnp.asarray(1, jnp.int32)))
        out_ref[:, :] = p_out

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
                  pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(p, rhs_c)


# ---------------------------------------------------------------------------
# Tiled (overlapped-strip) red-black SOR — the >= 1024^2 path
# ---------------------------------------------------------------------------

def sor_redblack_tiled_pallas(p: Array, rhs_c: Array, dx: float, dy: float,
                              beta: float, tol: float, max_iter: int,
                              k_per_launch: int = 4, tile_rows: int = 128,
                              interpret: bool = False,
                              logical_shape: tuple | None = None) -> Array:
    """Red-black SOR for grids beyond the single-block VMEM ceiling.

    Temporal blocking over row strips: each grid step loads a (tile_rows +
    2H, ny) working strip (its own rows plus H = 2*k halo rows from each
    neighbor strip, delivered as separate BlockSpec views of the same HBM
    snapshot) and runs k_per_launch FULL red-black iterations in VMEM
    before one writeback. Each iteration's dependency cone grows 2 rows, so
    with H = 2*k the strip's own rows are bit-identical to k global sweeps
    — one launch costs ~3 strip-sized HBM transfers instead of the XLA
    path's ~4k (read+write per color per sweep), at (tile_rows+2H)/tile_rows
    redundant compute.

    The convergence gate (err = max|dp| vs tol, chorin_fd/simulate.py:183,
    190) is evaluated every k_per_launch sweeps (per-strip maxima reduced
    on host side of the while_loop), so the solve may run up to
    k_per_launch-1 extra sweeps past the single-device stopping point —
    same fixed point, slightly more converged.
    """
    nx, ny = p.shape
    # pad-and-mask support (`sor_redblack_tiled_any`): the buffers may be
    # padded past the true grid; the interior masks use the LOGICAL shape,
    # so pad cells are never updated and never read by interior cells
    nx_log, ny_log = logical_shape or (nx, ny)
    H = 2 * k_per_launch
    tm = tile_rows
    if nx % tm or tm % H:
        raise ValueError(f"need tile_rows | nx and 2*k | tile_rows; got "
                         f"nx={nx}, tile_rows={tm}, H={H} "
                         "(any-geometry entry: sor_redblack_tiled_any)")
    n_strips = nx // tm
    sub = tm // H  # halo-block units per strip
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)
    W = tm + 2 * H  # working rows

    def kernel(pt, pm, pb, ct, cm, cb, out_ref, err_ref):
        i = pl.program_id(0)
        pw = jnp.concatenate([pt[:, :], pm[:, :], pb[:, :]], axis=0)
        cw = jnp.concatenate([ct[:, :], cm[:, :], cb[:, :]], axis=0)
        g0 = i * tm - H  # global row of working row 0
        rows = g0 + jax.lax.broadcasted_iota(jnp.int32, (W, ny), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (W, ny), 1)
        interior = ((rows >= 1) & (rows <= nx_log - 2)
                    & (cols >= 1) & (cols <= ny_log - 2))
        red = (((rows + cols) % 2) == 0) & interior
        black = (((rows + cols) % 2) == 1) & interior
        own = (rows >= i * tm) & (rows < (i + 1) * tm) & interior
        bta = jnp.asarray(beta, pw.dtype)

        def gs(q):
            up = pltpu.roll(q, W - 1, 0)
            down = pltpu.roll(q, 1, 0)
            right = pltpu.roll(q, ny - 1, 1)
            left = pltpu.roll(q, 1, 1)
            return bta * (dy2 * (up + down) + dx2 * (right + left) - cw) \
                / denom + (1.0 - bta) * q

        def sweep(_, q):
            q = jnp.where(red, gs(q), q)
            return jnp.where(black, gs(q), q)

        q_prev = jax.lax.fori_loop(0, k_per_launch - 1, sweep, pw)
        q_last = sweep(0, q_prev)
        # gate error: last sweep's max|dp| over this strip's own rows,
        # broadcast into a tile-aligned (8, 128) err block (Mosaic requires
        # last-two-dims multiples of (8, 128) for VMEM outputs)
        err = jnp.max(jnp.where(own, jnp.abs(q_last - q_prev), 0.0))
        err_ref[:, :] = jnp.full((8, 128), err, q_last.dtype)
        out_ref[:, :] = q_last[H:H + tm, :]

    mem = pl.ANY if interpret else pltpu.VMEM
    halo_spec_top = pl.BlockSpec((H, ny), lambda i: (i * sub - 1, 0),
                                 memory_space=mem)
    main_spec = pl.BlockSpec((tm, ny), lambda i: (i, 0), memory_space=mem)
    halo_spec_bot = pl.BlockSpec((H, ny), lambda i: ((i + 1) * sub, 0),
                                 memory_space=mem)

    launch = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        out_shape=(jax.ShapeDtypeStruct(p.shape, p.dtype),
                   jax.ShapeDtypeStruct((8 * n_strips, 128), p.dtype)),
        in_specs=[halo_spec_top, main_spec, halo_spec_bot] * 2,
        out_specs=(main_spec,
                   pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=mem)),
        interpret=interpret,
    )

    def cond(carry):
        _, err, it = carry
        return (err > tol) & (it < max_iter)

    def body(carry):
        q, _, it = carry
        q_new, errs = launch(q, q, q, rhs_c, rhs_c, rhs_c)
        return q_new, jnp.max(errs[::8, 0]), it + k_per_launch

    # it starts at 1 for the reference's cap semantics (err=1, it=1; loop
    # while it < nit -> nit-1 sweeps; ref chorin_fd/simulate.py:183,190),
    # quantized up to the launch granularity k_per_launch
    q, _, _ = jax.lax.while_loop(
        cond, body, (p, jnp.asarray(jnp.inf, p.dtype),
                     jnp.asarray(1, jnp.int32)))
    return q


def sor_redblack_tiled_any(p: Array, rhs_c: Array, dx: float, dy: float,
                           beta: float, tol: float, max_iter: int,
                           k_per_launch: int = 4, tile_rows: int = 128,
                           interpret: bool = False) -> Array:
    """Pad-and-mask entry to the tiled SOR kernel for ARBITRARY grid
    shapes (VERDICT r2: the raw kernel's `tile_rows | nx` constraint
    excluded the odd 1025^2-class grids of the Poisson shoot-out).

    Rows pad up to a tile_rows multiple and columns to a lane (128)
    multiple; the kernel masks by the logical shape, so pad cells are
    frozen at 0, never read by interior updates, and sliced away on
    return. The iterate sequence on the true grid is identical to the
    unpadded kernel's."""
    nx, ny = p.shape
    nxp = -(-nx // tile_rows) * tile_rows
    nyp = -(-ny // 128) * 128
    if (nxp, nyp) == (nx, ny):
        return sor_redblack_tiled_pallas(p, rhs_c, dx, dy, beta, tol,
                                         max_iter, k_per_launch, tile_rows,
                                         interpret)
    pad = ((0, nxp - nx), (0, nyp - ny))
    q = sor_redblack_tiled_pallas(
        jnp.pad(p, pad), jnp.pad(rhs_c, pad), dx, dy, beta, tol, max_iter,
        k_per_launch, tile_rows, interpret, logical_shape=(nx, ny))
    return q[:nx, :ny]


# ---------------------------------------------------------------------------
# Packed red/black tiled SOR — halves the VPU work of the masked form
# ---------------------------------------------------------------------------
#
# The color-masked update (above) computes gs() on every cell and selects
# half away — at >= 1024^2 the sweep is VPU-compute-bound, so that factor
# 2 is the frontier (RESULTS.md analysis). Packed storage puts each color
# in its own (nx, ny/2) array:
#
#   R[i, jc] = p[i, 2*jc + i%2]        (cells with (i+j) even)
#   B[i, jc] = p[i, 2*jc + (i+1)%2]    (cells with (i+j) odd)
#
# so a color update touches only useful lanes. Neighbor algebra: up/down
# neighbors of either color are the OTHER color at the same packed column
# (rows i+-1); left/right pair is other[jc] plus a row-parity-dependent
# +-1 column shift. The iterate sequence is bit-identical to the masked
# red-black sweeps.


def pack_redblack(p: Array) -> tuple:
    """(nx, ny) -> (R, B) packed color planes; ny must be even."""
    nx, ny = p.shape
    rows_even = (jax.lax.broadcasted_iota(jnp.int32, (nx, ny // 2), 0) % 2) == 0
    even, odd = p[:, 0::2], p[:, 1::2]
    return (jnp.where(rows_even, even, odd),
            jnp.where(rows_even, odd, even))


def unpack_redblack(R: Array, B: Array) -> Array:
    nx, ny2 = R.shape
    rows_even = (jax.lax.broadcasted_iota(jnp.int32, (nx, ny2), 0) % 2) == 0
    even = jnp.where(rows_even, R, B)
    odd = jnp.where(rows_even, B, R)
    out = jnp.zeros((nx, 2 * ny2), R.dtype)
    return out.at[:, 0::2].set(even).at[:, 1::2].set(odd)


def sor_redblack_packed_tiled_pallas(p: Array, rhs_c: Array, dx: float,
                                     dy: float, beta: float, tol: float,
                                     max_iter: int, k_per_launch: int = 8,
                                     tile_rows: int = 128,
                                     interpret: bool = False) -> Array:
    """Tiled SOR with packed color planes: same overlapped-strip temporal
    blocking and convergence semantics as sor_redblack_tiled_pallas, ~2x
    less VPU work per sweep."""
    nx, ny = p.shape
    if ny % 2 or ny % 256:
        raise ValueError(f"packed kernel needs ny % 256 == 0, got {ny}")
    H = 2 * k_per_launch
    tm = tile_rows
    if nx % tm or tm % H:
        raise ValueError(f"need tile_rows | nx and 2*k | tile_rows; got "
                         f"nx={nx}, tile_rows={tm}, H={H}")
    n_strips = nx // tm
    sub = tm // H
    ny2 = ny // 2
    dx2, dy2 = dx * dx, dy * dy
    denom = 2.0 * (dx2 + dy2)
    W = tm + 2 * H

    def kernel(Rt, Rm, Rb, Bt, Bm, Bb, cRt, cRm, cRb, cBt, cBm, cBb,
               Rout, Bout, err_ref):
        i = pl.program_id(0)
        R = jnp.concatenate([Rt[:, :], Rm[:, :], Rb[:, :]], axis=0)
        B = jnp.concatenate([Bt[:, :], Bm[:, :], Bb[:, :]], axis=0)
        cR = jnp.concatenate([cRt[:, :], cRm[:, :], cRb[:, :]], axis=0)
        cB = jnp.concatenate([cBt[:, :], cBm[:, :], cBb[:, :]], axis=0)
        g0 = i * tm - H
        rows = g0 + jax.lax.broadcasted_iota(jnp.int32, (W, ny2), 0)
        jc = jax.lax.broadcasted_iota(jnp.int32, (W, ny2), 1)
        row_even = (rows % 2) == 0
        # global j of each packed cell per color
        jR = 2 * jc + jnp.where(row_even, 0, 1)
        jB = 2 * jc + jnp.where(row_even, 1, 0)
        row_ok = (rows >= 1) & (rows <= nx - 2)
        maskR = row_ok & (jR >= 1) & (jR <= ny - 2)
        maskB = row_ok & (jB >= 1) & (jB <= ny - 2)
        own = (rows >= i * tm) & (rows < (i + 1) * tm)
        bta = jnp.asarray(beta, R.dtype)

        def color_update(self_c, other_c, c, even_shift_fwd):
            up = pltpu.roll(other_c, W - 1, 0)
            down = pltpu.roll(other_c, 1, 0)
            if even_shift_fwd:  # red: even rows pair with other[jc-1]
                shifted = jnp.where(row_even,
                                    pltpu.roll(other_c, 1, 1),
                                    pltpu.roll(other_c, ny2 - 1, 1))
            else:               # black: even rows pair with other[jc+1]
                shifted = jnp.where(row_even,
                                    pltpu.roll(other_c, ny2 - 1, 1),
                                    pltpu.roll(other_c, 1, 1))
            lr = other_c + shifted
            return bta * (dy2 * (up + down) + dx2 * lr - c) / denom \
                + (1.0 - bta) * self_c

        def sweep(carry):
            R, B = carry
            R = jnp.where(maskR, color_update(R, B, cR, True), R)
            B = jnp.where(maskB, color_update(B, R, cB, False), B)
            return R, B

        Rp, Bp = jax.lax.fori_loop(0, k_per_launch - 1,
                                   lambda _, c: sweep(c), (R, B))
        Rl, Bl = sweep((Rp, Bp))
        dmax = jnp.maximum(
            jnp.max(jnp.where(own & maskR, jnp.abs(Rl - Rp), 0.0)),
            jnp.max(jnp.where(own & maskB, jnp.abs(Bl - Bp), 0.0)))
        err_ref[:, :] = jnp.full((8, 128), dmax, R.dtype)
        Rout[:, :] = Rl[H:H + tm, :]
        Bout[:, :] = Bl[H:H + tm, :]

    mem = pl.ANY if interpret else pltpu.VMEM
    top = pl.BlockSpec((H, ny2), lambda i: (i * sub - 1, 0), memory_space=mem)
    mid = pl.BlockSpec((tm, ny2), lambda i: (i, 0), memory_space=mem)
    bot = pl.BlockSpec((H, ny2), lambda i: ((i + 1) * sub, 0),
                       memory_space=mem)

    launch = pl.pallas_call(
        kernel,
        grid=(n_strips,),
        out_shape=(jax.ShapeDtypeStruct((nx, ny2), p.dtype),
                   jax.ShapeDtypeStruct((nx, ny2), p.dtype),
                   jax.ShapeDtypeStruct((8 * n_strips, 128), p.dtype)),
        in_specs=[top, mid, bot] * 4,
        out_specs=(mid, mid,
                   pl.BlockSpec((8, 128), lambda i: (i, 0),
                                memory_space=mem)),
        interpret=interpret,
    )

    R0, B0 = pack_redblack(p)
    cR, cB = pack_redblack(rhs_c)

    def cond(carry):
        _, _, err, it = carry
        return (err > tol) & (it < max_iter)

    def body(carry):
        R, B, _, it = carry
        Rn, Bn, errs = launch(R, R, R, B, B, B, cR, cR, cR, cB, cB, cB)
        return Rn, Bn, jnp.max(errs[::8, 0]), it + k_per_launch

    R, B, _, _ = jax.lax.while_loop(
        cond, body, (R0, B0, jnp.asarray(jnp.inf, p.dtype),
                     jnp.asarray(1, jnp.int32)))
    return unpack_redblack(R, B)
