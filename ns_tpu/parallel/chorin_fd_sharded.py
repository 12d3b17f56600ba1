"""Spatially-sharded chorin_fd solver: shard_map + halo exchange + a
psum-gated red-black SOR pressure iteration.

Scale-out of the reference's flagship solver (chorin_fd/simulate.py:93-234)
as an SPMD program. chorin_fd keeps axis 0 = x (ref :73); fields shard
along their SECOND dimension (y columns) over one named mesh axis, chosen
so both ADI operators stay local:

  - predictor (semi_implicit): the Crank-Nicolson operators act along the
    UNSHARDED x axis (the reference's x-sweep `solve(A, C)` and its
    square-grid-quirk y-sweep `solve(B, S)` both contract axis 0,
    ref :137,:157-165), so each sweep is one local MXU matmul per shard.
    The corrected rectangular y-sweep (quirk_compat=False, `S @ B^-T`)
    contracts the sharded axis and rides ONE all_gather per field.
  - advection / diffusion / correction stencils: x-differences are local;
    y-differences read 1-cell ppermute halos (ns_tpu/parallel/halo.py).
  - pressure: red-black SOR (the data-parallel form of the reference's
    sequential Gauss-Seidel, ns_tpu/ops/poisson.py) with a GLOBAL
    convergence gate — err = max|p - p_prev| is reduced across shards with
    lax.pmax inside the lax.while_loop, so every shard takes the same
    number of sweeps and the iterate sequence matches the single-device
    solver exactly. Two halo exchanges per sweep (one per color).

Numerics are the single-device solver's exactly; the sharded rollout is
validated elementwise against ns_tpu/solvers/chorin_fd.py in
tests/test_chorin_fd_sharded.py on a fake 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.core.bc import BC
from ns_tpu.core.state import FlowState
from ns_tpu.parallel.halo import exchange_halo_cols
from ns_tpu.solvers.chorin_fd import (ChorinFDConfig, _adi_inverses,
                                      resolve_precision)

Array = jnp.ndarray


def _col_masks(nx: int, ny: int, by: int, axis: str):
    """(interior, first_col_interior_excluded helpers) on a local block.

    gj is the global column index of each local cell; the interior mask
    excludes global rows 0 / nx-1 and global cols 0 / ny-1.
    """
    gi = jax.lax.broadcasted_iota(jnp.int32, (nx, by), 0)
    gj = (jax.lax.broadcasted_iota(jnp.int32, (nx, by), 1)
          + jax.lax.axis_index(axis) * by)
    interior = (gi > 0) & (gi < nx - 1) & (gj > 0) & (gj < ny - 1)
    return gi, gj, interior


def _apply_bcs_block(a: Array, bcs: Sequence[BC], axis: str) -> Array:
    """BCs on a column-sharded block (chorin axis convention: axis 0 = x,
    unsharded, so 'left'/'right' rows are local on every shard;
    'bottom'/'top' columns gate on the first/last shard). Reuses the
    general row/col-sharded helper with the row axis unsharded."""
    from ns_tpu.parallel.direct_fd_sharded import _apply_bc_block
    for bc in bcs:
        a = _apply_bc_block(a, bc, None, axis)
    return a


def make_sharded_step(cfg: ChorinFDConfig, u_bc, v_bc, p_bc,
                      mesh: Mesh, axis: str = "x", dtype=jnp.float32):
    """Build the jitted sharded step on globally-shaped arrays (fields
    sharded along dim 1 on mesh axis `axis`). Returns (step, NamedSharding).

    Supports all three predictor methods (explicit, semi_implicit, and the
    corrected unsplit-CN 'helmholtz' — its eigenbasis solve rides the same
    dst_apply transposes as the dst pressure) and two pressure modes:
      - 'redblack': pmax-gated data-parallel SOR (two halo exchanges per
        sweep, global convergence gate);
      - 'dst': DIRECT matmul-DST solve of the same Dirichlet-frame system
        (ops/fast_poisson.py), distributed as four local MXU GEMMs + two
        all_to_all transposes per solve — the same transpose skeleton as
        parallel/spectral_sharded.py. The DST basis is zero-padded to the
        full (nx, ny) grid so every shard keeps uniform block shapes (no
        interior slicing under SPMD); the padding rows/cols multiply by
        zero so results are identical to the interior-sized solve.
    ('gauss_seidel' wavefronts and the fused Pallas kernel remain
    single-device paths.)
    """
    if cfg.pressure_mode not in ("redblack", "dst") or cfg.use_pallas:
        raise ValueError("sharded chorin_fd supports pressure_mode="
                         "'redblack' or 'dst' only")
    n = mesh.shape[axis]
    if cfg.ny % n:
        raise ValueError(f"ny={cfg.ny} not divisible by mesh axis size {n}")
    by = cfg.ny // n
    if by < 2:
        raise ValueError("need at least 2 columns per shard")
    nx, ny = cfg.nx, cfg.ny
    dt, dx, dy, nu, rho = cfg.dt, cfg.dx, cfg.dy, cfg.nu, cfg.rho
    dx2, dy2 = dx * dx, dy * dy
    needs_dst = cfg.pressure_mode == "dst" or cfg.method == "helmholtz"
    if needs_dst:
        if nx % n:
            raise ValueError(f"the DST paths need nx={nx} divisible by "
                             f"mesh axis size {n} (all_to_all transpose)")
        import numpy as np
        from ns_tpu.ops.fast_poisson import _dst_basis
        Sx_h, lamx = _dst_basis(nx - 2, dx)
        Sy_h, lamy = _dst_basis(ny - 2, dy)
        Sx_pad = jnp.asarray(np.pad(Sx_h, 1), dtype)          # (nx, nx)
        Sy_pad = jnp.asarray(np.pad(Sy_h, 1), dtype)          # (ny, ny)
        lam_sum = lamx[:, None] + lamy[None, :]

        def pad_inv_den(den_int):
            full = np.zeros((nx, ny))
            full[1:-1, 1:-1] = 1.0 / den_int
            return jnp.asarray(full, dtype)

        if cfg.pressure_mode == "dst":
            inv_den_poisson = pad_inv_den(lam_sum)
        if cfg.method == "helmholtz":
            a_cn = dt * nu / 2.0
            inv_den_helm = pad_inv_den(1.0 - a_cn * lam_sum)
        bx = nx // n
        _mm = partial(jnp.matmul,
                      precision=resolve_precision(
                          cfg.gemm_precision, jax.lax.Precision.HIGHEST))

        def dst_apply(F_block, inv_den_full):
            """Padded-basis eigenbasis solve on a (nx, by) column block:
            Sx ((Sx F Sy) * inv_den) Sy with the sharded contractions
            riding two all_to_all transposes (call under shard_map)."""
            t = _mm(Sx_pad, F_block)                     # (nx, by) local
            t = jax.lax.all_to_all(t, axis, split_axis=0, concat_axis=1,
                                   tiled=True)           # (bx, ny)
            t = _mm(t, Sy_pad)                           # (bx, ny) local
            i0 = jax.lax.axis_index(axis) * bx
            t = t * jax.lax.dynamic_slice_in_dim(inv_den_full, i0, bx, 0)
            t = _mm(t, Sy_pad)                           # (bx, ny) local
            t = jax.lax.all_to_all(t, axis, split_axis=1, concat_axis=0,
                                   tiled=True)           # (nx, by)
            return _mm(Sx_pad, t)                        # (nx, by) local

    if cfg.method == "semi_implicit":
        A_inv, B_inv = _adi_inverses(cfg, dtype)
        # same precision policy as the single-device ADI matmuls
        adi_mm = partial(jnp.matmul,
                         precision=resolve_precision(cfg.gemm_precision))
        # corrected y-sweep helper: B^-T with zero columns padded at the
        # global boundary positions, so slicing local columns out of the
        # (ny-2, ny) product aligns with the shard's global column range
        Bt_pad = jnp.pad(B_inv.T, ((0, 0), (1, 1)))

    def block_step(un, vn, un1, vn1, p):
        gi, gj, interior = _col_masks(nx, ny, by, axis)

        def ypad(a):
            return exchange_halo_cols(a, axis)

        def ystencil(a):
            """(left j-1, right j+1) neighbor columns via halo."""
            ap = ypad(a)
            return ap[:, :-2], ap[:, 2:]

        # --- predictor --------------------------------------------------
        if cfg.method == "explicit":
            def adv_diff(f, f1):
                # x-differences: axis 0, local (ref :73)
                fL, fR = ystencil(f)
                f1L, f1R = ystencil(f1)
                f_dx = (f[2:, :] - f[:-2, :]) / (2.0 * dx)
                f1_dx = (f1[2:, :] - f1[:-2, :]) / (2.0 * dx)
                if cfg.quirk_compat:
                    # reference reuses the axis-0 difference for the y term
                    # (ref :74,76,82-85)
                    f_dy = (f[2:, :] - f[:-2, :]) / (2.0 * dy)
                    f1_dy = (f1[2:, :] - f1[:-2, :]) / (2.0 * dy)
                else:
                    f_dy = ((fR - fL) / (2.0 * dy))[1:-1, :]
                    f1_dy = ((f1R - f1L) / (2.0 * dy))[1:-1, :]
                lap_f = ((f[2:, :] - 2 * f[1:-1, :] + f[:-2, :]) / dx2
                         + ((fR - 2 * f + fL) / dy2)[1:-1, :])
                lap_f1 = ((f1[2:, :] - 2 * f1[1:-1, :] + f1[:-2, :]) / dx2
                          + ((f1R - 2 * f1 + f1L) / dy2)[1:-1, :])
                return f_dx, f_dy, f1_dx, f1_dy, lap_f, lap_f1

            u_dx, u_dy, u1_dx, u1_dy, lap_u, lap_u1 = adv_diff(un, un1)
            v_dx, v_dy, v1_dx, v1_dy, lap_v, lap_v1 = adv_diff(vn, vn1)
            uc, vc = un[1:-1, :], vn[1:-1, :]
            uc1, vc1 = un1[1:-1, :], vn1[1:-1, :]
            ui_int = uc - dt * (1.5 * (uc * u_dx + vc * u_dy)
                                - 0.5 * (uc1 * u1_dx + vc1 * u1_dy)) \
                + dt * nu * (1.5 * lap_u - 0.5 * lap_u1)
            vi_int = vc - dt * (1.5 * (uc * v_dx + vc * v_dy)
                                - 0.5 * (uc1 * v1_dx + vc1 * v1_dy)) \
                + dt * nu * (1.5 * lap_v - 0.5 * lap_v1)
            ui = jnp.where(interior, jnp.pad(ui_int, ((1, 1), (0, 0))), un)
            vi = jnp.where(interior, jnp.pad(vi_int, ((1, 1), (0, 0))), vn)
        elif cfg.method == "helmholtz":
            # corrected unsplit CN (solvers/chorin_fd.py::
            # _helmholtz_predictor) on full (nx, by) blocks: stencils via
            # rolls/halos, boundary ring lifted onto the RHS, eigenbasis
            # solve through dst_apply. One halo exchange per field per
            # step (each ppermute is a separate collective XLA cannot
            # CSE, so the (hL, hR) pairs are computed once and threaded).
            st_un, st_vn = ystencil(un), ystencil(vn)
            st_un1, st_vn1 = ystencil(un1), ystencil(vn1)

            def advect_full(f, g, h, h_st):
                hL, hR = h_st
                return (f * (jnp.roll(h, -1, 0) - jnp.roll(h, 1, 0))
                        / (2.0 * dx) + g * (hR - hL) / (2.0 * dy))

            def helm_solve(hn, Hn, Hn1, hn_st):
                hL, hR = hn_st
                lap_hn = ((jnp.roll(hn, -1, 0) - 2 * hn
                           + jnp.roll(hn, 1, 0)) / dx2
                          + (hR - 2 * hn + hL) / dy2)
                rhs = hn - dt * (1.5 * Hn - 0.5 * Hn1) + a_cn * lap_hn
                # ring lift: +a/h^2 * fixed boundary neighbor values
                rhs = rhs.at[1, :].add(a_cn / dx2 * hn[0, :])
                rhs = rhs.at[-2, :].add(a_cn / dx2 * hn[-1, :])
                rhs = rhs + jnp.where(gj == 1, a_cn / dy2 * hL, 0.0) \
                          + jnp.where(gj == ny - 2, a_cn / dy2 * hR, 0.0)
                return jnp.where(interior, dst_apply(rhs, inv_den_helm), hn)

            uHn = advect_full(un, vn, un, st_un)
            uHn1 = advect_full(un1, vn1, un1, st_un1)
            vHn = advect_full(un, vn, vn, st_vn)
            vHn1 = advect_full(un1, vn1, vn1, st_vn1)
            ui = helm_solve(un, uHn, uHn1, st_un)
            vi = helm_solve(vn, vHn, vHn1, st_vn)
        else:
            def advect(f, g, h):
                # f * dh/dx + g * dh/dy on interior rows, all local columns
                hL, hR = ystencil(h)
                return (f[1:-1, :] * (h[2:, :] - h[:-2, :]) / (2.0 * dx)
                        + g[1:-1, :] * ((hR - hL) / (2.0 * dy))[1:-1, :])

            def lap(h):
                hL, hR = ystencil(h)
                return ((h[2:, :] - 2 * h[1:-1, :] + h[:-2, :]) / dx2
                        + ((hR - 2 * h + hL) / dy2)[1:-1, :])

            def sweeps(hn, hn1, Hn, Hn1):
                # x-sweep (ref :131-137): contracts the local x axis
                # advection sign: quirk replicates the reference's flipped
                # +dt/2(3H - H1) (see solvers/chorin_fd.py::sweeps)
                sgn = 1.0 if cfg.quirk_compat else -1.0
                C1 = sgn * dt / 2.0 * (3.0 * Hn - Hn1)
                C2 = dt * nu * lap(hn)
                C = 2.0 / nu * dx2 * (C1 + C2)
                ht = adi_mm(A_inv, C)                # (nx-2, by) local matmul
                hL, hR = ystencil(hn)
                S = (2.0 / nu * dy2 * (ht + hn[1:-1, :])
                     - dt * ((hR - 2 * hn + hL)[1:-1, :]))
                if cfg.quirk_compat:
                    # reference y-sweep contracts axis 0 too (ref :157-165)
                    return adi_mm(B_inv, S)
                # corrected boundary lift: +dt * u_boundary on the
                # wall-adjacent interior columns (the reference's implicit
                # y-solve drops this coupling — see
                # solvers/chorin_fd.py::sweeps)
                gji = gj[1:-1, :]
                S = S + jnp.where(gji == 1, dt * hL[1:-1, :], 0.0) \
                      + jnp.where(gji == ny - 2, dt * hR[1:-1, :], 0.0)
                # corrected sweep contracts the sharded y axis: gather the
                # full S row-block once (one all_gather per field), then
                # keep only this shard's output columns
                S_full = jax.lax.all_gather(S, axis, axis=1, tiled=True)
                i = jax.lax.axis_index(axis)
                Bt_cols = jax.lax.dynamic_slice_in_dim(
                    Bt_pad, i * by, by, axis=1)   # (ny-2, by) local cols
                # global interior cols are 1..ny-2 of the (nx-2, ny) gather;
                # boundary output columns come out zero and are masked off
                return adi_mm(S_full[:, 1:-1], Bt_cols)

            # NOTE: the single-device solver computes advection only on
            # interior columns; here all local columns are computed (the
            # halo provides neighbors) and non-interior results masked off.
            uHn, uHn1 = advect(un, vn, un), advect(un1, vn1, un1)
            vHn, vHn1 = advect(un, vn, vn), advect(un1, vn1, vn1)
            ui_int = sweeps(un, un1, uHn, uHn1)
            vi_int = sweeps(vn, vn1, vHn, vHn1)
            ui = jnp.where(interior, jnp.pad(ui_int, ((1, 1), (0, 0))), un)
            vi = jnp.where(interior, jnp.pad(vi_int, ((1, 1), (0, 0))), vn)

        ui = _apply_bcs_block(ui, u_bc, axis)
        vi = _apply_bcs_block(vi, v_bc, axis)

        # --- pressure: pmax-gated red-black SOR (ref :169-202) ----------
        # backward differences: x via local roll, y via the halo's left col
        vi_left = ypad(vi)[:, :-2]
        rhs_c = jnp.where(
            interior,
            dx * rho * dy2 / dt * (ui - jnp.roll(ui, 1, axis=0))
            + dy * rho * dx2 / dt * (vi - vi_left),
            0.0)
        if cfg.pressure_mode == "dst":
            # direct distributed solve: lift the fixed boundary values
            # onto the interior RHS, then solve in the eigenbasis.
            # Non-interior rows/cols of f are ignored (the padded basis
            # matrices carry zero boundary rows/cols).
            f = rhs_c / (dx2 * dy2)
            inv_dx2, inv_dy2 = 1.0 / dx2, 1.0 / dy2
            f = f.at[1, :].add(-p[0, :] * inv_dx2)
            f = f.at[-2, :].add(-p[-1, :] * inv_dx2)
            ppad = ypad(p)
            f = f + jnp.where(gj == 1, -ppad[:, :-2] * inv_dy2, 0.0) \
                  + jnp.where(gj == ny - 2, -ppad[:, 2:] * inv_dy2, 0.0)
            p = jnp.where(interior, dst_apply(f, inv_den_poisson), p)
        else:
            red = ((gi + gj) % 2 == 0) & interior
            black = ((gi + gj) % 2 == 1) & interior
            denom = 2.0 * (dx2 + dy2)
            beta = jnp.asarray(cfg.beta, ui.dtype)

            def gs_update(p):
                pp = ypad(p)
                left, right = pp[:, :-2], pp[:, 2:]
                up = jnp.roll(p, -1, axis=0)
                down = jnp.roll(p, 1, axis=0)
                return beta * (dy2 * (up + down) + dx2 * (right + left)
                               - rhs_c) / denom + (1.0 - beta) * p

            def sweep(p):
                p = jnp.where(red, gs_update(p), p)
                p = jnp.where(black, gs_update(p), p)
                return p

            def cond(carry):
                _, err, it = carry
                return (err > cfg.sor_tol) & (it < cfg.nit)

            def body(carry):
                p, _, it = carry
                p_new = sweep(p)
                # GLOBAL convergence gate: every shard reduces the same
                # error, so all shards exit the while_loop on the same sweep
                err = jax.lax.pmax(jnp.max(jnp.abs(p_new - p)), axis)
                return p_new, err, it + 1

            p, _, _ = jax.lax.while_loop(
                cond, body, (p, jnp.asarray(1.0, ui.dtype),
                             jnp.asarray(1, jnp.int32)))
        p = _apply_bcs_block(p, p_bc, axis)

        # --- correction (ref :204-210) -----------------------------------
        pp = ypad(p)
        pL, pR = pp[:, :-2], pp[:, 2:]
        u_new = ui - dt / (2.0 * dx) * (jnp.roll(p, -1, 0) - jnp.roll(p, 1, 0))
        v_new = vi - dt / (2.0 * dy) * (pR - pL)
        u_next = jnp.where(interior, u_new, ui)
        v_next = jnp.where(interior, v_new, vi)
        return u_next, v_next, p, un, vn

    spec = P(None, axis)
    sharded = jax.shard_map(block_step, mesh=mesh,
                            in_specs=(spec,) * 5,
                            out_specs=(spec,) * 5)

    @jax.jit
    def step(state: FlowState) -> FlowState:
        u, v, p, u_prev, v_prev = sharded(state.u, state.v, state.u_prev,
                                          state.v_prev, state.p)
        return FlowState(u=u, v=v, p=p, u_prev=u_prev, v_prev=v_prev)

    return step, NamedSharding(mesh, spec)


def simulate(cfg: ChorinFDConfig, state0: FlowState, u_bc, v_bc, p_bc,
             mesh: Mesh, axis: str = "x", dtype=jnp.float32):
    """Sharded rollout under lax.scan returning stacked (nt, nx, ny) u/v/p
    (ref :251-271 contract)."""
    step, sharding = make_sharded_step(cfg, u_bc, v_bc, p_bc, mesh, axis,
                                       dtype)
    put = lambda a: jax.device_put(jnp.asarray(a, dtype), sharding)
    state0 = FlowState(u=put(state0.u), v=put(state0.v), p=put(state0.p),
                       u_prev=put(state0.u_prev), v_prev=put(state0.v_prev))

    @jax.jit
    def roll(state0):
        def body(state, _):
            state = step(state)
            return state, (state.u, state.v, state.p)
        _, seqs = jax.lax.scan(body, state0, None, length=cfg.nt)
        return seqs

    return roll(state0)
