"""Spatially-sharded Chebyshev pseudospectral Chorin solver.

Scale-out for the reference's chorin_spectral family (SURVEY.md §5 owes
"FFT/**Chebyshev** transforms sharded"): fields shard along their SECOND
dimension (y columns) over one named mesh axis. The step is a chain of
dense operator applications; under column sharding they split into:

  - x-contractions (Dx/P/P_inv/DPx applied from the left): local MXU
    matmuls per shard — no communication.
  - y-contractions (h @ M.T): one all_gather of the (rows, by) operand
    followed by a local matmul against this shard's column block of the
    zero-ring-padded operator, so outputs stay column-sharded with the
    global boundary columns owned by the first/last shard.
  - y-boundary reconstruction (y0/yN edge columns): a psum of per-shard
    partial sums.

~10 gathers per step, each of a field-sized block over ICI.

Only the CORRECTED mode (quirk_compat=False) is sharded: golden parity
with the reference's defective operators is a single-device concern (its
workloads are 51^2 and its scheme diverges by step ~6 —
solvers/chorin_spectral.py module notes), while the corrected mode is the
one meant to run at scale. Dirichlet and Neumann BCs both work (the
boundary-value reconstruction is the same 2x2 face solve the single-device
corrected path uses). Validated elementwise against the single-device
corrected solver on fake CPU meshes in tests/test_chorin_spectral_sharded.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.core.state import FlowState
from ns_tpu.solvers.chorin_spectral import (
    ChorinSpectralConfig, _add_dense_pressure_eig, _setup)

Array = jnp.ndarray


def _pad_right_mult(M_T: np.ndarray, ny: int, interior_in: bool,
                    dtype) -> Array:
    """Zero-ring-pad a right-multiplier M.T to (ny, ny) so full-width
    column-sharded operands can contract it: rows pad when the operator
    consumes interior values only, columns always pad (outputs carry zero
    global-boundary columns, which the assembly masks/overwrites)."""
    src, dst = M_T.shape
    out = np.zeros((ny, ny))
    if interior_in:
        assert src == ny - 2
        out[1:-1, 1:-1] = M_T
    else:
        assert src == ny
        out[:, 1:-1] = M_T
    return jnp.asarray(out, dtype)


def make_sharded_step(cfg: ChorinSpectralConfig, u_bc, v_bc, mesh: Mesh,
                      axis: str = "x", dtype=jnp.float64):
    """Build the jitted sharded corrected-mode step on globally-shaped
    (nx, ny) fields. Returns (step, NamedSharding)."""
    if cfg.quirk_compat:
        raise ValueError(
            "sharded chorin_spectral runs the corrected mode only "
            "(quirk_compat=False); reference-parity runs are single-device")
    n = mesh.shape[axis]
    Nx, Ny = cfg.nx, cfg.ny
    if Ny % n:
        raise ValueError(f"ny={Ny} not divisible by mesh axis size {n}")
    by = Ny // n
    if by < 2:
        raise ValueError("need at least 2 columns per shard")
    dt, rho, nu = cfg.dt, cfg.rho, cfg.nu
    dt_eff = nu * dt  # corrected mode applies the configured viscosity

    # sharded mode keeps the dense eigen engine (the parity-split engine's
    # fold/concat layout does not commute with the column sharding; the
    # single-chip path owns that optimization — cfg.parity_split docstring)
    u_ops, v_ops, C, host = _setup(cfg, u_bc, v_bc, dtype)
    u_ops.build_dense_eig()
    v_ops.build_dense_eig()
    _add_dense_pressure_eig(C, host, dtype)
    h = lambda a: np.asarray(a)  # device const -> host for padding

    # ---- padded right-multipliers (host-built, device constants) --------
    R_DyrT = _pad_right_mult(h(C["Dy_rows"]).T, Ny, False, dtype)
    R_DPyT = _pad_right_mult(h(C["DPy"]).T, Ny, True, dtype)
    R_pQinvT = _pad_right_mult(h(C["p_Q_inv"]).T, Ny, True, dtype)
    R_pQT = _pad_right_mult(h(C["p_Q"]).T, Ny, True, dtype)
    same_ops = (np.array_equal(h(u_ops.P), h(v_ops.P))
                and np.array_equal(h(u_ops.Q), h(v_ops.Q)))
    R_QinvT = {id(u_ops): _pad_right_mult(h(u_ops.Q_inv).T, Ny, True, dtype),
               id(v_ops): _pad_right_mult(h(v_ops.Q_inv).T, Ny, True, dtype)}
    R_QT = {id(u_ops): _pad_right_mult(h(u_ops.Q).T, Ny, True, dtype),
            id(v_ops): _pad_right_mult(h(v_ops.Q).T, Ny, True, dtype)}

    # ---- padded elementwise constants ------------------------------------
    def pad_cols(v, fill=0.0):
        out = np.full((Ny,), fill)
        out[1:-1] = v
        return out

    def inv_helmholtz_denom(ops):
        lamx = h(ops.lamx)[:, None]
        lamy = pad_cols(h(ops.lamy))[None, :]
        d = 2.0 - dt_eff * lamx - dt_eff * lamy
        return jnp.asarray(1.0 / d, dtype)  # (Nx-2, Ny) incl. benign pads

    inv_hd = {id(u_ops): inv_helmholtz_denom(u_ops),
              id(v_ops): inv_helmholtz_denom(v_ops)}

    # Uzawa inverse-denominator with optional nullspace deflation, computed
    # on the TRUE interior denominators (host) then zero-padded
    plamx = h(C["p_lamx"])[:, None]
    plamy = h(C["p_lamy"])[None, :]
    pd = plamx + plamy
    if cfg.deflate_pressure_nullspace:
        keep = np.abs(pd) > 1e-8 * np.abs(pd).max()
        inv_pd_int = np.where(keep, 1.0 / np.where(keep, pd, 1.0), 0.0)
    else:
        inv_pd_int = 1.0 / pd
    inv_pd = np.zeros((Nx - 2, Ny))
    inv_pd[:, 1:-1] = inv_pd_int
    inv_pd = jnp.asarray(inv_pd, dtype)

    # padded y-boundary reconstruction weights
    bc_y = {}
    for ops in (u_ops, v_ops):
        bc_y[id(ops)] = dict(
            b0=jnp.asarray(pad_cols(h(ops.b0_y)), dtype),
            bN=jnp.asarray(pad_cols(h(ops.bN_y)), dtype),
            e=ops.ky["e"],
            data0=(ops.ky["c0_minus"] * ops.g["g_minus_y"]
                   + ops.ky["c0_plus"] * ops.g["g_plus_y"]) / ops.ky["e"],
            dataN=(ops.ky["cN_minus"] * ops.g["g_minus_y"]
                   + ops.ky["cN_plus"] * ops.g["g_plus_y"]) / ops.ky["e"],
        )

    def chunk(full: Array) -> Array:
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(full, i * by, by, axis=1)

    def ymm(operand_full: Array, R: Array) -> Array:
        """(rows, Ny) gathered operand @ this shard's columns of R."""
        return operand_full @ chunk(R)

    def gather(a: Array) -> Array:
        # column axis is always the LAST one (the stacked u/v Helmholtz
        # operand is (2, Nx-2, by))
        return jax.lax.all_gather(a, axis, axis=a.ndim - 1, tiled=True)

    def col_masks():
        gj = (jax.lax.broadcasted_iota(jnp.int32, (1, by), 1)
              + jax.lax.axis_index(axis) * by)
        return gj == 0, gj == Ny - 1, (gj > 0) & (gj < Ny - 1)

    def boundary_rows_x(soln_local: Array, ops) -> tuple:
        """x0/xN edge-row values per local column (axis-0 sums, local)."""
        kx, g = ops.kx, ops.g
        b0 = jnp.asarray(h(ops.b0_x), dtype)[:, None]
        bN = jnp.asarray(h(ops.bN_x), dtype)[:, None]
        x0 = (jnp.sum(b0 * soln_local, axis=0)
              + (kx["c0_minus"] * g["g_minus_x"]
                 + kx["c0_plus"] * g["g_plus_x"])) / kx["e"]
        xN = (jnp.sum(bN * soln_local, axis=0)
              + (kx["cN_minus"] * g["g_minus_x"]
                 + kx["cN_plus"] * g["g_plus_x"])) / kx["e"]
        return x0, xN

    def boundary_cols_y(soln_local: Array, ops) -> tuple:
        """y0/yN edge-column values (psum-reduced partial sums)."""
        w = bc_y[id(ops)]
        part0 = jnp.sum(chunk(w["b0"][None, :]) * soln_local, axis=1)
        partN = jnp.sum(chunk(w["bN"][None, :]) * soln_local, axis=1)
        y0 = jax.lax.psum(part0, axis) / w["e"] + w["data0"]
        yN = jax.lax.psum(partN, axis) / w["e"] + w["dataN"]
        return y0, yN

    def assemble(soln_local: Array, ops) -> Array:
        """Interior-row (Nx-2, by) solution (zero boundary cols) -> full
        (Nx, by) field with reconstructed edges; corners stay zero."""
        first, last, interior_c = col_masks()
        x0, xN = boundary_rows_x(soln_local, ops)
        y0, yN = boundary_cols_y(soln_local, ops)
        out = jnp.zeros((Nx, by), dtype)
        out = out.at[1:-1, :].set(soln_local)
        out = out.at[0, :].set(jnp.where(interior_c[0], x0, 0.0))
        out = out.at[-1, :].set(jnp.where(interior_c[0], xN, 0.0))
        edge0 = jnp.where(first, y0[:, None], out[1:-1, :])
        out = out.at[1:-1, :].set(edge0)
        edgeN = jnp.where(last, yN[:, None], out[1:-1, :])
        return out.at[1:-1, :].set(edgeN)

    def lift_consts(ops):
        """Per-field boundary-lift constants (predictor docstring in
        solvers/chorin_spectral.py: the CN diffusion folds into the
        Helmholtz solve; only rank-1 boundary algebra stays on the RHS)."""
        g, kx, ky = ops.g, ops.kx, ops.ky
        return dict(
            ex=kx["e"],
            gx0=(kx["c0_plus"] * g["g_plus_x"]
                 + kx["c0_minus"] * g["g_minus_x"]) / kx["e"],
            gxN=(kx["cN_plus"] * g["g_plus_x"]
                 + kx["cN_minus"] * g["g_minus_x"]) / kx["e"],
        )

    lift_k = {id(u_ops): lift_consts(u_ops), id(v_ops): lift_consts(v_ops)}
    Dx2c0 = C["Dx_sqr_rows"][:, 0]                      # (Nx-2,)
    Dx2cN = C["Dx_sqr_rows"][:, -1]
    Dy2c0 = jnp.asarray(pad_cols(h(C["Dy_sqr_rows"])[:, 0]), dtype)  # (Ny,)
    Dy2cN = jnp.asarray(pad_cols(h(C["Dy_sqr_rows"])[:, -1]), dtype)
    Dxr = C["Dx_rows"]
    DPx = C["DPx"]
    p_P = C["p_P"]
    p_P_inv = C["p_P_inv"]

    def block_step(un, vn, un1, vn1, p):
        _, _, interior_c = col_masks()
        un_g, vn_g = gather(un), gather(vn)
        un1_g, vn1_g = gather(un1), gather(vn1)
        _un, _vn = un[1:-1, :], vn[1:-1, :]
        _un1, _vn1 = un1[1:-1, :], vn1[1:-1, :]

        def F_of(h_loc, h_g, h1_loc, h1_g, ops):
            h_dx = Dxr @ h_loc                      # (Nx-2, by) local
            h1_dx = Dxr @ h1_loc
            h_dy = ymm(h_g[1:-1, :], R_DyrT)        # gathered operand
            h1_dy = ymm(h1_g[1:-1, :], R_DyrT)
            hi = h_loc[1:-1, :]
            # CN diffusion folded into the Helmholtz solve (4h - (2-A)h
            # identity, solvers/chorin_spectral.py predictor_corrected):
            # no D^2 GEMMs; the boundary algebra below is rank-1/O(n^2)
            F = (4.0 * hi
                 - 3.0 * dt * (_un * h_dx + _vn * h_dy)
                 + dt * (_un1 * h1_dx + _vn1 * h1_dy))
            k, w = lift_k[id(ops)], bc_y[id(ops)]
            cx0 = h_loc[0, :] - (ops.b0_x @ hi) / k["ex"] + k["gx0"]
            cxN = h_loc[-1, :] - (ops.bN_x @ hi) / k["ex"] + k["gxN"]
            # h_g is the fully-gathered field, so the global y-boundary
            # sums are computable locally — no psum (w["b0"]/w["bN"] carry
            # zero pads on the global boundary columns, so summing all Ny
            # columns equals the interior sum). Keeps the step at the
            # pinned 8 all_reduces (tests/test_collectives.py).
            sum0 = jnp.sum(w["b0"][None, :] * h_g[1:-1, :], axis=1)
            sumN = jnp.sum(w["bN"][None, :] * h_g[1:-1, :], axis=1)
            cy0 = h_g[1:-1, 0] - sum0 / w["e"] + w["data0"]
            cyN = h_g[1:-1, -1] - sumN / w["e"] + w["dataN"]
            lift = (Dx2c0[:, None] * cx0[None, :]
                    + Dx2cN[:, None] * cxN[None, :]
                    + cy0[:, None] * chunk(Dy2c0[None, :])
                    + cyN[:, None] * chunk(Dy2cN[None, :]))
            F = F + nu * dt * lift
            # zero the global boundary columns (the solve is interior-only)
            return jnp.where(interior_c, F, 0.0)

        u_F = F_of(un, un_g, un1, un1_g, u_ops)
        v_F = F_of(vn, vn_g, vn1, vn1_g, v_ops)

        def helmholtz(F, ops):
            Ht = ops.P_inv @ F                       # local
            Hh = ymm(gather(Ht), R_QinvT[id(ops)])   # 1 gather
            u_hat = Hh * chunk(inv_hd[id(ops)])
            ut = ymm(gather(u_hat), R_QT[id(ops)])   # 1 gather
            return ops.P @ ut

        if same_ops:
            st = jnp.stack([u_F, v_F])
            Ht = u_ops.P_inv @ st
            Hh = ymm(gather(Ht), R_QinvT[id(u_ops)])
            u_hat = Hh * chunk(inv_hd[id(u_ops)])
            ut = ymm(gather(u_hat), R_QT[id(u_ops)])
            soln = u_ops.P @ ut
            u_soln, v_soln = soln[0], soln[1]
        else:
            u_soln = helmholtz(u_F, u_ops)
            v_soln = helmholtz(v_F, v_ops)
        # the 4h - (2-A)h identity solves for u* + h; subtract h's interior
        # (only on interior global columns — boundary columns stay zero for
        # the reconstruction masks in assemble)
        u_soln = u_soln - jnp.where(interior_c, _un, 0.0)
        v_soln = v_soln - jnp.where(interior_c, _vn, 0.0)
        ui = assemble(u_soln, u_ops)
        vi = assemble(v_soln, v_ops)

        # ---- correction: Uzawa + gradient projection ---------------------
        H = rho / dt * (Dxr @ ui + ymm(gather(vi)[1:-1, :], R_DyrT))
        H = jnp.where(interior_c, H, 0.0)
        Ht = p_P_inv @ H
        Hh = ymm(gather(Ht), R_pQinvT)
        Q_hat = Hh * chunk(inv_pd)
        Qt = ymm(gather(Q_hat), R_pQT)
        Q = p_P @ Qt                                  # (Nx-2, by), bnd cols 0
        Q_g = gather(Q)
        u_int = ui[1:-1, :] - (DPx @ Q) * dt / rho
        v_int = vi[1:-1, :] - ymm(Q_g, R_DPyT) * dt / rho
        u_int = jnp.where(interior_c, u_int, 0.0)
        v_int = jnp.where(interior_c, v_int, 0.0)
        u_next = assemble(u_int, u_ops)
        v_next = assemble(v_int, v_ops)
        # preserve p's boundary ring like the single-device
        # p.at[1:-1, 1:-1].set(Q) (solvers/chorin_spectral.py:447): only
        # interior rows AND interior global columns take Q
        p_next = p.at[1:-1, :].set(jnp.where(interior_c, Q, p[1:-1, :]))
        return u_next, v_next, p_next, un, vn

    spec = P(None, axis)
    sharded = jax.shard_map(block_step, mesh=mesh,
                            in_specs=(spec,) * 5, out_specs=(spec,) * 5)

    @jax.jit
    def step(state: FlowState) -> FlowState:
        # honor cfg.matmul_precision like the single-chip make_step (the
        # context is trace-time config, so it reaches the shard_map body)
        with jax.default_matmul_precision(cfg.matmul_precision):
            u, v, p, u_prev, v_prev = sharded(
                state.u, state.v, state.u_prev, state.v_prev, state.p)
        return FlowState(u=u, v=v, p=p, u_prev=u_prev, v_prev=v_prev)

    return step, NamedSharding(mesh, spec)


def simulate(cfg: ChorinSpectralConfig, state0: FlowState, u_bc, v_bc,
             mesh: Mesh, axis: str = "x", dtype=jnp.float64):
    """Sharded corrected-mode rollout returning stacked (nt, nx, ny) u/v/p."""
    step, sharding = make_sharded_step(cfg, u_bc, v_bc, mesh, axis, dtype)
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
