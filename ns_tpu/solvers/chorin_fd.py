"""Chorin projection on a uniform FD grid.

Capability parity with the reference chorin_fd family
(reference src/chorin_fd/simulate.py:10-324):

  - predictor, two modes (ref :60-61):
      'explicit'      — Adams-Bashforth for advection AND diffusion
                        (ref :63-91). The reference's y-advection terms
                        reuse the axis-0 (x) difference (ref :74,76,82-85);
                        that behavior is replicated exactly so the golden
                        rollouts match (`quirk_compat=True`, default), with
                        the corrected stencil available behind the flag.
      'semi_implicit' — Adams-Bashforth advection + Crank-Nicolson diffusion
                        via an ADI two-sweep (ref :93-167). The reference
                        rebuilds its tridiagonal operators and calls dense
                        np.linalg.solve four times *per step* (ref :105-121,
                        :137-165); here the (N-2)x(N-2) operators are
                        factored ONCE at setup on the host in float64 and
                        each ADI sweep becomes a single MXU matmul by the
                        precomputed inverse.
  - pressure: reference uses sequential Gauss-Seidel SOR with a per-cell
    python double loop (ref :169-202). TPU-native replacement: red-black SOR
    (ns_tpu/ops/poisson.py) with the same relaxation formula, tol=5e-6 and
    iteration-cap semantics (ref :183,190) — parity holds at convergence.
  - correction: u <- u* - dt/(2dx) * grad(p), central (ref :204-210).
  - step order: predictor -> u/v BCs -> pressure -> p BCs -> correction
    (ref :212-234); ICs get BCs applied once at init (ref :236-249);
    (u^n, u^{n-1}) history threaded through the rollout (ref :251-271).

Axis convention preserved from the reference: axis 0 carries x-differences
(ref :73), the opposite of direct_fd.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.core.bc import BC, apply_bcs
from ns_tpu.core.state import FlowState
from ns_tpu.ops.poisson import sor_redblack, sor_wavefront

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ChorinFDConfig:
    """Constructor-parameter parity with ref chorin_fd/simulate.py:51-61."""

    nt: int = 200
    nit: int = 50
    nx: int = 50
    ny: int = 50
    dt: float = 0.001
    rho: float = 1.0
    nu: float = 1.0
    beta: float = 1.25
    # 'explicit' (AB2, ref :63-91) | 'semi_implicit' (AB2 + CN-ADI,
    # ref :93-167) | 'helmholtz' (corrected unsplit CN via exact DST
    # eigenbasis solve — no ADI splitting error / sign quirk; new)
    method: str = "semi_implicit"
    sor_tol: float = 5e-6  # ref :183
    quirk_compat: bool = True  # replicate the explicit-path axis quirk
    # 'redblack': fast data-parallel SOR (same fixed point, default);
    # 'gauss_seidel': exact reference iterate order via wavefront sweeps;
    # 'multigrid': V-cycle solver for the same system — O(1) cycles
    # instead of O(N) sweeps, the scalable choice at large N;
    # 'cg': conjugate gradient on the same Dirichlet-frame system;
    # 'dst': DIRECT matmul-DST solve of the same system — four MXU GEMMs,
    # exact fixed point, no iteration (ops/fast_poisson.py; fastest at
    # every size, see RESULTS.md shoot-out).
    pressure_mode: str = "redblack"
    mg_cycles: int = 6
    # Fused Pallas SOR kernel (whole solve in VMEM, one launch). Measured
    # 2.3x faster than the XLA red-black path at 51^2 on TPU v5e
    # (0.80 ms vs 1.86 ms per pressure solve). redblack mode only.
    use_pallas: bool = False
    # Fused explicit-momentum Pallas kernel (advection + diffusion + BC
    # edge writes for both velocity fields in one launch over overlapped
    # row strips — ops/pallas/momentum_kernels.py). explicit method
    # only; any geometry (pad-and-mask under the hood). Measured numbers
    # in RESULTS.md ("Fused momentum kernel").
    use_pallas_momentum: bool = False
    # Precision of the solver's GEMMs (ADI sweeps, dst pressure,
    # helmholtz solves). None = per-path defaults: dst/helmholtz run
    # f32 'highest', the ADI matmuls run the jnp default (bf16 on TPU
    # at f32 — same class as the spectral family's 'default' engine).
    # Set 'default'|'high'|'highest' to force one precision everywhere;
    # fidelity measurements in RESULTS.md.
    gemm_precision: str | None = None

    def __post_init__(self):
        if self.method not in ("semi_implicit", "explicit", "helmholtz"):
            raise ValueError("method must be semi_implicit|explicit|"
                             f"helmholtz, got {self.method!r}")
        if self.use_pallas_momentum and self.method != "explicit":
            # silently ignoring the flag would label XLA-path numbers as
            # pallas in programmatic benchmarks; the CLI already errors
            raise ValueError("use_pallas_momentum requires "
                             f"method='explicit'; got {self.method!r}")
        if self.pressure_mode not in ("redblack", "gauss_seidel",
                                      "multigrid", "cg", "dst"):
            raise ValueError("pressure_mode must be redblack|gauss_seidel|"
                             f"multigrid|cg|dst, got {self.pressure_mode!r}")
        if self.gemm_precision not in (None, "default", "high", "highest"):
            raise ValueError("gemm_precision must be None|default|high|"
                             f"highest, got {self.gemm_precision!r}")
        if (self.method == "semi_implicit" and self.quirk_compat
                and self.nx != self.ny):
            raise ValueError(
                "semi_implicit with quirk_compat=True replicates the "
                "reference's square-grid ADI y-sweep (np.linalg.solve(B, S) "
                "applies the (ny-2)-sized y operator along the x axis, "
                "chorin_fd/simulate.py:157-165) and needs nx == ny; got "
                f"{self.nx}x{self.ny}. Set quirk_compat=False for the "
                "corrected rectangular sweep.")

    @property
    def dx(self) -> float:
        return 2.0 / (self.nx - 1)  # ref :58

    @property
    def dy(self) -> float:
        return 2.0 / (self.ny - 1)


def resolve_precision(spec, default=None):
    """Map a ChorinFDConfig.gemm_precision string ('default'|'high'|
    'highest' or None) to a lax.Precision, with `default` as the
    unset-policy fallback — the single source of the precision policy for
    the single-device AND sharded solvers."""
    if spec:
        return getattr(jax.lax.Precision, spec.upper())
    return default


def _adi_inverses(cfg: ChorinFDConfig, dtype) -> tuple[Array, Array]:
    """Precompute the Crank-Nicolson ADI operator inverses.

    The reference builds tridiagonal A (x-sweep) and B (y-sweep) from
    scipy.sparse.diags and dense-solves per step (ref :105-121). Same
    matrices, factored once in float64 on host, stored as dense inverses so
    each sweep is one matmul on the MXU (SURVEY.md §7 build plan item 3).
    """
    dt, dx, dy, nu = cfg.dt, cfg.dx, cfg.dy, cfg.nu
    n, m = cfg.nx - 2, cfg.ny - 2
    A = (np.diag(np.full(n, 2.0 / nu * dx**2 + 2.0 * dt))
         + np.diag(np.full(n - 1, -dt), -1) + np.diag(np.full(n - 1, -dt), 1))
    B = (np.diag(np.full(m, 2.0 / nu * dy**2 + 2.0 * dt))
         + np.diag(np.full(m - 1, -dt), -1) + np.diag(np.full(m - 1, -dt), 1))
    return (jnp.asarray(np.linalg.inv(A), dtype=dtype),
            jnp.asarray(np.linalg.inv(B), dtype=dtype))


def _explicit_predictor(cfg: ChorinFDConfig, un, vn, un1, vn1):
    """Adams-Bashforth advection + diffusion (ref :63-91).

    With quirk_compat (default) the y-advection derivative of each field
    reuses the axis-0 difference exactly as the reference wrote it
    (ref :74,76,82-85); otherwise the corrected axis-1 difference is used.
    """
    dt, dx, dy, nu = cfg.dt, cfg.dx, cfg.dy, cfg.nu

    def adv_diff(f, f1):
        # x-derivatives, axis 0 (ref :73)
        f_dx = (f[2:, 1:-1] - f[:-2, 1:-1]) / (2.0 * dx)
        f1_dx = (f1[2:, 1:-1] - f1[:-2, 1:-1]) / (2.0 * dx)
        if cfg.quirk_compat:
            # reference reuses the axis-0 difference for the y-term too,
            # only dividing by 2*dy (ref :74)
            f_dy = (f[2:, 1:-1] - f[:-2, 1:-1]) / (2.0 * dy)
            f1_dy = (f1[2:, 1:-1] - f1[:-2, 1:-1]) / (2.0 * dy)
        else:
            f_dy = (f[1:-1, 2:] - f[1:-1, :-2]) / (2.0 * dy)
            f1_dy = (f1[1:-1, 2:] - f1[1:-1, :-2]) / (2.0 * dy)
        lap_f = ((f[2:, 1:-1] - 2 * f[1:-1, 1:-1] + f[:-2, 1:-1]) / dx**2
                 + (f[1:-1, 2:] - 2 * f[1:-1, 1:-1] + f[1:-1, :-2]) / dy**2)
        lap_f1 = ((f1[2:, 1:-1] - 2 * f1[1:-1, 1:-1] + f1[:-2, 1:-1]) / dx**2
                  + (f1[1:-1, 2:] - 2 * f1[1:-1, 1:-1] + f1[1:-1, :-2]) / dy**2)
        return f_dx, f_dy, f1_dx, f1_dy, lap_f, lap_f1

    u_dx, u_dy, u1_dx, u1_dy, lap_u, lap_u1 = adv_diff(un, un1)
    v_dx, v_dy, v1_dx, v1_dy, lap_v, lap_v1 = adv_diff(vn, vn1)
    uc, vc = un[1:-1, 1:-1], vn[1:-1, 1:-1]
    uc1, vc1 = un1[1:-1, 1:-1], vn1[1:-1, 1:-1]

    ui_int = uc - dt * (1.5 * (uc * u_dx + vc * u_dy)
                        - 0.5 * (uc1 * u1_dx + vc1 * u1_dy)) \
        + dt * cfg.nu * (1.5 * lap_u - 0.5 * lap_u1)
    vi_int = vc - dt * (1.5 * (uc * v_dx + vc * v_dy)
                        - 0.5 * (uc1 * v1_dx + vc1 * v1_dy)) \
        + dt * nu * (1.5 * lap_v - 0.5 * lap_v1)

    return (un.at[1:-1, 1:-1].set(ui_int), vn.at[1:-1, 1:-1].set(vi_int))


def _semi_implicit_predictor(cfg: ChorinFDConfig, A_inv, B_inv, un, vn, un1, vn1):
    """AB advection + Crank-Nicolson ADI diffusion (ref :93-167), with the
    per-step dense solves replaced by matmuls against precomputed inverses."""
    dt, dx, dy, nu = cfg.dt, cfg.dx, cfg.dy, cfg.nu
    mm = partial(jnp.matmul, precision=resolve_precision(cfg.gemm_precision))

    def advect(f, g, h):
        # f * dh/dx + g * dh/dy, centered, axis0=x (ref :126-129)
        return (f[1:-1, 1:-1] * (h[2:, 1:-1] - h[:-2, 1:-1]) / (2.0 * dx)
                + g[1:-1, 1:-1] * (h[1:-1, 2:] - h[1:-1, :-2]) / (2.0 * dy))

    def lap(h):
        return ((h[2:, 1:-1] - 2 * h[1:-1, 1:-1] + h[:-2, 1:-1]) / dx**2
                + (h[1:-1, 2:] - 2 * h[1:-1, 1:-1] + h[1:-1, :-2]) / dy**2)

    def sweeps(hn, hn1, Hn, Hn1):
        # -- x-sweep (ref :131-137): A ht = C
        # Reference defect: the semi-implicit path ADDS +dt/2(3H - H1)
        # with H = +u.grad(u) (ref :126-137), i.e. advection enters the
        # momentum update with the WRONG sign — the reference's own
        # explicit path subtracts it (ref :73-77). quirk_compat replicates
        # the flip (goldens depend on it); corrected mode restores the
        # physical minus sign. See PARITY.md "Known reference defects".
        sgn = 1.0 if cfg.quirk_compat else -1.0
        C1 = sgn * dt / 2.0 * (3.0 * Hn - Hn1)
        C2 = dt * nu * lap(hn)
        C = 2.0 / nu * dx**2 * (C1 + C2)
        # NOTE (x-sweep boundary): the zero-Dirichlet structure of A is
        # EXACT here — the x-sweep's intermediate is (I - a Dyy)(hi - hn),
        # which vanishes identically on the left/right boundaries for
        # time-independent Dirichlet velocity BCs.
        ht = mm(A_inv, C)
        # -- y-sweep (ref :157-159): B hi = S
        S = (2.0 / nu * dy**2 * (ht + hn[1:-1, 1:-1])
             - dt * (hn[1:-1, 2:] - 2 * hn[1:-1, 1:-1] + hn[1:-1, :-2]))
        if cfg.quirk_compat:
            # reference quirk: np.linalg.solve(B, S) applies the y operator
            # along the x axis (only meaningful for nx == ny; ref :157-165)
            return mm(B_inv, S)
        # Reference defect: the implicit y-operator B has zero-Dirichlet
        # structure but the y-sweep RHS never lifts the actual boundary
        # values of hi (= the BC values) onto it — the solve behaves as if
        # u* were 0 on the walls, an O(dt * u_wall) error concentrated on
        # the wall-adjacent rows (0.038/step at the Re=100 lid; it shifts
        # the cavity steady state visibly off the Ghia profile). Corrected
        # mode adds the lift  +dt * u_boundary  (= (2 dy^2/nu)(a/dy^2) u_b
        # in S's scaling), using hn's boundary rows (BCs already applied).
        S = S.at[:, 0].add(dt * hn[1:-1, 0])
        S = S.at[:, -1].add(dt * hn[1:-1, -1])
        # corrected: solve B hi^T = S^T, i.e. the y operator acts along y
        return mm(S, B_inv.T)

    uHn, uHn1 = advect(un, vn, un), advect(un1, vn1, un1)
    vHn, vHn1 = advect(un, vn, vn), advect(un1, vn1, vn1)
    ui_int = sweeps(un, un1, uHn, uHn1)
    vi_int = sweeps(vn, vn1, vHn, vHn1)
    return (un.at[1:-1, 1:-1].set(ui_int), vn.at[1:-1, 1:-1].set(vi_int))


def _helmholtz_predictor(cfg: ChorinFDConfig, hsolve, un, vn, un1, vn1):
    """Corrected unsplit Crank-Nicolson predictor (method='helmholtz').

    Solves   (I - a*lap) u* = u^n - dt (3/2 H^n - 1/2 H^{n-1}) + a lap u^n
    with a = dt*nu/2 and H = u.grad(u) (physical sign), EXACTLY in the
    DST eigenbasis (ops/fast_poisson.py::make_dst_helmholtz). This is the
    scheme the reference's ADI split (ref chorin_fd/simulate.py:93-167)
    approximates, without the dimensional-splitting error, the square-grid
    y-sweep quirk, or the advection sign flip. Same cost class as the ADI
    path (4 square GEMMs/field vs 2 plus stencils)."""
    dt, dx, dy, nu = cfg.dt, cfg.dx, cfg.dy, cfg.nu
    a = dt * nu / 2.0

    def advect(f, g, h):
        return (f[1:-1, 1:-1] * (h[2:, 1:-1] - h[:-2, 1:-1]) / (2.0 * dx)
                + g[1:-1, 1:-1] * (h[1:-1, 2:] - h[1:-1, :-2]) / (2.0 * dy))

    def lap(h):
        return ((h[2:, 1:-1] - 2 * h[1:-1, 1:-1] + h[:-2, 1:-1]) / dx**2
                + (h[1:-1, 2:] - 2 * h[1:-1, 1:-1] + h[1:-1, :-2]) / dy**2)

    uHn, uHn1 = advect(un, vn, un), advect(un1, vn1, un1)
    vHn, vHn1 = advect(un, vn, vn), advect(un1, vn1, vn1)
    rhs_u = (un[1:-1, 1:-1] - dt * (1.5 * uHn - 0.5 * uHn1) + a * lap(un))
    rhs_v = (vn[1:-1, 1:-1] - dt * (1.5 * vHn - 0.5 * vHn1) + a * lap(vn))
    return hsolve(un, rhs_u), hsolve(vn, rhs_v)


def _pressure_rhs(cfg: ChorinFDConfig, ui: Array, vi: Array) -> Array:
    """Scaled divergence source of the SOR iteration (ref :186-188)."""
    dt, dx, dy, rho = cfg.dt, cfg.dx, cfg.dy, cfg.rho
    interior = (dx * rho * dy**2 / dt * (ui[1:-1, 1:-1] - ui[:-2, 1:-1])
                + dy * rho * dx**2 / dt * (vi[1:-1, 1:-1] - vi[1:-1, :-2]))
    return jnp.zeros_like(ui).at[1:-1, 1:-1].set(interior)


def _correction(cfg: ChorinFDConfig, ui, vi, p):
    """Projection u <- u* - dt/(2h) grad p, central (ref :204-210)."""
    dt, dx, dy = cfg.dt, cfg.dx, cfg.dy
    u_int = ui[1:-1, 1:-1] - dt / (2.0 * dx) * (p[2:, 1:-1] - p[:-2, 1:-1])
    v_int = vi[1:-1, 1:-1] - dt / (2.0 * dy) * (p[1:-1, 2:] - p[1:-1, :-2])
    return ui.at[1:-1, 1:-1].set(u_int), vi.at[1:-1, 1:-1].set(v_int)


def make_step(cfg: ChorinFDConfig, u_bc: Sequence[BC], v_bc: Sequence[BC],
              p_bc: Sequence[BC], dtype=jnp.float32):
    """Build the pure one-timestep function (ref step, :212-234)."""
    prec = resolve_precision(cfg.gemm_precision)
    if cfg.method == "semi_implicit":
        A_inv, B_inv = _adi_inverses(cfg, dtype)
    elif cfg.method == "helmholtz":
        from ns_tpu.ops.fast_poisson import make_dst_helmholtz
        hsolve = make_dst_helmholtz(cfg.nx, cfg.ny, cfg.dx, cfg.dy,
                                    cfg.dt * cfg.nu / 2.0, dtype=dtype,
                                    precision=prec or jax.lax.Precision.HIGHEST)
    if cfg.pressure_mode == "dst":
        from ns_tpu.ops.fast_poisson import make_dst_poisson
        dst_solve = make_dst_poisson(cfg.nx, cfg.ny, cfg.dx, cfg.dy,
                                     dtype=dtype,
                                     precision=prec or jax.lax.Precision.HIGHEST)

    def step(state: FlowState) -> FlowState:
        un, vn, p = state.u, state.v, state.p
        un1, vn1 = state.u_prev, state.v_prev

        with jax.named_scope("chorin_fd.predictor"):
            use_momentum_kernel = False
            if cfg.method == "explicit" and cfg.use_pallas_momentum:
                from ns_tpu.ops.pallas.momentum_kernels import (
                    tpu_interpret_active)
                # Mosaic kernels need a TPU; on plain CPU/GPU backends the
                # flag degrades to the XLA path (same contract as the
                # use_pallas pressure flag) — EXCEPT under
                # pltpu.force_tpu_interpret_mode, which exists to validate
                # the kernel path on CPU
                use_momentum_kernel = (jax.default_backend() == "tpu"
                                       or tpu_interpret_active())
            if use_momentum_kernel:
                from ns_tpu.ops.pallas.momentum_kernels import (
                    momentum_explicit_fused_any)
                # fused stencils + BC edge writes, one launch (BCs are
                # part of the kernel, so no apply_bcs here); any geometry
                # via pad-and-mask; tile_rows=None auto-shrinks the strip
                # to the VMEM budget on wide grids
                ui, vi = momentum_explicit_fused_any(
                    un, vn, un1, vn1, cfg.dt, cfg.dx, cfg.dy, cfg.nu,
                    u_bc, v_bc, quirk_compat=cfg.quirk_compat,
                    tile_rows=None)
            else:
                if cfg.method == "explicit":
                    ui, vi = _explicit_predictor(cfg, un, vn, un1, vn1)
                elif cfg.method == "helmholtz":
                    ui, vi = _helmholtz_predictor(cfg, hsolve,
                                                  un, vn, un1, vn1)
                else:
                    ui, vi = _semi_implicit_predictor(cfg, A_inv, B_inv,
                                                      un, vn, un1, vn1)
                ui = apply_bcs(ui, u_bc)
                vi = apply_bcs(vi, v_bc)

        with jax.named_scope("chorin_fd.pressure"):
            rhs_c = _pressure_rhs(cfg, ui, vi)
            if cfg.pressure_mode == "gauss_seidel":
                p = sor_wavefront(p, rhs_c, cfg.dx, cfg.dy, cfg.beta,
                                  cfg.sor_tol, cfg.nit)
            elif cfg.pressure_mode == "multigrid":
                from ns_tpu.ops.multigrid import poisson_multigrid
                # the SOR fixed point is laplace(p) = rhs_c / (dx^2 dy^2)
                f = rhs_c / (cfg.dx**2 * cfg.dy**2)
                p = poisson_multigrid(p, f, cfg.dx, cfg.dy,
                                      n_cycles=cfg.mg_cycles)
            elif cfg.pressure_mode == "dst":
                # direct solve of the SOR fixed-point system: no iteration
                p = dst_solve(p, rhs_c / (cfg.dx**2 * cfg.dy**2))
            elif cfg.pressure_mode == "cg":
                from ns_tpu.ops.poisson import cg_poisson
                f = rhs_c / (cfg.dx**2 * cfg.dy**2)
                p = cg_poisson(p, f, cfg.dx, cfg.dy,
                               tol=cfg.sor_tol, max_iter=cfg.nit)
            elif cfg.use_pallas:
                from ns_tpu.ops.pallas import (sor_redblack_fused_pallas,
                                               sor_redblack_packed_tiled_pallas,
                                               vmem_fits)
                if jax.default_backend() != "tpu":
                    # Mosaic kernels need a TPU; on CPU/GPU backends the
                    # flag degrades to the XLA path (kernel parity is
                    # covered by the interpret-mode tests)
                    p = sor_redblack(p, rhs_c, cfg.dx, cfg.dy, cfg.beta,
                                     cfg.sor_tol, cfg.nit)
                elif vmem_fits(cfg.nx, cfg.ny,
                               bytes_per=jnp.dtype(dtype).itemsize):
                    # whole solve VMEM-resident, one launch (2.3x at 51^2)
                    p = sor_redblack_fused_pallas(p, rhs_c, cfg.dx, cfg.dy,
                                                  cfg.beta, cfg.sor_tol,
                                                  cfg.nit)
                elif cfg.nx % 128 == 0 and cfg.ny % 256 == 0:
                    # beyond the VMEM ceiling: overlapped-strip temporal
                    # blocking with packed color planes (1.34x at 1024^2;
                    # convergence gate every 8 sweeps — see RESULTS.md)
                    p = sor_redblack_packed_tiled_pallas(
                        p, rhs_c, cfg.dx, cfg.dy, cfg.beta, cfg.sor_tol,
                        cfg.nit, k_per_launch=8, tile_rows=128)
                else:
                    # any other geometry (incl. odd 1025^2-class grids):
                    # color-masked tiled strips with pad-and-mask
                    from ns_tpu.ops.pallas import sor_redblack_tiled_any
                    p = sor_redblack_tiled_any(p, rhs_c, cfg.dx, cfg.dy,
                                               cfg.beta, cfg.sor_tol,
                                               cfg.nit, k_per_launch=8,
                                               tile_rows=128)
            else:
                p = sor_redblack(p, rhs_c, cfg.dx, cfg.dy, cfg.beta,
                                 cfg.sor_tol, cfg.nit)
            p = apply_bcs(p, p_bc)

        with jax.named_scope("chorin_fd.correction"):
            u_next, v_next = _correction(cfg, ui, vi, p)
        return FlowState(u=u_next, v=v_next, p=p, u_prev=un, v_prev=vn)

    return step


def init_state(cfg: ChorinFDConfig, u_ic, v_ic, p_ic, u_bc, v_bc, p_bc,
               dtype=jnp.float32) -> FlowState:
    """Apply BCs to the ICs once and seed the AB history (ref :236-249,:256)."""
    u = apply_bcs(jnp.asarray(u_ic, dtype=dtype), u_bc)
    v = apply_bcs(jnp.asarray(v_ic, dtype=dtype), v_bc)
    p = apply_bcs(jnp.asarray(p_ic, dtype=dtype), p_bc)
    return FlowState(u=u, v=v, p=p).with_history()


def simulate(cfg: ChorinFDConfig, state0: FlowState, u_bc, v_bc, p_bc,
             dtype=jnp.float32):
    """Rollout under lax.scan returning stacked (nt,nx,ny) fields (ref :251-271)."""
    step = make_step(cfg, u_bc, v_bc, p_bc, dtype=dtype)

    def body(state, _):
        state = step(state)
        return state, (state.u, state.v, state.p)

    _, seqs = jax.lax.scan(body, state0, None, length=cfg.nt)
    return seqs


class NavierStokesSystem:
    """Reference-API wrapper (ref chorin_fd/simulate.py:10-61)."""

    def __init__(self, u_ic, v_ic, p_ic, u_bc, v_bc, p_bc,
                 nt=200, nit=50, nx=50, ny=50, dt=0.001,
                 rho=1, nu=1, beta=1.25, method="semi_implicit",
                 dtype=jnp.float32, quirk_compat=True,
                 pressure_mode="redblack", use_pallas=False, mg_cycles=6,
                 gemm_precision=None, use_pallas_momentum=False):
        self.cfg = ChorinFDConfig(nt=nt, nit=nit, nx=nx, ny=ny, dt=dt,
                                  rho=rho, nu=nu, beta=beta, method=method,
                                  quirk_compat=quirk_compat,
                                  pressure_mode=pressure_mode,
                                  use_pallas=use_pallas, mg_cycles=mg_cycles,
                                  gemm_precision=gemm_precision,
                                  use_pallas_momentum=use_pallas_momentum)
        self.u_bc, self.v_bc, self.p_bc = list(u_bc), list(v_bc), list(p_bc)
        self.state0 = init_state(self.cfg, u_ic, v_ic, p_ic,
                                 self.u_bc, self.v_bc, self.p_bc, dtype=dtype)
        self._step = jax.jit(make_step(self.cfg, self.u_bc, self.v_bc,
                                       self.p_bc, dtype=dtype))
        self._simulate = jax.jit(partial(
            simulate, self.cfg, u_bc=self.u_bc, v_bc=self.v_bc,
            p_bc=self.p_bc, dtype=dtype))

    def step(self, state: FlowState) -> FlowState:
        return self._step(state)

    def simulate(self):
        return self._simulate(self.state0)
