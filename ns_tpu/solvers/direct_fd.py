"""Direct finite-difference discretization of the 2D incompressible NSE.

Capability parity with the reference direct_fd family
(reference src/direct_fd/simulate.py:12-195): primitive-variable form with

  - source term b from velocity divergence + quadratic terms, central
    differences (ref :56-66)
  - pressure from `nit` fixed Jacobi sweeps, re-applying the pressure BCs
    after every sweep (ref :68-88)
  - momentum update: first-order backward (upwind) advection, central
    pressure gradient, central diffusion, explicit Euler in time (ref :90-118)
  - velocity BCs applied after the momentum update (ref :121-125)

Axis convention preserved from the reference stencils: axis 1 carries the
x-differences and axis 0 the y-differences (ref :60-65), while the BC edge
naming maps 'left' to A[0,:] (boundary.py:39-46). The domain is [-1,1]^2 via
dx = 2/(nx-1) (ref :53).

TPU-native design: one pure `step(state) -> state`; the Jacobi sweeps are a
`lax.fori_loop`, the rollout a `lax.scan`; everything jits to a single XLA
program with static shapes. No python control flow at runtime.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ns_tpu.core.bc import BC, apply_bcs
from ns_tpu.core.state import FlowState

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class DirectFDConfig:
    """Constructor-parameter parity with ref direct_fd/simulate.py:46-54."""

    nt: int = 200
    nit: int = 50
    nx: int = 50
    ny: int = 50
    dt: float = 0.001
    rho: float = 1.0
    nu: float = 0.1
    # Fused Pallas Jacobi kernel (all nit sweeps in one VMEM-resident
    # launch). At the reference 50^2 workload XLA's own fusion is faster
    # (0.82 ms vs 1.26 ms per solve on v5e), so this defaults off; it is
    # the in-VMEM ping-pong path of SURVEY.md §7 item 5 for larger grids.
    use_pallas: bool = False
    # 'jacobi': the reference's fixed nit sweeps with per-sweep BC
    # re-application (parity default, ref :68-88); 'exact': direct
    # mixed-BC eigenbasis solve of the very fixed point those sweeps
    # approach (ops/fast_poisson.py::make_mixed_poisson) — a corrected
    # mode: the reference's nit=50 leaves the solve far from converged.
    pressure_mode: str = "jacobi"

    def __post_init__(self):
        if self.pressure_mode not in ("jacobi", "exact"):
            raise ValueError("pressure_mode must be jacobi|exact, got "
                             f"{self.pressure_mode!r}")
        if self.pressure_mode == "exact" and self.use_pallas:
            raise ValueError("pressure_mode='exact' replaces the sweep "
                             "loop; use_pallas does not apply")

    @property
    def dx(self) -> float:
        return 2.0 / (self.nx - 1)  # ref :53

    @property
    def dy(self) -> float:
        return 2.0 / (self.ny - 1)


def build_up_b(cfg: DirectFDConfig, u: Array, v: Array) -> Array:
    """Pressure-Poisson source term (ref direct_fd/simulate.py:56-66)."""
    rho, dt, dx, dy = cfg.rho, cfg.dt, cfg.dx, cfg.dy
    dudx = (u[1:-1, 2:] - u[1:-1, :-2]) / (2.0 * dx)
    dvdy = (v[2:, 1:-1] - v[:-2, 1:-1]) / (2.0 * dy)
    dudy = (u[2:, 1:-1] - u[:-2, 1:-1]) / (2.0 * dy)
    dvdx = (v[1:-1, 2:] - v[1:-1, :-2]) / (2.0 * dx)
    interior = (
        rho * (1.0 / dt) * (dudx + dvdy)
        - dudx**2
        - 2.0 * dudy * dvdx
        - dvdy**2
    )
    return jnp.zeros_like(u).at[1:-1, 1:-1].set(interior)


def pressure_poisson(
    cfg: DirectFDConfig, p: Array, b: Array, p_bc: Sequence[BC]
) -> Array:
    """`nit` Jacobi sweeps with per-sweep BC re-application (ref :68-88)."""
    if cfg.use_pallas:
        from ns_tpu.ops.pallas import jacobi_fused_pallas, vmem_fits
        if not vmem_fits(cfg.nx, cfg.ny, bytes_per=jnp.dtype(p.dtype).itemsize):
            raise ValueError("grid too large for the fused Pallas Jacobi; "
                             "set use_pallas=False")
        return jacobi_fused_pallas(p, b, cfg.dx, cfg.dy, cfg.nit, p_bc)

    from ns_tpu.ops.poisson import jacobi
    return jacobi(p, b, cfg.dx, cfg.dy, cfg.nit,
                  bc_fn=lambda q: apply_bcs(q, p_bc))


def make_step(cfg: DirectFDConfig, u_bc: Sequence[BC], v_bc: Sequence[BC],
              p_bc: Sequence[BC]):
    """Build the pure one-timestep function (ref step, :90-127)."""
    dt, dx, dy = cfg.dt, cfg.dx, cfg.dy
    rho, nu = cfg.rho, cfg.nu
    if cfg.pressure_mode == "exact":
        from ns_tpu.ops.fast_poisson import make_mixed_poisson
        # axis 0 carries the y-differences here (ref :60-65): h0=dy, h1=dx
        exact_solve = make_mixed_poisson(cfg.nx, cfg.ny, dy, dx, p_bc)

    def step(state: FlowState) -> FlowState:
        un, vn, p = state.u, state.v, state.p
        b = build_up_b(cfg, un, vn)
        if cfg.pressure_mode == "exact":
            p = exact_solve(b)
        else:
            p = pressure_poisson(cfg, p, b, p_bc)

        u_int = (
            un[1:-1, 1:-1]
            - un[1:-1, 1:-1] * dt / dx * (un[1:-1, 1:-1] - un[1:-1, :-2])
            - vn[1:-1, 1:-1] * dt / dy * (un[1:-1, 1:-1] - un[:-2, 1:-1])
            - dt / (2.0 * rho * dx) * (p[1:-1, 2:] - p[1:-1, :-2])
            + nu * (dt / dx**2
                    * (un[1:-1, 2:] - 2.0 * un[1:-1, 1:-1] + un[1:-1, :-2])
                    + dt / dy**2
                    * (un[2:, 1:-1] - 2.0 * un[1:-1, 1:-1] + un[:-2, 1:-1]))
        )
        v_int = (
            vn[1:-1, 1:-1]
            - un[1:-1, 1:-1] * dt / dx * (vn[1:-1, 1:-1] - vn[1:-1, :-2])
            - vn[1:-1, 1:-1] * dt / dy * (vn[1:-1, 1:-1] - vn[:-2, 1:-1])
            - dt / (2.0 * rho * dy) * (p[2:, 1:-1] - p[:-2, 1:-1])
            + nu * (dt / dx**2
                    * (vn[1:-1, 2:] - 2.0 * vn[1:-1, 1:-1] + vn[1:-1, :-2])
                    + dt / dy**2
                    * (vn[2:, 1:-1] - 2.0 * vn[1:-1, 1:-1] + vn[:-2, 1:-1]))
        )
        u = apply_bcs(un.at[1:-1, 1:-1].set(u_int), u_bc)
        v = apply_bcs(vn.at[1:-1, 1:-1].set(v_int), v_bc)
        return FlowState(u=u, v=v, p=p)

    return step


def simulate(cfg: DirectFDConfig, state0: FlowState, u_bc, v_bc, p_bc):
    """Full rollout under lax.scan, returning stacked (nt, nx, ny) fields —
    the reference `simulate` contract (ref :129-144)."""
    step = make_step(cfg, u_bc, v_bc, p_bc)

    def body(state, _):
        state = step(state)
        return state, (state.u, state.v, state.p)

    _, (u_seq, v_seq, p_seq) = jax.lax.scan(body, state0, None, length=cfg.nt)
    return u_seq, v_seq, p_seq


class NavierStokesSystem:
    """Reference-API wrapper (ref direct_fd/simulate.py:12-54): holds ICs,
    BC lists, and physics constants; `.step` and `.simulate` run jitted."""

    def __init__(self, u_ic, v_ic, p_ic, u_bc, v_bc, p_bc,
                 nt=200, nit=50, nx=50, ny=50, dt=0.001, rho=1, nu=0.1,
                 dtype=jnp.float32, use_pallas=False,
                 pressure_mode="jacobi"):
        self.cfg = DirectFDConfig(nt=nt, nit=nit, nx=nx, ny=ny, dt=dt,
                                  rho=rho, nu=nu, use_pallas=use_pallas,
                                  pressure_mode=pressure_mode)
        self.u_bc, self.v_bc, self.p_bc = list(u_bc), list(v_bc), list(p_bc)
        self.state0 = FlowState(
            u=jnp.asarray(u_ic, dtype=dtype),
            v=jnp.asarray(v_ic, dtype=dtype),
            p=jnp.asarray(p_ic, dtype=dtype),
        )
        self._step = jax.jit(make_step(self.cfg, self.u_bc, self.v_bc, self.p_bc))
        self._simulate = jax.jit(partial(
            simulate, self.cfg, u_bc=self.u_bc, v_bc=self.v_bc, p_bc=self.p_bc))

    def step(self, state: FlowState) -> FlowState:
        return self._step(state)

    def simulate(self):
        return self._simulate(self.state0)
