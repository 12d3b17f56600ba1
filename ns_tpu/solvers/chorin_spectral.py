"""Chorin projection with Chebyshev pseudospectral collocation.

Capability parity with the reference chorin_spectral family
(reference src/chorin_spectral/simulate.py:10-621):

  - one-time setup (ref :59-199): Gauss-Lobatto mesh, T/T^-1 transforms,
    derivative matrices D and D^2, Robin-style BC constants folded into
    modified interior operators, eigendecompositions of the BC-modified
    Helmholtz operators and of the P_N - P_{N-2} pressure operators
    Dx*DPx / Dy*DPy, with inverses cached. All of this runs in float64
    NumPy on the host (ns_tpu/ops/cheb.py) and ships to the device as
    constants.
  - per step: predictor solves the Helmholtz system
    2u* - dt*Lap(u*) = F (AB advection + CN diffusion RHS, ref :258-282)
    by the P^-1 F Q^-T / eigenvalue-divide / transform-back trick
    (ref :284-298), then reconstructs boundary rows/cols from interior
    values (ref :300-334; corners stay zero — reference TODO at :321,
    replicated). Correction solves the Uzawa system for Q = p interior by
    the same diagonalization (ref :339-383).
  - the rollout threads (u^n, u^{n-1}) history exactly like chorin_fd
    (ref :547-570).

Per step this family is ~20 dense (N-2)^2 matmuls — already MXU-shaped;
under jit each step is a single fused XLA program.

NOTE (measured, see tests/golden): the reference scheme as written is
numerically unstable at its own default config — fields grow ~1e5x per step
from a zero+lid start and overflow by step ~6. Parity is therefore asserted
on the first 3 steps in float64 (and for 6 steps on the nullspace-deflated
workload). The corrected operator mode (`quirk_compat=False`, proper
D @ D second derivative) is provided for actual use.

BCs: quirk mode supports Dirichlet only, raising exactly like the reference
(NotImplementedError at ref :218-227). The corrected mode ALSO supports
Neumann (and the general Robin machinery underneath): the boundary values
are reconstructed from the interior via the 2x2 face solve, their
interior-dependent part is folded into the Helmholtz operator as a rank-2
outer-product update, the data part is lifted into the RHS, and the
boundary rows are re-derived after the pressure projection (they are
functions of the interior under Robin data). Neumann g is the
physical-coordinate derivative (d/dx or d/dy), not the outward normal.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.core.bc import BC
from ns_tpu.core.state import FlowState
from ns_tpu.ops import cheb

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class ChorinSpectralConfig:
    """Constructor-parameter parity with ref chorin_spectral/simulate.py:41-52."""

    nt: int = 200
    nit: int = 50  # kept for signature parity; unused (direct solves)
    nx: int = 50
    ny: int = 50
    dt: float = 0.001
    rho: float = 1.0
    nu: float = 1.0
    beta: float = 1.25  # kept for signature parity; unused
    quirk_compat: bool = True  # replicate D @ D.T second derivative
    # matmul precision for the per-step operator applications. TPU f32
    # matmuls default to bf16 inputs; 'highest' keeps true f32 — important
    # for the eigen-basis solves' conditioning. Ignored in f64 (tests).
    matmul_precision: str = "highest"
    # Deflate the near-null constant-pressure mode of the Uzawa operator
    # (pressure is defined up to a constant; the reference divides by the
    # ~0 eigenvalue sum, ref :372-373, which inflates Q to ~1e16 and costs
    # ~13 digits of cancellation in the velocity update). Defaults on for
    # the corrected mode, off for exact reference parity.
    deflate_pressure_nullspace: bool = False
    # Half-flop parity-split GEMMs (ops/parity.py): on the symmetric
    # Gauss-Lobatto grid every corrected-mode operator is reversal-even
    # (Helmholtz/Uzawa, D^2) or reversal-odd (D, D-hat), so each per-step
    # GEMM becomes two half-size GEMMs — the DST trick of
    # ops/fast_poisson.py generalized. None = auto (corrected mode at
    # interior >= 192, the measured MXU-fatness crossover); True forces it
    # (raises if an operator has no parity — quirk matrices never do);
    # False forces the dense path. Results differ from dense only by fp
    # reassociation (f64 equality tests in tests/test_parity_cheb.py).
    parity_split: bool | None = None
    # Eigen-solve schedule under parity_split: 'composed' (ParityEig2D
    # .solve_composed — per-axis transforms, fatter GEMMs, one
    # parity-order concat per transform) or 'quadrant' (.solve —
    # per-quadrant GEMM chains, zero concats). Measured within ~1-5% of
    # each other at 256^2-1024^2 (ParityEig2D.solve_composed docstring);
    # None = 'composed', the faster at the north-star 1024^2 grid.
    parity_eig_form: str | None = None

    @property
    def dx(self) -> float:
        return 2.0 / self.nx  # ref :48 (unlike FD's 2/(n-1))

    @property
    def dy(self) -> float:
        return 2.0 / self.ny


def _process_bcs(bc_list: Sequence[BC], allow_neumann: bool = False):
    """Map the BC list to Robin constants per side (ref :201-230).

    Dirichlet -> alpha=1, g=value on that side. The side naming quirk is
    preserved: top -> minus_y, bottom -> plus_y (ref :210-215), matching the
    descending Gauss-Lobatto coordinate.

    Neumann (alpha=0, beta=1, g = coordinate-direction derivative value)
    is supported in the CORRECTED mode only (`allow_neumann=True`), where
    the predictor lifts the reconstructed — interior-dependent — boundary
    values into the Helmholtz RHS (see predictor_corrected); in quirk mode
    it raises exactly like the reference (ref :218-221), whose fixed-value
    lifting cannot represent derivative data.
    """
    c = {f"{w}_{s}": 0.0 for w in ("alpha", "beta", "g")
         for s in ("minus_x", "plus_x", "minus_y", "plus_y")}
    side_map = {"left": "minus_x", "right": "plus_x",
                "top": "minus_y", "bottom": "plus_y"}
    seen = set()
    for bc in bc_list:
        s = side_map[bc.side]
        seen.add(s)
        if bc.kind == "dirichlet":
            c[f"alpha_{s}"] = 1.0
        elif bc.kind == "neumann" and allow_neumann:
            c[f"beta_{s}"] = 1.0
        else:
            raise NotImplementedError(
                "chorin_spectral supports Dirichlet BCs only in quirk mode "
                "(the reference likewise raises, chorin_spectral/simulate.py"
                ":218-221); Neumann needs quirk_compat=False")
        c[f"g_{s}"] = float(bc.value)
    missing = set(side_map.values()) - seen
    if missing:
        raise ValueError(f"chorin_spectral needs BCs on all four sides; missing {missing}")
    return c


def _boundary_constants(D: np.ndarray, c: dict, axis: str):
    """e, c0-, c0+, cN-, cN+, b0, bN per ref :102-118."""
    am, ap = c[f"alpha_minus_{axis}"], c[f"alpha_plus_{axis}"]
    bm, bp = c[f"beta_minus_{axis}"], c[f"beta_plus_{axis}"]
    c0_minus = -bp * D[0, -1]
    c0_plus = am + bm * D[-1, -1]
    cN_plus = -bm * D[-1, 0]
    cN_minus = ap + bp * D[0, 0]
    e = c0_plus * cN_minus - c0_minus * cN_plus
    b0 = -c0_plus * bp * D[0, 1:-1] - c0_minus * bm * D[-1, 1:-1]
    bN = -cN_minus * bm * D[-1, 1:-1] - cN_plus * bp * D[0, 1:-1]
    return dict(e=e, c0_minus=c0_minus, c0_plus=c0_plus,
                cN_minus=cN_minus, cN_plus=cN_plus, b0=b0, bN=bN)


class _FieldOps:
    """Device constants for one velocity field's Helmholtz solve + BC rows."""

    def __init__(self, Dx, Dy, Dx_sqr, Dy_sqr, cbc, dtype,
                 corrected: bool = False):
        self.kx = _boundary_constants(Dx, cbc, "x")
        self.ky = _boundary_constants(Dy, cbc, "y")
        self.g = {k: cbc[k] for k in
                  ("g_minus_x", "g_plus_x", "g_minus_y", "g_plus_y")}
        if corrected:
            # proper substitution of the reconstructed boundary values into
            # the interior Laplacian rows: a rank-2 outer-product update
            # D2[:,0] (x) b0/e + D2[:,-1] (x) bN/e (zero for pure Dirichlet)
            Mx = Dx_sqr[1:-1, 1:-1] + (1.0 / self.kx["e"]) * (
                np.outer(Dx_sqr[1:-1, 0], self.kx["b0"])
                + np.outer(Dx_sqr[1:-1, -1], self.kx["bN"]))
            My = Dy_sqr[1:-1, 1:-1] + (1.0 / self.ky["e"]) * (
                np.outer(Dy_sqr[1:-1, 0], self.ky["b0"])
                + np.outer(Dy_sqr[1:-1, -1], self.ky["bN"]))
        else:
            # BC-modified interior operators exactly as the reference wrote
            # them (ref :159-166): the (N-2,) edge-weight vector broadcast
            # row-wise — a quirk that only matters when beta != 0, which the
            # reference rejects anyway
            Mx = Dx_sqr[1:-1, 1:-1] + (1.0 / self.kx["e"]) * (
                self.kx["b0"] * Dx_sqr[1:-1, 0] + self.kx["bN"] * Dx_sqr[1:-1, -1])
            My = Dy_sqr[1:-1, 1:-1] + (1.0 / self.ky["e"]) * (
                self.ky["b0"] * Dy_sqr[1:-1, 0] + self.ky["bN"] * Dy_sqr[1:-1, -1])
        # host copies kept for operator-equality detection (all-Dirichlet
        # BCs give u and v identical operators -> batched Helmholtz solve)
        # and for the parity-split eigen path (ops/parity.py::ParityEig)
        self._Mx_np, self._My_np = Mx, My
        self._dtype = dtype
        # the BC constants/data enter per-step math: cast to the solver
        # dtype NOW (Mx/My above needed the f64 numpy originals) — f64
        # host leftovers silently promote the f32 boundary rows under
        # jax_enable_x64 (soon a hard error in jax scatter)
        cast = lambda d: {k: jnp.asarray(v, dtype) for k, v in d.items()}
        self.kx, self.ky, self.g = cast(self.kx), cast(self.ky), cast(self.g)
        self.b0_x = jnp.asarray(self.kx["b0"], dtype)
        self.bN_x = jnp.asarray(self.kx["bN"], dtype)
        self.b0_y = jnp.asarray(self.ky["b0"], dtype)
        self.bN_y = jnp.asarray(self.ky["bN"], dtype)
        self._dense_eig_done = False

    def build_dense_eig(self):
        """Full-operator eigendecomposition for the dense Helmholtz path.
        Deferred so the parity-split path (which eigendecomposes the two
        half-size parity blocks instead) skips the O(m^3) work."""
        if self._dense_eig_done:
            return
        dtype = self._dtype
        lamx, P = cheb.eig_real(self._Mx_np, "helmholtz-x")
        lamy, Q = cheb.eig_real(self._My_np, "helmholtz-y")
        self.lamx = jnp.asarray(lamx, dtype)
        self.lamy = jnp.asarray(lamy, dtype)
        self.P = jnp.asarray(P, dtype)
        self.Q = jnp.asarray(Q, dtype)
        self.P_inv = jnp.asarray(np.linalg.inv(P), dtype)
        self.Q_inv = jnp.asarray(np.linalg.inv(Q), dtype)
        self._dense_eig_done = True


def _setup(cfg: ChorinSpectralConfig, u_bc, v_bc, dtype):
    """One-time host-side construction of all device constants (ref :59-199)."""
    Nx, Ny = cfg.nx, cfg.ny
    Dx = cheb.d_matrix(Nx, quirk_compat=cfg.quirk_compat)
    Dy = cheb.d_matrix(Ny, quirk_compat=cfg.quirk_compat)
    Dx_sqr = cheb.d_sqr_matrix(Nx, quirk_compat=cfg.quirk_compat)
    Dy_sqr = cheb.d_sqr_matrix(Ny, quirk_compat=cfg.quirk_compat)

    corrected = not cfg.quirk_compat
    u_ops = _FieldOps(Dx, Dy, Dx_sqr, Dy_sqr,
                      _process_bcs(u_bc, allow_neumann=corrected), dtype,
                      corrected=corrected)
    v_ops = _FieldOps(Dx, Dy, Dx_sqr, Dy_sqr,
                      _process_bcs(v_bc, allow_neumann=corrected), dtype,
                      corrected=corrected)

    DPx = cheb.d_matrix_pn_minus_2(Nx, quirk_compat=cfg.quirk_compat)
    DPy = cheb.d_matrix_pn_minus_2(Ny, quirk_compat=cfg.quirk_compat)
    DxDPx = Dx[1:-1, 1:-1] @ DPx
    DyDPy = Dy[1:-1, 1:-1] @ DPy

    host = dict(Dx_rows=Dx[1:-1, :], Dy_rows=Dy[1:-1, :],
                Dx_sqr_rows=Dx_sqr[1:-1, :], Dy_sqr_rows=Dy_sqr[1:-1, :],
                DPx=DPx, DPy=DPy, DxDPx=DxDPx, DyDPy=DyDPy)
    consts = dict(
        Dx_int=jnp.asarray(Dx[1:-1, 1:-1], dtype),
        Dy_int=jnp.asarray(Dy[1:-1, 1:-1], dtype),
        Dx_sqr_int=jnp.asarray(Dx_sqr[1:-1, 1:-1], dtype),
        Dy_sqr_int=jnp.asarray(Dy_sqr[1:-1, 1:-1], dtype),
        # full interior rows incl. boundary columns, for the corrected mode's
        # boundary lifting (the reference drops these, so its lid BC never
        # enters the Helmholtz RHS — part of why its scheme is unstable)
        Dx_rows=jnp.asarray(Dx[1:-1, :], dtype),
        Dy_rows=jnp.asarray(Dy[1:-1, :], dtype),
        Dx_sqr_rows=jnp.asarray(Dx_sqr[1:-1, :], dtype),
        Dy_sqr_rows=jnp.asarray(Dy_sqr[1:-1, :], dtype),
        Dx_bar=jnp.asarray(np.stack([Dx[1:-1, 0], Dx[1:-1, -1]]).T, dtype),
        Dy_bar=jnp.asarray(np.stack([Dy[1:-1, 0], Dy[1:-1, -1]]).T, dtype),
        DxDPx=jnp.asarray(DxDPx, dtype),
        DyDPy=jnp.asarray(DyDPy, dtype),
        DPx=jnp.asarray(DPx, dtype),
        DPy=jnp.asarray(DPy, dtype),
    )
    return u_ops, v_ops, consts, host


def _add_dense_pressure_eig(consts: dict, host: dict, dtype) -> None:
    """Full-operator pressure eigendecomposition (dense path only; the
    parity path eigendecomposes the half-size parity blocks instead)."""
    plamx, PP = cheb.eig_real(host["DxDPx"], "pressure-x")
    plamy, PQ = cheb.eig_real(host["DyDPy"], "pressure-y")
    consts.update(
        p_lamx=jnp.asarray(plamx, dtype),
        p_lamy=jnp.asarray(plamy, dtype),
        p_P=jnp.asarray(PP, dtype),
        p_Q=jnp.asarray(PQ, dtype),
        p_P_inv=jnp.asarray(np.linalg.inv(PP), dtype),
        p_Q_inv=jnp.asarray(np.linalg.inv(PQ), dtype),
    )


# interior size at/above which auto mode enables parity splitting — the
# same MXU-fatness crossover as the DST engine (fast_poisson.py:121-125)
_PARITY_MIN_INTERIOR = 192

_PARITY_EXPECTED = (  # (host key, expected reversal sign)
    ("Dx_rows", -1), ("Dy_rows", -1),
    ("Dx_sqr_rows", +1), ("Dy_sqr_rows", +1),
    ("DPx", -1), ("DPy", -1),
    ("DxDPx", +1), ("DyDPy", +1),
)


def _resolve_parity_split(cfg: ChorinSpectralConfig, u_ops, v_ops, host):
    """Decide whether this step runs the parity-split engine.

    Explicit True validates every per-step operator's reversal parity and
    raises naming the first violator (quirk matrices never qualify —
    ops/parity.py module docstring; per-side-asymmetric Robin/Neumann BC
    operators may not either). Auto (None) enables it silently when
    eligible: corrected mode, interior >= the MXU crossover, all
    operators parity-clean."""
    from ns_tpu.ops.parity import reversal_parity

    if cfg.parity_split is False:
        return False
    explicit = cfg.parity_split is True
    if cfg.quirk_compat:
        if explicit:
            raise ValueError(
                "parity_split=True needs quirk_compat=False: the "
                "reference's quirk matrices (M=N sin denominators, "
                "single-endpoint bar_c) are not reversal-symmetric")
        return False
    if not explicit and min(cfg.nx, cfg.ny) - 2 < _PARITY_MIN_INTERIOR:
        return False
    bad = [k for k, want in _PARITY_EXPECTED
           if reversal_parity(host[k]) != want]
    for label, ops in (("u", u_ops), ("v", v_ops)):
        if reversal_parity(ops._Mx_np) != +1:
            bad.append(f"helmholtz-x[{label}]")
        if reversal_parity(ops._My_np) != +1:
            bad.append(f"helmholtz-y[{label}]")
    if bad:
        if explicit:
            raise ValueError(
                f"parity_split=True: operators without the required "
                f"reversal parity: {bad} (asymmetric BC data can break "
                "the operator's reflection equivariance)")
        return False
    return True


def _helmholtz_solve(F, ops: _FieldOps, dt):
    """(2 - dt*Lap) u = F via eigen-diagonalization (ref :284-298)."""
    H_tilde = ops.P_inv @ F
    H_hat = H_tilde @ ops.Q_inv.T
    denom = 2.0 - dt * ops.lamx[:, None] - dt * ops.lamy[None, :]
    u_hat = H_hat / denom
    return ops.P @ (u_hat @ ops.Q.T)


def _boundary_rows(soln, ops: _FieldOps, corrected: bool = False):
    """Reconstruct edge rows/cols from the interior solve (ref :245-256).

    The reference's far-face formulas drop the BC-data term (its xN/yN are
    pure interior sums; fine for its zero far-face cavity values). The
    corrected mode restores the full 2x2-solve data terms on both faces —
    required for nonzero far-face Dirichlet values and for any
    Neumann/Robin data."""
    kx, ky, g = ops.kx, ops.ky, ops.g
    x0 = (jnp.sum(ops.b0_x[:, None] * soln, axis=0)
          + (kx["c0_minus"] * g["g_minus_x"] + kx["c0_plus"] * g["g_plus_x"])) / kx["e"]
    xN = jnp.sum(ops.bN_x[:, None] * soln, axis=0) / kx["e"]
    y0 = (jnp.sum(ops.b0_y[None, :] * soln, axis=1)
          + (ky["c0_minus"] * g["g_minus_y"] + ky["c0_plus"] * g["g_plus_y"])) / ky["e"]
    yN = jnp.sum(ops.bN_y[None, :] * soln, axis=1) / ky["e"]
    if corrected:
        xN = xN + (kx["cN_minus"] * g["g_minus_x"]
                   + kx["cN_plus"] * g["g_plus_x"]) / kx["e"]
        yN = yN + (ky["cN_minus"] * g["g_minus_y"]
                   + ky["cN_plus"] * g["g_plus_y"]) / ky["e"]
    return x0, xN, y0, yN


def _assemble(nx, ny, interior, edges, dtype):
    """Zeros + interior + 4 edges; corners stay zero (ref :320-334)."""
    x0, xN, y0, yN = edges
    out = jnp.zeros((nx, ny), dtype=dtype)
    out = out.at[1:-1, 1:-1].set(interior)
    out = out.at[0, 1:-1].set(x0)
    out = out.at[-1, 1:-1].set(xN)
    out = out.at[1:-1, 0].set(y0)
    out = out.at[1:-1, -1].set(yN)
    return out


def make_step(cfg: ChorinSpectralConfig, u_bc, v_bc, dtype=jnp.float64):
    u_ops, v_ops, C, host = _setup(cfg, u_bc, v_bc, dtype)
    dt, rho = cfg.dt, cfg.rho
    Nx, Ny = cfg.nx, cfg.ny

    # All-Dirichlet BCs give u and v identical BC-modified operators, so
    # both Helmholtz systems solve in ONE batched eigen transform (the
    # (n,n) @ (2,n,n) matmuls broadcast) — ~2x fewer MXU dispatches.
    same_ops = (np.array_equal(u_ops._Mx_np, v_ops._Mx_np)
                and np.array_equal(u_ops._My_np, v_ops._My_np))

    # corrected mode runs CN diffusion at the CONFIGURED viscosity:
    # (2 - nu*dt*Lap) u* = RHS (the reference never multiplies by nu,
    # ref :258-298 — quirk mode keeps dt alone for parity)
    dt_eff = dt if cfg.quirk_compat else cfg.nu * dt

    use_parity = _resolve_parity_split(cfg, u_ops, v_ops, host)

    if use_parity:
        # half-flop engine (ops/parity.py; cfg.parity_split docstring):
        # every per-step GEMM — derivative applications, Helmholtz eigen
        # transforms, Uzawa eigen transforms, projection — runs as two
        # half-size GEMMs via the operators' reversal parity
        from ns_tpu.ops.parity import (ParityEig, ParityEig2D,
                                       make_parity_apply)
        u_hx = ParityEig(u_ops._Mx_np, "helmholtz-x[u]", dtype)
        u_hy = ParityEig(u_ops._My_np, "helmholtz-y[u]", dtype)
        v_hx = u_hx if same_ops else ParityEig(v_ops._Mx_np,
                                               "helmholtz-x[v]", dtype)
        v_hy = u_hy if same_ops else ParityEig(v_ops._My_np,
                                               "helmholtz-y[v]", dtype)
        p_px = ParityEig(host["DxDPx"], "pressure-x", dtype)
        p_py = ParityEig(host["DyDPy"], "pressure-y", dtype)
        dx_l = make_parity_apply(host["Dx_rows"], dtype, "left")
        dy_r = make_parity_apply(host["Dy_rows"], dtype, "right")
        # no dx2/dy2 appliers: the corrected predictor folds CN diffusion
        # into the Helmholtz solve (predictor_corrected docstring)
        dpx_l = make_parity_apply(host["DPx"], dtype, "left")
        dpy_r = make_parity_apply(host["DPy"], dtype, "right")

        # eigen solves via ParityEig2D: reciprocal grids are setup-time
        # constants; the hot loop multiplies, never divides. Two GEMM
        # schedules for the same solve — 'composed' per-axis transforms
        # vs 'quadrant' per-quadrant chains — measured within noise of
        # each other (ParityEig2D.solve_composed docstring); composed is
        # the default (fastest at the 1024^2 north-star grid).
        form = cfg.parity_eig_form or "composed"
        if form not in ("quadrant", "composed"):
            raise ValueError(f"parity_eig_form must be quadrant|composed|"
                             f"None, got {form!r}")
        u_h2d = ParityEig2D(u_hx, u_hy)
        v_h2d = u_h2d if same_ops else ParityEig2D(v_hx, v_hy)
        p_2d = ParityEig2D(p_px, p_py)
        h_fn = lambda lx, ly: 2.0 - dt_eff * lx - dt_eff * ly
        u_recips = tuple(1.0 / d for d in u_h2d.denoms(h_fn))
        v_recips = (u_recips if same_ops else
                    tuple(1.0 / d for d in v_h2d.denoms(h_fn)))
        p_denoms = p_2d.denoms(lambda lx, ly: lx + ly)
        if cfg.deflate_pressure_nullspace:
            dmax = jnp.max(jnp.stack([jnp.max(jnp.abs(d))
                                      for d in p_denoms]))
            p_recips = tuple(
                jnp.where(jnp.abs(d) > 1e-8 * dmax,
                          1.0 / jnp.where(jnp.abs(d) > 1e-8 * dmax, d, 1.0),
                          0.0)
                for d in p_denoms)
        else:
            p_recips = tuple(1.0 / d for d in p_denoms)
        if form == "composed":
            u_recips = u_h2d.full_recip(u_recips)
            v_recips = (u_recips if same_ops
                        else v_h2d.full_recip(v_recips))
            p_recips = p_2d.full_recip(p_recips)
            u_solve = u_h2d.solve_composed
            v_solve = v_h2d.solve_composed
            p_solve = p_2d.solve_composed
        else:
            u_solve, v_solve, p_solve = (u_h2d.solve, v_h2d.solve,
                                         p_2d.solve)

        def _solve_uv(u_F, v_F):
            if same_ops:
                soln = u_solve(jnp.stack([u_F, v_F]), u_recips)
                return soln[0], soln[1]
            return u_solve(u_F, u_recips), v_solve(v_F, v_recips)

        def _psolve(H):
            return p_solve(H, p_recips)
    else:
        try:
            u_ops.build_dense_eig()
            v_ops.build_dense_eig()
            _add_dense_pressure_eig(C, host, dtype)
        except ValueError as e:
            if cfg.quirk_compat:
                # fail fast with guidance instead of the bare eig_real
                # guard: the quirk-mode (reference-defect) operators have a
                # materially complex spectrum at every even N (verified
                # 16..64; every odd N in 9..63 builds) — the reference's
                # own workload is odd (51, ref :584)
                raise ValueError(
                    f"quirk_compat=True cannot build a "
                    f"{cfg.nx}x{cfg.ny} grid: {e}. The reference's "
                    "defective operators (D@D.T second derivative, "
                    "M=N sin denominators) only have a real spectrum at "
                    "ODD grid sizes (the reference's own workload is "
                    "nx=ny=51, chorin_spectral/simulate.py:584); use an "
                    "odd nx/ny, or quirk_compat=False for the corrected "
                    "operators which build at any size") from e
            raise
        dx_l = lambda X: C["Dx_rows"] @ X
        dy_r = lambda X: X @ C["Dy_rows"].T
        dpx_l = lambda X: C["DPx"] @ X
        dpy_r = lambda X: X @ C["DPy"].T

        def _solve_uv(u_F, v_F):
            if same_ops:
                soln = _helmholtz_solve(jnp.stack([u_F, v_F]), u_ops,
                                        dt_eff)
                return soln[0], soln[1]
            return (_helmholtz_solve(u_F, u_ops, dt_eff),
                    _helmholtz_solve(v_F, v_ops, dt_eff))

        def _psolve(H):
            H_hat = (C["p_P_inv"] @ H) @ C["p_Q_inv"].T
            denom = C["p_lamx"][:, None] + C["p_lamy"][None, :]
            if cfg.deflate_pressure_nullspace:
                keep = jnp.abs(denom) > 1e-8 * jnp.max(jnp.abs(denom))
                Q_hat = jnp.where(keep,
                                  H_hat / jnp.where(keep, denom, 1.0), 0.0)
            else:
                Q_hat = H_hat / denom
            return C["p_P"] @ (Q_hat @ C["p_Q"].T)

    def predictor_ref(un, vn, un1, vn1):
        """AB advection + CN diffusion RHS, Helmholtz solve — exact reference
        algorithm (ref :232-337): all derivative products use interior-only
        operator blocks, so boundary values never enter the RHS."""
        _un, _un1 = un[1:-1, 1:-1], un1[1:-1, 1:-1]
        _vn, _vn1 = vn[1:-1, 1:-1], vn1[1:-1, 1:-1]
        Dx, Dy = C["Dx_int"], C["Dy_int"]
        Dx2, Dy2 = C["Dx_sqr_int"], C["Dy_sqr_int"]

        def F_of(h, h1):
            h_dx, h_dy = Dx @ h, h @ Dy.T
            h1_dx, h1_dy = Dx @ h1, h1 @ Dy.T
            h_ddx, h_ddy = Dx2 @ h, h @ Dy2.T
            return (2.0 * h
                    - 3.0 * dt * (_un * h_dx + _vn * h_dy)
                    + dt * (_un1 * h1_dx + _vn1 * h1_dy)
                    + dt * (h_ddx + h_ddy))

        u_F = F_of(_un, _un1)
        v_F = F_of(_vn, _vn1)
        u_soln, v_soln = _solve_uv(u_F, v_F)
        ui = _assemble(Nx, Ny, u_soln, _boundary_rows(u_soln, u_ops), dtype)
        vi = _assemble(Nx, Ny, v_soln, _boundary_rows(v_soln, v_ops), dtype)
        return ui, vi

    def predictor_corrected(un, vn, un1, vn1, cache=None):
        """Corrected-mode predictor: same AB/CN Helmholtz structure, but all
        spatial derivatives use the FULL interior operator rows (boundary
        columns included) and the known Dirichlet boundary values of u* are
        lifted into the RHS:

            (2 - dt*Lap_int) u*_int = F + dt * (D2x boundary cols + y terms)

        which is the standard collocation treatment the reference omits.

        The CN diffusion term never runs an explicit D^2 GEMM: with
        A = nu*dt*(Mx (+) My) the RHS satisfies 2h + A h = 4h - (2-A)h, so

            u* = (2-A)^{-1} (4h - adv + nu*dt*lift_total) - h

        and the Helmholtz eigen transforms (already paid) absorb the
        diffusion operator. What remains of Lap.h beyond A.h is the rank-1
        boundary algebra: Lap_rows.h_full = Mx.h_int (+) h_int.My^T plus
        outer products of the D^2 boundary columns with
        (actual boundary row - interior-dependent reconstruction part) —
        data terms for states on the BC manifold, plus an exact O(n^2)
        discrepancy correction for arbitrary states (e.g. raw ICs). Cuts
        4 of the ~28 per-step O(n^3) GEMMs (~14% of step flops; RESULTS.md
        "Parity-split Chebyshev engine").
        """
        _un, _vn = un[1:-1, 1:-1], vn[1:-1, 1:-1]
        _un1, _vn1 = un1[1:-1, 1:-1], vn1[1:-1, 1:-1]

        def F_of(h_full, hd, h1d, ops):
            h = h_full[1:-1, 1:-1]
            h_dx, h_dy = hd
            h1_dx, h1_dy = h1d
            # NOTE the nu factor: the reference stores self.nu but never
            # multiplies any diffusion term by it (ref :258-298 — its
            # momentum equation effectively runs at nu = 1 regardless of
            # config). Quirk mode replicates that (predictor_ref above);
            # corrected mode applies the configured viscosity.
            F = (4.0 * h
                 - 3.0 * dt * (_un * h_dx + _vn * h_dy)
                 + dt * (_un1 * h1_dx + _vn1 * h1_dy))
            # Boundary-column algebra of Lap.h plus the u* data lift, as
            # four rank-1 outer products. Each coefficient vector is
            #   (actual boundary values of h) - (b.h_int)/e + g_data
            # = (reconstruction discrepancy, zero on the BC manifold)
            #   + 2 x (data term: one from Lap.h, one lifting u*'s
            #     reconstructed boundary values out of the solved operator).
            g, kx, ky = ops.g, ops.kx, ops.ky
            gx0_v = (kx["c0_plus"] * g["g_plus_x"]
                     + kx["c0_minus"] * g["g_minus_x"]) / kx["e"]
            gxN_v = (kx["cN_plus"] * g["g_plus_x"]
                     + kx["cN_minus"] * g["g_minus_x"]) / kx["e"]
            gy0_v = (ky["c0_plus"] * g["g_plus_y"]
                     + ky["c0_minus"] * g["g_minus_y"]) / ky["e"]
            gyN_v = (ky["cN_plus"] * g["g_plus_y"]
                     + ky["cN_minus"] * g["g_minus_y"]) / ky["e"]
            cx0 = h_full[0, 1:-1] - (ops.b0_x @ h) / kx["e"] + gx0_v
            cxN = h_full[-1, 1:-1] - (ops.bN_x @ h) / kx["e"] + gxN_v
            cy0 = h_full[1:-1, 0] - (h @ ops.b0_y) / ky["e"] + gy0_v
            cyN = h_full[1:-1, -1] - (h @ ops.bN_y) / ky["e"] + gyN_v
            lift = (C["Dx_sqr_rows"][:, 0][:, None] * cx0[None, :]
                    + C["Dx_sqr_rows"][:, -1][:, None] * cxN[None, :]
                    + cy0[:, None] * C["Dy_sqr_rows"][:, 0][None, :]
                    + cyN[:, None] * C["Dy_sqr_rows"][:, -1][None, :])
            return F + cfg.nu * dt * lift, (h_dx, h_dy)

        # AB derivative reuse: this step's (h_dx, h_dy) of u^n IS next
        # step's (h1_dx, h1_dy) — the identical GEMM on the identical
        # operand, so a caller threading the returned cache through a
        # rollout (cached_step below) drops 4 of the remaining per-step
        # O(n^3) GEMMs bitwise-for-free. cache layout:
        # (u_dx, u_dy, v_dx, v_dy) of the state's u_prev/v_prev interiors.
        # The (u, v) advection derivatives run as ONE batch-2 apply per
        # side (matrix @ stacked operands — fewer, MXU-fatter
        # dispatches). The history pair gets its own batch-2 apply
        # rather than widening to batch-4: XLA's batched matmul rounds
        # differently at different batch counts, and the cached path's
        # bitwise-equality contract (cached_step docstring, locked by
        # test_cached_step_rollout_matches_plain_step) requires the
        # (u, v) GEMM to have the identical shape in both paths.
        dxs = dx_l(jnp.stack([un[:, 1:-1], vn[:, 1:-1]]))
        dys = dy_r(jnp.stack([un[1:-1, :], vn[1:-1, :]]))
        if cache is None:
            dxs1 = dx_l(jnp.stack([un1[:, 1:-1], vn1[:, 1:-1]]))
            dys1 = dy_r(jnp.stack([un1[1:-1, :], vn1[1:-1, :]]))
            u1d, v1d = (dxs1[0], dys1[0]), (dxs1[1], dys1[1])
        else:
            u1d, v1d = (cache[0], cache[1]), (cache[2], cache[3])
        u_F, u_d = F_of(un, (dxs[0], dys[0]), u1d, u_ops)
        v_F, v_d = F_of(vn, (dxs[1], dys[1]), v1d, v_ops)
        u_soln, v_soln = _solve_uv(u_F, v_F)
        u_soln = u_soln - un[1:-1, 1:-1]
        v_soln = v_soln - vn[1:-1, 1:-1]
        ui = _assemble(Nx, Ny, u_soln,
                       _boundary_rows(u_soln, u_ops, corrected=True), dtype)
        vi = _assemble(Nx, Ny, v_soln,
                       _boundary_rows(v_soln, v_ops, corrected=True), dtype)
        return ui, vi, u_d + v_d

    if cfg.quirk_compat:
        predictor = lambda un, vn, un1, vn1, cache=None: (
            *predictor_ref(un, vn, un1, vn1), None)
    else:
        predictor = predictor_corrected

    def correction(ui, vi, p):
        """Uzawa P_N - P_{N-2} pressure solve + projection (ref :339-383)."""
        if cfg.quirk_compat:
            # reference form: interior divergence + the S boundary-flux term
            # exactly as written (ref :352-367)
            gu, gv = u_ops.g, v_ops.g
            u_tau = jnp.stack([jnp.full((Ny - 2,), gu["g_minus_x"], dtype),
                               jnp.full((Ny - 2,), gu["g_plus_x"], dtype)])
            v_tau = jnp.stack([jnp.full((Nx - 2,), gv["g_minus_y"], dtype),
                               jnp.full((Nx - 2,), gv["g_plus_y"], dtype)]).T
            S = -(C["Dx_bar"] @ u_tau + v_tau @ C["Dy_bar"].T)
            H = -rho / dt * (S - C["Dx_int"] @ ui[1:-1, 1:-1]
                             - vi[1:-1, 1:-1] @ C["Dy_int"].T)
        else:
            # corrected form: H = (rho/dt) * div(u*) on interior rows with
            # the boundary columns (lid flux) included directly
            H = rho / dt * (dx_l(ui[:, 1:-1]) + dy_r(vi[1:-1, :]))
        Q = _psolve(H)

        if cfg.quirk_compat:
            # the reference subtracts (Dx @ DPx) @ Q — a second-derivative
            # product, not a gradient (ref :379-380). Replicated for parity;
            # this is why its projection never annihilates the divergence.
            u_next = ui.at[1:-1, 1:-1].add(-(C["DxDPx"] @ Q) * dt / rho)
            v_next = vi.at[1:-1, 1:-1].add(-(Q @ C["DyDPy"].T) * dt / rho)
        else:
            # corrected projection: u <- u* - (dt/rho) * grad_{P_{N-2}} Q, so
            # Dx (DPx Q) + (Q DPy^T) Dy^T equals the Uzawa LHS and the
            # interior divergence of u^{n+1} vanishes by construction.
            u_int = ui[1:-1, 1:-1] - dpx_l(Q) * dt / rho
            v_int = vi[1:-1, 1:-1] - dpy_r(Q) * dt / rho
            # the boundary values are functions of the interior (via the
            # Robin reconstruction), so re-derive them from the projected
            # interior; for pure Dirichlet this reproduces the fixed values
            u_next = _assemble(Nx, Ny, u_int,
                               _boundary_rows(u_int, u_ops, corrected=True),
                               ui.dtype)
            v_next = _assemble(Nx, Ny, v_int,
                               _boundary_rows(v_int, v_ops, corrected=True),
                               vi.dtype)
            p_next = p.at[1:-1, 1:-1].set(Q)
            return u_next, v_next, p_next
        p_next = p.at[1:-1, 1:-1].set(Q)
        return u_next, v_next, p_next

    def cached_step(state: FlowState, cache):
        """step plus the AB-derivative carry (predictor_corrected notes):
        cache is (u_dx, u_dy, v_dx, v_dy) of state.u_prev/v_prev — thread
        it through a rollout to skip recomputing them (bitwise-identical
        values; ~14% of the corrected step's GEMMs). Pass None to
        recompute (also: quirk mode always returns None)."""
        # cfg.matmul_precision is applied HERE, not in the wrapper, so
        # every consumer of make_step (benchmarks, serving, CLI) honors
        # it — the context must be live while the body TRACES
        with jax.default_matmul_precision(cfg.matmul_precision):
            ui, vi, new_cache = predictor(state.u, state.v, state.u_prev,
                                          state.v_prev, cache)
            u_next, v_next, p_next = correction(ui, vi, state.p)
        return FlowState(u=u_next, v=v_next, p=p_next,
                         u_prev=state.u, v_prev=state.v), new_cache

    def seed(state: FlowState):
        """Initial derivative cache for cached_step (None in quirk mode)."""
        if cfg.quirk_compat:
            return None
        with jax.default_matmul_precision(cfg.matmul_precision):
            dxs = dx_l(jnp.stack([state.u_prev[:, 1:-1],
                                  state.v_prev[:, 1:-1]]))
            dys = dy_r(jnp.stack([state.u_prev[1:-1, :],
                                  state.v_prev[1:-1, :]]))
            return (dxs[0], dys[0], dxs[1], dys[1])

    def step(state: FlowState) -> FlowState:
        return cached_step(state, None)[0]

    step.cached = cached_step
    step.seed = seed
    return step


def init_state(cfg, u_ic, v_ic, p_ic, u_bc, v_bc, dtype=jnp.float64) -> FlowState:
    """Apply velocity BCs to ICs once (ref :535-545) and seed history."""
    from ns_tpu.core.bc import apply_bcs
    u = apply_bcs(jnp.asarray(u_ic, dtype=dtype), u_bc)
    v = apply_bcs(jnp.asarray(v_ic, dtype=dtype), v_bc)
    p = jnp.asarray(p_ic, dtype=dtype)
    return FlowState(u=u, v=v, p=p).with_history()


def simulate(cfg, state0: FlowState, step_fn):
    cached = getattr(step_fn, "cached", None)
    if cached is not None:
        # thread the AB-derivative cache through the rollout (cached_step
        # docstring: values are bitwise-identical to recomputation)
        def body(carry, _):
            state, cache = cached(*carry)
            return (state, cache), (state.u, state.v, state.p)
        carry0 = (state0, step_fn.seed(state0))
    else:
        def body(state, _):
            state = step_fn(state)
            return state, (state.u, state.v, state.p)
        carry0 = state0

    _, seqs = jax.lax.scan(body, carry0, None, length=cfg.nt)
    return seqs


class NavierStokesSystem:
    """Reference-API wrapper (ref chorin_spectral/simulate.py:10-52; note the
    reference takes no pressure BCs — pressure needs none in P_N - P_{N-2})."""

    def __init__(self, u_ic, v_ic, p_ic, u_bc, v_bc, nt=200, nit=50,
                 nx=50, ny=50, dt=0.001, rho=1, nu=1, beta=1.25,
                 dtype=jnp.float64, quirk_compat=True,
                 deflate_pressure_nullspace=None,
                 matmul_precision="highest", parity_split=None):
        if deflate_pressure_nullspace is None:
            deflate_pressure_nullspace = not quirk_compat
        self.cfg = ChorinSpectralConfig(
            nt=nt, nit=nit, nx=nx, ny=ny, dt=dt, rho=rho, nu=nu, beta=beta,
            quirk_compat=quirk_compat,
            deflate_pressure_nullspace=deflate_pressure_nullspace,
            matmul_precision=matmul_precision, parity_split=parity_split)
        self.u_bc, self.v_bc = list(u_bc), list(v_bc)
        self.state0 = init_state(self.cfg, u_ic, v_ic, p_ic,
                                 self.u_bc, self.v_bc, dtype=dtype)
        # precision is baked into make_step's body (cfg.matmul_precision)
        step = make_step(self.cfg, self.u_bc, self.v_bc, dtype=dtype)
        self._step = jax.jit(step)
        self._simulate = jax.jit(partial(simulate, self.cfg, step_fn=step))

    def step(self, state: FlowState) -> FlowState:
        return self._step(state)

    def simulate(self):
        return self._simulate(self.state0)
