"""Matmul-DST direct Poisson solver tests (ops/fast_poisson.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.ops.fast_poisson import make_dst_poisson, poisson_dst


def five_point(p, dx, dy):
    """Interior 5-point laplacian of p."""
    return ((p[2:, 1:-1] - 2 * p[1:-1, 1:-1] + p[:-2, 1:-1]) / dx**2
            + (p[1:-1, 2:] - 2 * p[1:-1, 1:-1] + p[1:-1, :-2]) / dy**2)


@pytest.mark.parametrize("nx,ny,dx,dy", [
    (17, 17, 0.1, 0.1),
    (23, 41, 0.05, 0.125),   # rectangular grid, anisotropic spacing
    (4, 3, 1.0, 2.0),        # smallest nontrivial interior
])
def test_dst_exact_inverse_of_discrete_laplacian(nx, ny, dx, dy):
    """The direct solve inverts the 5-point operator to machine precision,
    including inhomogeneous fixed-boundary lifting."""
    rng = np.random.default_rng(0)
    p_true = rng.normal(size=(nx, ny))           # arbitrary incl. boundary
    f = five_point(p_true, dx, dy)
    f_full = np.zeros((nx, ny))
    f_full[1:-1, 1:-1] = f
    # start from p with the same boundary ring but garbage interior
    p0 = p_true.copy()
    p0[1:-1, 1:-1] = rng.normal(size=(nx - 2, ny - 2))
    solve = make_dst_poisson(nx, ny, dx, dy, dtype=jnp.float64)
    p = np.asarray(solve(jnp.asarray(p0), jnp.asarray(f_full)))
    np.testing.assert_allclose(p, p_true, atol=1e-10)


def test_dst_matches_sor_fixed_point():
    """DST's answer is the fixed point the chorin_fd SOR iterates toward
    (same system: laplace(p) = rhs_c/(dx^2 dy^2), boundary fixed)."""
    from ns_tpu.ops.poisson import sor_redblack

    nx = ny = 33
    dx = dy = 2.0 / (nx - 1)
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(nx, ny))
    rhs_c = np.zeros((nx, ny))
    rhs_c[1:-1, 1:-1] = rng.normal(size=(nx - 2, ny - 2)) * dx**2 * dy**2
    p_sor = np.asarray(sor_redblack(jnp.asarray(p0), jnp.asarray(rhs_c),
                                    dx, dy, 1.5, 1e-13, 20000))
    f = rhs_c / (dx**2 * dy**2)
    p_dst = np.asarray(poisson_dst(jnp.asarray(p0), jnp.asarray(f), dx, dy))
    np.testing.assert_allclose(p_dst, p_sor, atol=1e-8)


def test_dst_preserves_boundary_ring():
    nx, ny = 19, 27
    rng = np.random.default_rng(2)
    p0 = jnp.asarray(rng.normal(size=(nx, ny)))
    f = jnp.asarray(rng.normal(size=(nx, ny)))
    p = make_dst_poisson(nx, ny, 0.3, 0.2, dtype=jnp.float64)(p0, f)
    np.testing.assert_array_equal(np.asarray(p)[0, :], np.asarray(p0)[0, :])
    np.testing.assert_array_equal(np.asarray(p)[-1, :], np.asarray(p0)[-1, :])
    np.testing.assert_array_equal(np.asarray(p)[:, 0], np.asarray(p0)[:, 0])
    np.testing.assert_array_equal(np.asarray(p)[:, -1], np.asarray(p0)[:, -1])


def test_chorin_fd_dst_mode_matches_converged_sor():
    """Full chorin_fd rollout with pressure_mode='dst' tracks the
    tightly-converged SOR rollout (dst IS the SOR fixed point, so the
    fields differ only by SOR's leftover tolerance)."""
    from ns_tpu.solvers.chorin_fd import (ChorinFDConfig, init_state,
                                          simulate)
    from tests.test_chorin_fd import cavity_bcs

    nx = ny = 33
    dx = dy = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dy)
    z = np.zeros((nx, ny))

    def roll(**kw):
        cfg = ChorinFDConfig(nx=nx, ny=ny, nt=20, dt=1e-3, nu=0.1,
                             beta=1.25, method="semi_implicit", **kw)
        s0 = init_state(cfg, z, z, z, u_bc, v_bc, p_bc, dtype=jnp.float64)
        return map(np.asarray, simulate(cfg, s0, u_bc, v_bc, p_bc,
                                        dtype=jnp.float64))

    u1, v1, p1 = roll(pressure_mode="redblack", sor_tol=1e-12, nit=20000)
    u2, v2, p2 = roll(pressure_mode="dst")
    np.testing.assert_allclose(u2, u1, atol=1e-6)
    np.testing.assert_allclose(v2, v1, atol=1e-6)
    np.testing.assert_allclose(p2, p1, atol=1e-5)


# --- parity-split (half-flop) transform engine ------------------------------


@pytest.mark.parametrize("nx,ny", [
    (18, 18),   # even interior (m=16), square
    (19, 19),   # odd interior (m=17): middle row/col self-pairing
    (18, 23),   # even x odd, rectangular
    (4, 3),     # smallest nontrivial interior (m=2, k=1)
])
def test_parity_split_matches_full_gemm_poisson(nx, ny):
    """parity_split=True is the same linear map as the full-GEMM path
    (exact up to fp reassociation; f64 makes that ~1e-12)."""
    rng = np.random.default_rng(11)
    p0 = jnp.asarray(rng.normal(size=(nx, ny)))
    f = jnp.asarray(rng.normal(size=(nx, ny)))
    dx, dy = 0.07, 0.11
    full = make_dst_poisson(nx, ny, dx, dy, dtype=jnp.float64,
                            parity_split=False)(p0, f)
    half = make_dst_poisson(nx, ny, dx, dy, dtype=jnp.float64,
                            parity_split=True)(p0, f)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full),
                               atol=1e-11)


@pytest.mark.parametrize("nx,ny", [(18, 18), (19, 19), (20, 15)])
def test_parity_split_matches_full_gemm_helmholtz(nx, ny):
    from ns_tpu.ops.fast_poisson import make_dst_helmholtz
    rng = np.random.default_rng(12)
    ring = jnp.asarray(rng.normal(size=(nx, ny)))
    rhs = jnp.asarray(rng.normal(size=(nx - 2, ny - 2)))
    c = 0.021
    full = make_dst_helmholtz(nx, ny, 0.08, 0.13, c, dtype=jnp.float64,
                              parity_split=False)(ring, rhs)
    half = make_dst_helmholtz(nx, ny, 0.08, 0.13, c, dtype=jnp.float64,
                              parity_split=True)(ring, rhs)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full),
                               atol=1e-11)


def test_parity_split_exact_inverse_and_jit():
    """Forced parity path still inverts the 5-point operator to machine
    precision, under jit, odd interior."""
    import jax
    nx, ny, dx, dy = 21, 21, 0.1, 0.1
    rng = np.random.default_rng(13)
    p_true = rng.normal(size=(nx, ny))
    f_full = np.zeros((nx, ny))
    f_full[1:-1, 1:-1] = five_point(p_true, dx, dy)
    p0 = p_true.copy()
    p0[1:-1, 1:-1] = 0.0
    solve = jax.jit(make_dst_poisson(nx, ny, dx, dy, dtype=jnp.float64,
                                     parity_split=True))
    p = np.asarray(solve(jnp.asarray(p0), jnp.asarray(f_full)))
    np.testing.assert_allclose(p, p_true, atol=1e-10)


def test_parity_auto_threshold():
    """auto = on iff min interior dim >= _PARITY_MIN_DIM."""
    from ns_tpu.ops.fast_poisson import _PARITY_MIN_DIM, _resolve_parity
    assert not _resolve_parity(None, _PARITY_MIN_DIM - 1, _PARITY_MIN_DIM)
    assert _resolve_parity(None, _PARITY_MIN_DIM, _PARITY_MIN_DIM)
    assert _resolve_parity(True, 4, 4)
    assert not _resolve_parity(False, 4096, 4096)


# --- helmholtz (unsplit CN predictor) --------------------------------------


def test_dst_helmholtz_exact_inverse():
    """(I - c*lap) solve inverts the operator to machine precision,
    including inhomogeneous fixed-ring lifting and nx != ny."""
    from ns_tpu.ops.fast_poisson import make_dst_helmholtz

    nx, ny, dx, dy, c = 21, 35, 0.07, 0.11, 0.013
    rng = np.random.default_rng(3)
    w_true = rng.normal(size=(nx, ny))
    lap = five_point(w_true, dx, dy)
    rhs = w_true[1:-1, 1:-1] - c * lap
    ring = w_true.copy()
    ring[1:-1, 1:-1] = rng.normal(size=(nx - 2, ny - 2))
    solve = make_dst_helmholtz(nx, ny, dx, dy, c, dtype=jnp.float64)
    w = np.asarray(solve(jnp.asarray(ring), jnp.asarray(rhs)))
    np.testing.assert_allclose(w, w_true, atol=1e-11)


def test_helmholtz_predictor_cn_diffusion_factor():
    """Pure-diffusion limit: a discrete sine mode decays by the exact
    Crank-Nicolson factor (1 + a*lam)/(1 - a*lam) per step (amplitude
    made tiny so quadratic advection is negligible)."""
    from ns_tpu.solvers.chorin_fd import (ChorinFDConfig,
                                          _helmholtz_predictor)
    from ns_tpu.ops.fast_poisson import make_dst_helmholtz

    nx = ny = 33
    kx = ky = 2
    cfg = ChorinFDConfig(nx=nx, ny=ny, dt=2e-3, nu=0.5, method="helmholtz")
    dx = cfg.dx
    a = cfg.dt * cfg.nu / 2.0
    i = np.arange(nx)
    mode = (np.sin(np.pi * kx * i / (nx - 1))[:, None]
            * np.sin(np.pi * ky * i / (nx - 1))[None, :])
    eps = 1e-7
    u = jnp.asarray(eps * mode)
    v = jnp.zeros_like(u)
    hsolve = make_dst_helmholtz(nx, ny, dx, dx, a, dtype=jnp.float64)
    ui, _ = _helmholtz_predictor(cfg, hsolve, u, v, u, v)

    lam = -(4 / dx**2) * (np.sin(np.pi * kx / (2 * (nx - 1)))**2
                          + np.sin(np.pi * ky / (2 * (nx - 1)))**2)
    factor = (1 + a * lam) / (1 - a * lam)
    np.testing.assert_allclose(np.asarray(ui), eps * factor * mode,
                               atol=1e-12)


def test_helmholtz_predictor_advection_sign_physical():
    """method='helmholtz' uses the physical -dt*u.grad(u) (the defect the
    reference's semi-implicit path flips, PARITY.md)."""
    from ns_tpu.solvers.chorin_fd import (ChorinFDConfig,
                                          _helmholtz_predictor)
    from ns_tpu.ops.fast_poisson import make_dst_helmholtz

    nx = ny = 41
    cfg = ChorinFDConfig(nx=nx, ny=ny, dt=1e-3, nu=1e-6, method="helmholtz")
    x = np.linspace(-1, 1, nx)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = 0.5 * np.sin(np.pi * X) * np.cos(np.pi * Y) + 1.0
    v = 0.3 * np.cos(np.pi * X) * np.sin(np.pi * Y)
    hsolve = make_dst_helmholtz(nx, ny, cfg.dx, cfg.dy, cfg.dt * cfg.nu / 2,
                                dtype=jnp.float64)
    ui, _ = _helmholtz_predictor(cfg, hsolve, jnp.asarray(u), jnp.asarray(v),
                                 jnp.asarray(u), jnp.asarray(v))
    dx = cfg.dx
    dudx = (u[2:, 1:-1] - u[:-2, 1:-1]) / (2 * dx)
    dudy = (u[1:-1, 2:] - u[1:-1, :-2]) / (2 * dx)
    adv = u[1:-1, 1:-1] * dudx + v[1:-1, 1:-1] * dudy
    got = np.asarray(ui)[1:-1, 1:-1]
    assert np.abs(got - (u[1:-1, 1:-1] - cfg.dt * adv)).max() < 1e-5


def test_helmholtz_cavity_tracks_corrected_semi_implicit():
    """Full cavity rollout: the unsplit CN predictor stays close to the
    corrected ADI scheme (they differ only by the O(dt^2) splitting term)
    and both are stable; rectangular grid exercises the general path."""
    from ns_tpu.solvers.chorin_fd import (ChorinFDConfig, init_state,
                                          simulate)
    from tests.test_chorin_fd import cavity_bcs

    nx, ny = 33, 25
    dx, dy = 2.0 / (nx - 1), 2.0 / (ny - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dy)
    z = np.zeros((nx, ny))

    def roll(method):
        cfg = ChorinFDConfig(nx=nx, ny=ny, nt=40, nit=2000, dt=5e-4, nu=0.1,
                             beta=1.25, method=method, quirk_compat=False,
                             pressure_mode="dst")
        s0 = init_state(cfg, z, z, z, u_bc, v_bc, p_bc, dtype=jnp.float64)
        return map(np.asarray, simulate(cfg, s0, u_bc, v_bc, p_bc,
                                        dtype=jnp.float64))

    u_h, v_h, p_h = roll("helmholtz")
    u_s, v_s, p_s = roll("semi_implicit")
    assert np.isfinite(u_h).all() and np.isfinite(v_h).all()
    assert np.abs(u_h - u_s).max() < 2e-3
    assert np.abs(v_h - v_s).max() < 2e-3


# --- mixed-BC exact solve (direct_fd corrected pressure) --------------------


def _cavity_p_bcs(dx, dy, g=0.3, c=0.7):
    """Reference-style pressure BCs with nonzero data to exercise lifts."""
    from ns_tpu.core.bc import dirichlet, neumann
    return [neumann(g, "left", dx, dy), neumann(-g, "right", dx, dy),
            neumann(2 * g, "bottom", dx, dy), dirichlet(c, "top")]


def test_mixed_poisson_is_jacobi_fixed_point():
    """solve(b) is left EXACTLY invariant by one (Jacobi sweep + apply_bcs)
    iteration — the defining property of the reference direct_fd pressure
    fixed point (ref :68-88), including inhomogeneous Neumann/Dirichlet
    lifts and the one-sided edge relations."""
    from ns_tpu.core.bc import apply_bcs
    from ns_tpu.ops.fast_poisson import make_mixed_poisson
    from ns_tpu.ops.poisson import jacobi

    nx, ny = 21, 17
    dx, dy = 2.0 / (ny - 1), 2.0 / (nx - 1)  # axis0=y spacing=dy, axis1=x
    p_bc = _cavity_p_bcs(dx, dy)
    rng = np.random.default_rng(5)
    b = jnp.asarray(rng.normal(size=(nx, ny)))
    solve = make_mixed_poisson(nx, ny, dy, dx, p_bc)
    p = solve(b)
    p_after = jacobi(p, b, dx, dy, 1, bc_fn=lambda q: apply_bcs(q, p_bc))
    np.testing.assert_allclose(np.asarray(p_after), np.asarray(p),
                               atol=1e-10)


def test_mixed_poisson_matches_converged_jacobi():
    from ns_tpu.core.bc import apply_bcs
    from ns_tpu.ops.fast_poisson import make_mixed_poisson
    from ns_tpu.ops.poisson import jacobi

    nx = ny = 33
    dx = dy = 2.0 / (nx - 1)
    p_bc = _cavity_p_bcs(dx, dy)
    rng = np.random.default_rng(6)
    b = jnp.asarray(rng.normal(size=(nx, ny)))
    p_exact = make_mixed_poisson(nx, ny, dy, dx, p_bc)(b)
    p_jac = jacobi(jnp.zeros((nx, ny), jnp.float64), b, dx, dy, 20000,
                   bc_fn=lambda q: apply_bcs(q, p_bc))
    # Jacobi's slowest mode here (three Neumann sides -> a near-null
    # eigenpair) contracts so slowly that 20k sweeps still carry ~3e-6
    # error; the machine-precision check is the sweep-invariance test
    # above. This one pins agreement at Jacobi's practical accuracy.
    np.testing.assert_allclose(np.asarray(p_exact), np.asarray(p_jac),
                               atol=1e-5)


def test_mixed_poisson_all_neumann_deflated():
    """All-Neumann (singular) problems: the nullspace pair is deflated;
    for compatible b the result is still an exact fixed point."""
    from ns_tpu.core.bc import apply_bcs, neumann
    from ns_tpu.ops.fast_poisson import make_mixed_poisson
    from ns_tpu.ops.poisson import jacobi

    nx = ny = 17
    dx = dy = 2.0 / (nx - 1)
    p_bc = [neumann(0.0, s, dx, dy) for s in ("left", "right",
                                              "bottom", "top")]
    rng = np.random.default_rng(7)
    b_int = rng.normal(size=(nx - 2, ny - 2))
    b_int -= b_int.mean()  # compatible RHS (zero nullspace component)
    b = jnp.zeros((nx, ny), jnp.float64).at[1:-1, 1:-1].set(b_int)
    p = make_mixed_poisson(nx, ny, dy, dx, p_bc)(b)
    assert np.isfinite(np.asarray(p)).all()
    p_after = jacobi(p, b, dx, dy, 1, bc_fn=lambda q: apply_bcs(q, p_bc))
    np.testing.assert_allclose(np.asarray(p_after), np.asarray(p),
                               atol=1e-10)


def test_mixed_poisson_requires_bc_per_side():
    from ns_tpu.core.bc import dirichlet
    from ns_tpu.ops.fast_poisson import make_mixed_poisson
    with pytest.raises(ValueError, match="missing"):
        make_mixed_poisson(9, 9, 0.1, 0.1, [dirichlet(0, "top")])


@pytest.mark.slow
def test_direct_fd_exact_pressure_mode_tracks_converged_jacobi():
    """Full direct_fd rollout with pressure_mode='exact' tracks a
    rollout whose Jacobi solve is run to tight convergence (nit=20000);
    the reference's own nit=50 is far from this fixed point."""
    from ns_tpu.core.bc import dirichlet, neumann
    from ns_tpu.solvers.direct_fd import (DirectFDConfig, make_step)
    from ns_tpu.core.state import FlowState

    nx = ny = 33
    dx = dy = 2.0 / (nx - 1)
    u_bc = [dirichlet(0, "left"), dirichlet(0, "right"),
            dirichlet(1, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "bottom", "top")]
    p_bc = [neumann(0, "left", dx, dy), neumann(0, "right", dx, dy),
            neumann(0, "bottom", dx, dy), dirichlet(0, "top")]

    def roll(**kw):
        cfg = DirectFDConfig(nt=10, nx=nx, ny=ny, dt=1e-3, nu=0.1, **kw)
        step = make_step(cfg, u_bc, v_bc, p_bc)
        z = jnp.zeros((nx, ny), jnp.float64)
        s = FlowState(u=z, v=z, p=z)
        for _ in range(cfg.nt):
            s = step(s)
        return np.asarray(s.u), np.asarray(s.v), np.asarray(s.p)

    u_e, v_e, p_e = roll(pressure_mode="exact")
    u_j, v_j, p_j = roll(pressure_mode="jacobi", nit=20000)
    assert np.isfinite(u_e).all()
    np.testing.assert_allclose(u_e, u_j, atol=1e-7)
    np.testing.assert_allclose(v_e, v_j, atol=1e-7)
    np.testing.assert_allclose(p_e, p_j, atol=1e-6)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_mixed_poisson_random_bc_combinations_fixed_point(seed):
    """Property test: for random per-side BC kinds/values/steps and random
    rectangular grids, solve(b) is exactly invariant under one
    (Jacobi sweep + apply_bcs) iteration."""
    from ns_tpu.core.bc import BC, apply_bcs
    from ns_tpu.ops.fast_poisson import make_mixed_poisson
    from ns_tpu.ops.poisson import jacobi

    rng = np.random.default_rng(seed)
    nx = int(rng.integers(8, 30))
    ny = int(rng.integers(8, 30))
    dx = float(rng.uniform(0.05, 0.5))
    dy = float(rng.uniform(0.05, 0.5))
    sides = ["left", "right", "bottom", "top"]
    kinds = [str(rng.choice(["dirichlet", "neumann"])) for _ in sides]
    if all(k == "neumann" for k in kinds):
        kinds[rng.integers(0, 4)] = "dirichlet"  # keep nonsingular
    p_bc = [BC(k, float(rng.normal()), s, dx=dx, dy=dy)
            for k, s in zip(kinds, sides)]
    b = jnp.asarray(rng.normal(size=(nx, ny)))

    # jacobi's axis convention: axis0 spacing h0, axis1 spacing h1 — the
    # sweep divides axis1 diffs by its `dx` arg and axis0 by `dy`
    p = make_mixed_poisson(nx, ny, dy, dx, p_bc)(b)
    p_after = jacobi(p, b, dx, dy, 1, bc_fn=lambda q: apply_bcs(q, p_bc))
    np.testing.assert_allclose(np.asarray(p_after), np.asarray(p),
                               atol=1e-9)
