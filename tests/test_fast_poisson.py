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
