"""chorin_fd with the multigrid pressure mode vs the SOR mode."""

import pytest
import jax.numpy as jnp
import numpy as np

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.solvers import chorin_fd


def cavity_bcs(dx, dy):
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


@pytest.mark.slow
def test_multigrid_pressure_matches_sor():
    nx = ny = 65  # 2^6 + 1
    dx = dy = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dy)
    z = np.zeros((nx, ny))
    kwargs = dict(nt=8, nit=2000, nx=nx, ny=ny, dt=5e-4, rho=1, nu=0.1,
                  beta=1.25, method="semi_implicit", dtype=jnp.float64)
    # tight SOR so both solvers are near the true solution
    s_sor = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, pressure_mode="redblack", **kwargs)
    s_mg = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, pressure_mode="multigrid",
        mg_cycles=10, **kwargs)
    u1, v1, p1 = s_sor.simulate()
    u2, v2, p2 = s_mg.simulate()
    assert np.isfinite(np.asarray(u2)).all()
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=2e-2)


@pytest.mark.slow
def test_multigrid_pressure_at_reference_51sq():
    """pressure_mode='multigrid' now runs the reference's own 51^2 default
    config (chorin_fd/simulate.py:278-287) via the masked padded grid and
    matches the SOR solution."""
    nx = ny = 51
    dx = dy = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dy)
    z = np.zeros((nx, ny))
    kwargs = dict(nt=8, nit=2000, nx=nx, ny=ny, dt=1e-3, rho=1, nu=0.1,
                  beta=1.25, method="semi_implicit", dtype=jnp.float64)
    s_sor = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, pressure_mode="redblack", **kwargs)
    s_mg = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, pressure_mode="multigrid",
        mg_cycles=12, **kwargs)
    u1, v1, p1 = s_sor.simulate()
    u2, v2, p2 = s_mg.simulate()
    assert np.isfinite(np.asarray(u2)).all()
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(p2), np.asarray(p1), atol=2e-2)
