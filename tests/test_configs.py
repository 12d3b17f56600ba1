"""Smoke tests for the BASELINE.json target configs (scaled-down horizons):

  - direct_fd: lid-driven cavity 64x64, Re=100
  - chorin_fd: lid-driven cavity 128x128, Re=400
  - CG Poisson fallback solver correctness
"""

import pytest
import jax.numpy as jnp
import numpy as np

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.ops.poisson import cg_poisson
from ns_tpu.solvers import chorin_fd, direct_fd


def cavity_bcs(dx, dy):
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


def test_direct_fd_64_re100():
    # Re = U*L/nu = 1*2/0.02 = 100
    nx = 64
    u_bc, v_bc, p_bc = cavity_bcs(2 / (nx - 1), 2 / (nx - 1))
    z = np.zeros((nx, nx))
    sys_ = direct_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, nt=30, nit=50, nx=nx, ny=nx,
        dt=5e-4, rho=1, nu=0.02, dtype=jnp.float32)
    u, v, p = sys_.simulate()
    assert np.isfinite(np.asarray(u)).all()
    assert np.abs(np.asarray(u)).max() <= 1.0 + 1e-5


@pytest.mark.slow
def test_chorin_fd_128_re400():
    # Re = 1*2/0.005 = 400
    nx = 128
    u_bc, v_bc, p_bc = cavity_bcs(2 / (nx - 1), 2 / (nx - 1))
    z = np.zeros((nx, nx))
    sys_ = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, nt=20, nit=200, nx=nx, ny=nx,
        dt=5e-4, rho=1, nu=0.005, beta=1.25, method="semi_implicit",
        dtype=jnp.float32)
    u, v, p = sys_.simulate()
    assert np.isfinite(np.asarray(u)).all()
    assert np.abs(np.asarray(u[-1])).max() <= 2.0


def test_cg_poisson_solves_dirichlet_frame():
    """CG fallback: solve Lap(p) = rhs with the boundary of p0 held fixed;
    check the residual on the interior."""
    nx = ny = 33
    dx = dy = 2.0 / (nx - 1)
    rng = np.random.default_rng(0)
    rhs = jnp.asarray(rng.normal(size=(nx, ny)), jnp.float64)
    p0 = jnp.zeros((nx, ny), jnp.float64)
    p = cg_poisson(p0, rhs, dx, dy, tol=1e-10, max_iter=2000)
    pn = np.asarray(p)
    lap = ((pn[2:, 1:-1] - 2 * pn[1:-1, 1:-1] + pn[:-2, 1:-1]) / dx**2
           + (pn[1:-1, 2:] - 2 * pn[1:-1, 1:-1] + pn[1:-1, :-2]) / dy**2)
    resid = np.abs(lap - np.asarray(rhs)[1:-1, 1:-1]).max()
    assert resid < 1e-6


@pytest.mark.slow
def test_conv_basis_model():
    from ns_tpu.models.basis import BasisODEConv
    import jax

    model = BasisODEConv(3, 8, 8)
    params = model.init(jax.random.PRNGKey(0))
    grid0 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 8, 8)),
                        jnp.float32)
    pred = model.apply(params, grid0, 5)
    assert pred.shape == (5, 2, 3, 8, 8)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, grid0, 5) ** 2))(params)
    assert sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g)) > 0
