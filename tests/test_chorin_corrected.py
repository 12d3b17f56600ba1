"""chorin_fd corrected (quirk_compat=False) explicit path."""

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


def run(quirk):
    nx = ny = 33
    dx = dy = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dy)
    z = np.zeros((nx, ny))
    s = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, nt=30, nit=300, nx=nx, ny=ny,
        dt=5e-4, rho=1, nu=0.1, beta=1.25, method="explicit",
        dtype=jnp.float64, quirk_compat=quirk)
    return s.simulate()


def test_corrected_explicit_stable_and_differs_from_quirked():
    uq, vq, pq = run(True)
    uc, vc, pc = run(False)
    assert np.isfinite(np.asarray(uc)).all()
    assert np.abs(np.asarray(uc)).max() < 2.0
    # the corrected y-advection stencil changes the flow measurably
    assert np.abs(np.asarray(uc[-1]) - np.asarray(uq[-1])).max() > 1e-6
