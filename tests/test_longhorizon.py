"""200-step stability/fidelity gates (VERDICT r2 #7): the north-star
horizon (every reference driver runs nt=200) asserted in CI shape for all
four families, quirk AND corrected modes.

Gate semantics (BASELINE.json): "rollout divergence residual matching
reference to 1e-5" — on the collocated cavity grids the central-difference
divergence after projection is O(truncation) and O(1) at the singular lid
corners for BOTH sides (the pressure solve's 5-point Laplacian is not the
composition of the central div/grad pair), so the gate is |div_ours -
div_ref| <= 1e-5, not an absolute bound. The periodic spectral family is
divergence-free BY CONSTRUCTION (streamfunction form) and gates at an
absolute 1e-5 (measured ~1e-17).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.train.metrics import divergence_residual_fd, kinetic_energy
from ns_tpu.utils.guard import guarded_rollout
from tests.conftest import load_golden


def cavity_bcs(dx, dy):
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


def _guarded_200(sys_, nt=200, max_abs=1e3):
    """Run the wrapper's step under the divergence guard for nt steps;
    fail if the guard trips; return the final state."""
    final, _ = jax.jit(lambda s0: guarded_rollout(
        sys_._step, s0, nt, max_abs=max_abs))(sys_.state0)
    assert not bool(final.bad), (
        f"guard tripped at step {int(final.first_bad_step)}")
    return final.state


@pytest.mark.slow
def test_direct_fd_200step_divergence_matches_reference():
    """Quirk-mode divergence residual tracks the reference's own at every
    probe frame of the full horizon (|div_ours - div_ref| <= 1e-5; the
    elementwise field parity test in test_direct_fd.py implies ~1e-13,
    this asserts the north-star metric in its own terms)."""
    from ns_tpu.solvers import direct_fd
    nx = ny = 50
    cfg_dx = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(cfg_dx, cfg_dx)
    sys_ = direct_fd.NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=200, nit=50, nx=nx, ny=ny,
        dt=0.001, rho=1, nu=0.1, dtype=jnp.float64)
    u, v, _ = sys_.simulate()
    g = load_golden("direct_fd_nt200_snapshots.npz")
    for i, f in enumerate(g["frames"]):
        d_ours = float(divergence_residual_fd(u[f], v[f], cfg_dx, cfg_dx))
        d_ref = float(divergence_residual_fd(
            jnp.asarray(g["u"][i]), jnp.asarray(g["v"][i]), cfg_dx, cfg_dx))
        assert abs(d_ours - d_ref) <= 1e-5, (f, d_ours, d_ref)


@pytest.mark.slow
def test_chorin_fd_200step_divergence_matches_reference():
    """Same gate for chorin_fd quirk mode over the full reference horizon
    (chorin_fd/simulate.py:278-315 runs nt=200 nit=200 semi_implicit)."""
    from ns_tpu.solvers import chorin_fd
    nx = ny = 51
    dx = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dx)
    sys_ = chorin_fd.NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=200, nit=200, nx=nx, ny=ny, dt=1e-3,
        rho=1, nu=0.1, beta=1.25, method="semi_implicit",
        pressure_mode="gauss_seidel", dtype=jnp.float64)
    u, v, _ = sys_.simulate()
    g = load_golden("chorin_fd_semi_implicit_nt200_snapshots.npz")
    for i, f in enumerate(g["frames"]):
        d_ours = float(divergence_residual_fd(u[f], v[f], dx, dx))
        d_ref = float(divergence_residual_fd(
            jnp.asarray(g["u"][i]), jnp.asarray(g["v"][i]), dx, dx))
        assert abs(d_ours - d_ref) <= 1e-5, (f, d_ours, d_ref)


@pytest.mark.slow
def test_chorin_fd_200step_field_parity():
    """Full-horizon elementwise drift band for chorin_fd quirk mode
    (wavefront-GS pressure). Measured drift vs the reference oracle at
    frames 0/24/49/99/149/199: <= 1.3e-14 velocities, <= 1.6e-12 pressure
    — roundoff-level with no secular growth, extending the 12-step
    near-bitwise result to the full reference horizon."""
    from ns_tpu.solvers import chorin_fd
    nx = ny = 51
    dx = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dx)
    sys_ = chorin_fd.NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=200, nit=200, nx=nx, ny=ny, dt=1e-3,
        rho=1, nu=0.1, beta=1.25, method="semi_implicit",
        pressure_mode="gauss_seidel", dtype=jnp.float64)
    u, v, p = sys_.simulate()
    g = load_golden("chorin_fd_semi_implicit_nt200_snapshots.npz")
    for i, f in enumerate(g["frames"]):
        np.testing.assert_allclose(np.asarray(u)[f], g["u"][i], atol=1e-13)
        np.testing.assert_allclose(np.asarray(v)[f], g["v"][i], atol=1e-13)
        np.testing.assert_allclose(np.asarray(p)[f], g["p"][i], atol=1e-11)


@pytest.mark.slow
def test_chorin_fd_corrected_200step_guarded_stable():
    """Corrected chorin_fd (unsplit-CN helmholtz predictor + exact dst
    pressure) runs the full horizon under the divergence guard without
    tripping; energy stays bounded by the lid scale."""
    from ns_tpu.solvers import chorin_fd
    nx = ny = 51
    dx = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dx)
    sys_ = chorin_fd.NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=200, nit=200, nx=nx, ny=ny, dt=1e-3,
        rho=1, nu=0.1, beta=1.25, method="helmholtz",
        pressure_mode="dst", dtype=jnp.float64)
    final = _guarded_200(sys_)
    ke = float(kinetic_energy(final.u, final.v))
    assert 0 < ke < 0.5, ke  # lid speed 1 bounds mean KE by 0.5


@pytest.mark.slow
def test_direct_fd_corrected_200step_guarded_stable():
    from ns_tpu.solvers import direct_fd
    nx = ny = 50
    dx = 2.0 / (nx - 1)
    u_bc, v_bc, p_bc = cavity_bcs(dx, dx)
    sys_ = direct_fd.NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, p_bc, nt=200, nit=50, nx=nx, ny=ny, dt=1e-3,
        rho=1, nu=0.1, dtype=jnp.float64, pressure_mode="exact")
    final = _guarded_200(sys_)
    ke = float(kinetic_energy(final.u, final.v))
    assert 0 < ke < 0.5, ke


@pytest.mark.slow
def test_chorin_spectral_corrected_200step_guarded_stable():
    """The corrected Chebyshev operators run the full reference horizon
    (the reference's own scheme NaNs by step ~6 — PARITY.md); guard-clean
    with bounded energy."""
    from ns_tpu.solvers import chorin_spectral
    nx = ny = 51
    dx = 2.0 / (nx - 1)
    u_bc, v_bc, _ = cavity_bcs(dx, dx)
    sys_ = chorin_spectral.NavierStokesSystem(
        np.zeros((nx, ny)), np.zeros((nx, ny)), np.zeros((nx, ny)),
        u_bc, v_bc, nt=200, nit=200, nx=nx, ny=ny, dt=1e-3,
        rho=1, nu=0.1, beta=1.25, dtype=jnp.float64, quirk_compat=False)
    final = _guarded_200(sys_)
    ke = float(kinetic_energy(final.u, final.v))
    assert 0 < ke < 0.5, ke


@pytest.mark.slow
def test_spectral_periodic_200step_divergence_free():
    """The periodic family is divergence-free by construction: absolute
    gate at 1e-5 (measured ~1e-17 in f64) over the full horizon."""
    from ns_tpu.solvers import spectral_periodic as sp
    cfg = sp.SpectralPeriodicConfig(nt=200, nx=64, ny=64, dt=1e-3,
                                    nu=1e-3, dtype="float64")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0)
    c0 = sp.init_from_vorticity(cfg, w0)
    w_hat, _ = jax.jit(lambda c: sp.rollout_final(cfg, c))(c0)
    assert float(sp.divergence_max(cfg, w_hat)) <= 1e-5
    assert bool(jnp.isfinite(jnp.abs(w_hat)).all())
