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


# ---------------------------------------------------------------------------
# Neumann BCs in corrected mode (round 2: derivative-data boundary lifting)
# ---------------------------------------------------------------------------

def test_neumann_rejected_in_quirk_mode():
    import pytest
    from ns_tpu.core.bc import dirichlet, neumann
    from ns_tpu.solvers import chorin_spectral
    u_bc = [neumann(0, "left", 0.1, 0.1), dirichlet(0, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    with pytest.raises(NotImplementedError):
        chorin_spectral._process_bcs(u_bc, allow_neumann=False)


def test_corrected_neumann_channel_matches_heat_equation():
    """Channel shear u = 1 - y^2 with Neumann-0 x-faces and Dirichlet-0
    y-faces reduces to the 1D heat equation u_t = nu u_yy; the corrected
    solver (which, unlike the reference, actually applies nu — the
    reference stores self.nu and never uses it, ref :258-298) matches a
    converged FD heat solve to ~2e-6 and satisfies the Neumann condition
    spectrally."""
    import numpy as np
    from ns_tpu.core.bc import dirichlet, neumann
    from ns_tpu.ops import cheb
    from ns_tpu.solvers import chorin_spectral

    nx = ny = 33
    u_bc = [neumann(0, "left", 0.1, 0.1), neumann(0, "right", 0.1, 0.1),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    x = cheb.gauss_lobatto(nx)
    _, Y = np.meshgrid(x, x, indexing="ij")
    u0 = 1.0 - Y**2
    nu, dt, nt = 0.1, 1e-3, 100
    sys_ = chorin_spectral.NavierStokesSystem(
        u0, np.zeros((nx, ny)), np.zeros((nx, ny)), u_bc, v_bc,
        nt=nt, nx=nx, ny=ny, dt=dt, rho=1, nu=nu, dtype=jnp.float64,
        quirk_compat=False)
    u, v, p = sys_.simulate()
    u = np.asarray(u)
    assert np.isfinite(u).all()
    # stays x-independent (no spurious x-coupling through the Neumann faces)
    assert np.abs(u[-1] - u[-1][nx // 2][None, :]).max() < 1e-10
    # v stays identically zero
    assert np.abs(np.asarray(v[-1])).max() < 1e-10
    # matches the 1D heat equation at the configured nu
    m = 801
    yx = np.linspace(-1, 1, m)
    hy = yx[1] - yx[0]
    w = 1.0 - yx**2
    sub = 40
    for _ in range(nt * sub):
        lap = np.zeros_like(w)
        lap[1:-1] = (w[2:] - 2 * w[1:-1] + w[:-2]) / hy**2
        w = w + dt / sub * nu * lap
        w[0] = w[-1] = 0.0
    exact = np.interp(x, yx, w)
    rel = np.abs(u[-1][nx // 2, :] - exact).max() / np.abs(exact).max()
    assert rel < 1e-5, rel
    # Neumann condition holds spectrally on both x faces
    D = cheb.d_matrix(nx, quirk_compat=False)
    dun = D @ u[-1]
    assert np.abs(dun[0, 1:-1]).max() < 1e-10
    assert np.abs(dun[-1, 1:-1]).max() < 1e-10


def test_corrected_mode_applies_nu():
    """Two corrected runs differing only in nu must differ (the reference's
    momentum step ignores nu entirely — defect replicated in quirk mode
    only)."""
    import numpy as np
    from ns_tpu.core.bc import dirichlet
    from ns_tpu.ops import cheb
    from ns_tpu.solvers import chorin_spectral

    nx = ny = 21
    bc0 = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    x = cheb.gauss_lobatto(nx)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u0 = (1 - X**2) * (1 - Y**2)
    outs = []
    for nu in (0.05, 0.5):
        s = chorin_spectral.NavierStokesSystem(
            u0, np.zeros((nx, ny)), np.zeros((nx, ny)), bc0, bc0,
            nt=10, nx=nx, ny=ny, dt=1e-3, rho=1, nu=nu,
            dtype=jnp.float64, quirk_compat=False)
        outs.append(np.asarray(s.simulate()[0][-1]))
    assert np.abs(outs[0] - outs[1]).max() > 1e-6


def _advection_sign_probe(quirk_compat):
    """One semi-implicit predictor step at negligible viscosity, where
    physics dictates u* ~= u - dt * u.grad(u)."""
    from ns_tpu.solvers.chorin_fd import (ChorinFDConfig, _adi_inverses,
                                          _semi_implicit_predictor)

    nx = ny = 41
    cfg = ChorinFDConfig(nx=nx, ny=ny, dt=1e-3, nu=1e-6,
                         method="semi_implicit", quirk_compat=quirk_compat)
    x = np.linspace(-1, 1, nx)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u = 0.5 * np.sin(np.pi * X) * np.cos(np.pi * Y) + 1.0
    v = 0.3 * np.cos(np.pi * X) * np.sin(np.pi * Y)
    uj, vj = jnp.asarray(u), jnp.asarray(v)
    A_inv, B_inv = _adi_inverses(cfg, jnp.float64)
    ui, _ = _semi_implicit_predictor(cfg, A_inv, B_inv, uj, vj, uj, vj)

    dx = cfg.dx
    dudx = (u[2:, 1:-1] - u[:-2, 1:-1]) / (2 * dx)
    dudy = (u[1:-1, 2:] - u[1:-1, :-2]) / (2 * dx)
    adv = u[1:-1, 1:-1] * dudx + v[1:-1, 1:-1] * dudy
    got = np.asarray(ui)[1:-1, 1:-1]
    err_minus = np.abs(got - (u[1:-1, 1:-1] - cfg.dt * adv)).max()
    err_plus = np.abs(got - (u[1:-1, 1:-1] + cfg.dt * adv)).max()
    return err_minus, err_plus


def test_semi_implicit_advection_sign_defect_replicated_and_corrected():
    """The reference's semi-implicit predictor ADDS +dt/2(3H - H1) with
    H = +u.grad(u) (ref chorin_fd/simulate.py:126-137) — advection with
    the sign flipped vs the momentum equation (its own explicit path
    subtracts, ref :73-77). quirk mode replicates the flip; corrected
    mode restores the physical minus sign."""
    err_minus_q, err_plus_q = _advection_sign_probe(True)
    assert err_plus_q < 1e-5 < err_minus_q          # quirk: flipped sign
    err_minus_c, err_plus_c = _advection_sign_probe(False)
    assert err_minus_c < 1e-5 < err_plus_c          # corrected: physical
