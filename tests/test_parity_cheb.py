"""Parity-split Chebyshev engine: float64 equality vs the dense path.

The corrected chorin_spectral operators are reversal-parity on the
symmetric Gauss-Lobatto grid (ops/parity.py module docstring), so every
per-step GEMM runs as two half-size GEMMs. These tests lock the split to
the dense path (difference = fp reassociation only) and exercise the
auto/explicit/fallback resolution rules (VERDICT r3 next #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.ops import cheb
from ns_tpu.ops.parity import (ParityEig, make_parity_apply,
                               reversal_parity)
from ns_tpu.solvers import chorin_spectral as cs


def _cavity_bcs(nx, ny, lid=1.0):
    dx, dy = 2.0 / nx, 2.0 / ny
    u_bc = [dirichlet(0.0, "left", dx, dy), dirichlet(0.0, "right", dx, dy),
            dirichlet(0.0, "bottom", dx, dy), dirichlet(lid, "top", dx, dy)]
    v_bc = [dirichlet(0.0, s, dx, dy)
            for s in ("left", "right", "bottom", "top")]
    return u_bc, v_bc


def _random_state(cfg, seed=0):
    rng = np.random.default_rng(seed)
    shape = (cfg.nx, cfg.ny)
    from ns_tpu.core.state import FlowState
    mk = lambda: jnp.asarray(rng.normal(scale=0.1, size=shape), jnp.float64)
    return FlowState(u=mk(), v=mk(), p=mk(), u_prev=mk(), v_prev=mk())


def test_corrected_operators_have_expected_parity():
    """The corrected matrices are reversal-odd (D, D-hat) / even (D^2);
    the quirk matrices are neither (M=N denominators, one-ended bar_c)."""
    N = 20
    D = cheb.d_matrix(N, quirk_compat=False)
    D2 = cheb.d_sqr_matrix(N, quirk_compat=False)
    DP = cheb.d_matrix_pn_minus_2(N, quirk_compat=False)
    assert reversal_parity(D) == -1
    assert reversal_parity(D2) == +1
    assert reversal_parity(DP) == -1
    assert reversal_parity(D[1:-1, :]) == -1  # interior rows keep parity
    assert reversal_parity(cheb.d_matrix(N, quirk_compat=True)) is None
    assert reversal_parity(cheb.d_sqr_matrix(N, quirk_compat=True)) is None


@pytest.mark.parametrize("n", [16, 17])
def test_parity_apply_matches_dense(n):
    rng = np.random.default_rng(1)
    M = rng.normal(size=(n - 2, n))
    M = 0.5 * (M - M[::-1, ::-1])  # odd, rectangular (interior rows)
    X = rng.normal(size=(n, 7))
    f = make_parity_apply(M, jnp.float64, "left")
    np.testing.assert_allclose(np.asarray(f(jnp.asarray(X))), M @ X,
                               rtol=0, atol=1e-13)
    Y = rng.normal(size=(3, 5, n))
    fr = make_parity_apply(M, jnp.float64, "right")
    np.testing.assert_allclose(np.asarray(fr(jnp.asarray(Y))), Y @ M.T,
                               rtol=0, atol=1e-13)


@pytest.mark.slow
@pytest.mark.parametrize("form", ["composed", "quadrant"])
@pytest.mark.parametrize("nx,ny", [(24, 24), (25, 25), (24, 28)])
def test_parity_step_equals_dense_step_f64(nx, ny, form):
    """One corrected step, parity vs dense, float64: agreement to fp
    reassociation (<= 1e-11 on unit-scale fields) — for BOTH eigen-solve
    schedules (the size gate must never change the answer)."""
    u_bc, v_bc = _cavity_bcs(nx, ny)
    mk_cfg = lambda ps: cs.ChorinSpectralConfig(
        nx=nx, ny=ny, dt=1e-3, nu=0.1, quirk_compat=False,
        deflate_pressure_nullspace=True, parity_split=ps,
        parity_eig_form=form if ps else None)
    step_d = cs.make_step(mk_cfg(False), u_bc, v_bc, dtype=jnp.float64)
    step_p = cs.make_step(mk_cfg(True), u_bc, v_bc, dtype=jnp.float64)
    s0 = _random_state(mk_cfg(False))
    a, b = step_d(s0), step_p(s0)
    for fa, fb in [(a.u, b.u), (a.v, b.v), (a.p, b.p)]:
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=0, atol=1e-11)


def test_parity_rollout_equals_dense_rollout_f64():
    """20 steps stay locked (no accumulation beyond fp reassociation
    drift at the same order)."""
    nx = ny = 24
    u_bc, v_bc = _cavity_bcs(nx, ny)
    mk_cfg = lambda ps: cs.ChorinSpectralConfig(
        nt=20, nx=nx, ny=ny, dt=1e-3, nu=0.1, quirk_compat=False,
        deflate_pressure_nullspace=True, parity_split=ps)
    u0 = np.zeros((nx, ny))
    out = {}
    for ps in (False, True):
        cfg = mk_cfg(ps)
        state = cs.init_state(cfg, u0, u0, u0, u_bc, v_bc,
                              dtype=jnp.float64)
        step = cs.make_step(cfg, u_bc, v_bc, dtype=jnp.float64)
        u_seq, v_seq, p_seq = jax.jit(
            lambda s, f=step, c=cfg: cs.simulate(c, s, f))(state)
        out[ps] = (np.asarray(u_seq), np.asarray(v_seq), np.asarray(p_seq))
    for a, b in zip(out[False], out[True]):
        assert np.isfinite(a).all()
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-10)


def test_parity_resolution_rules():
    u_bc, v_bc = _cavity_bcs(16, 16)
    # quirk + explicit True -> error; quirk + auto -> silently dense
    # (resolution checked directly: the quirk pressure operator's spectrum
    # goes complex at some sizes, an independent pre-existing constraint)
    with pytest.raises(ValueError, match="quirk_compat=False"):
        cs._resolve_parity_split(cs.ChorinSpectralConfig(
            nx=16, ny=16, quirk_compat=True, parity_split=True),
            None, None, None)
    assert cs._resolve_parity_split(cs.ChorinSpectralConfig(
        nx=16, ny=16, quirk_compat=True, parity_split=None),
        None, None, None) is False
    # corrected + auto at small size -> dense (below the MXU crossover);
    # the step must still run
    step = cs.make_step(cs.ChorinSpectralConfig(
        nx=16, ny=16, quirk_compat=False, parity_split=None),
        u_bc, v_bc, dtype=jnp.float64)
    step(_random_state(cs.ChorinSpectralConfig(nx=16, ny=16)))


def test_parity_eig_form_validated():
    u_bc, v_bc = _cavity_bcs(24, 24)
    with pytest.raises(ValueError, match="parity_eig_form"):
        cs.make_step(cs.ChorinSpectralConfig(
            nx=24, ny=24, quirk_compat=False, parity_split=True,
            parity_eig_form="diagonal"), u_bc, v_bc, dtype=jnp.float64)


def test_parity_neumann_explicit_runs_or_names_offender():
    """Symmetric Neumann data keeps operator parity, so the explicit
    parity path must work with the corrected-mode Neumann support."""
    nx = ny = 16
    dx = dy = 2.0 / nx
    u_bc = [neumann(0.0, "left", dx, dy), neumann(0.0, "right", dx, dy),
            dirichlet(0.0, "bottom", dx, dy), dirichlet(0.0, "top", dx, dy)]
    v_bc = [dirichlet(0.0, s, dx, dy)
            for s in ("left", "right", "bottom", "top")]
    mk_cfg = lambda ps: cs.ChorinSpectralConfig(
        nx=nx, ny=ny, quirk_compat=False, deflate_pressure_nullspace=True,
        parity_split=ps)
    step_p = cs.make_step(mk_cfg(True), u_bc, v_bc, dtype=jnp.float64)
    step_d = cs.make_step(mk_cfg(False), u_bc, v_bc, dtype=jnp.float64)
    s0 = _random_state(mk_cfg(False), seed=3)
    a, b = step_d(s0), step_p(s0)
    np.testing.assert_allclose(np.asarray(a.u), np.asarray(b.u),
                               rtol=0, atol=1e-11)
    np.testing.assert_allclose(np.asarray(a.v), np.asarray(b.v),
                               rtol=0, atol=1e-11)


def test_parity_eig_matches_dense_helmholtz():
    """ParityEig's block eigen solve equals the full-operator eigen solve
    for the actual corrected cavity Helmholtz operator."""
    N = 24
    D2 = cheb.d_sqr_matrix(N, quirk_compat=False)
    M = D2[1:-1, 1:-1]
    pe = ParityEig(M, "helmholtz", jnp.float64)
    lam, V = cheb.eig_real(M, "helmholtz")
    Vi = np.linalg.inv(V)
    rng = np.random.default_rng(2)
    F = rng.normal(size=(N - 2, N - 2))
    dt = 1e-3
    dense = V @ (((Vi @ F @ Vi.T)
                  / (2.0 - dt * lam[:, None] - dt * lam[None, :]))
                 @ V.T)
    G = pe.forward(pe.forward(jnp.asarray(F), -2), -1)
    den = 2.0 - dt * pe.lam[:, None] - dt * pe.lam[None, :]
    split = pe.inverse(pe.inverse(G / den, -1), -2)
    np.testing.assert_allclose(np.asarray(split), dense, rtol=0, atol=1e-12)
