"""Sharded corrected-mode Chebyshev Chorin vs single-device, elementwise."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.ops import cheb
from ns_tpu.parallel import make_mesh
from ns_tpu.parallel import chorin_spectral_sharded
from ns_tpu.solvers import chorin_spectral

ATOL = 1e-11


def _single_device(cfg, u0, v0, u_bc, v_bc):
    state0 = chorin_spectral.init_state(cfg, u0, v0, np.zeros_like(u0),
                                        u_bc, v_bc, dtype=jnp.float64)
    step = chorin_spectral.make_step(cfg, u_bc, v_bc, dtype=jnp.float64)
    return chorin_spectral.simulate(cfg, state0, jax.jit(step)), state0


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_corrected_matches_single_device(n_shards):
    nx = ny = 32
    cfg = chorin_spectral.ChorinSpectralConfig(
        nt=5, nx=nx, ny=ny, dt=1e-3, rho=1.0, nu=0.1,
        quirk_compat=False, deflate_pressure_nullspace=True)
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    x = cheb.gauss_lobatto(nx)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u0 = (1 - X**2) * (1 - Y**2)
    v0 = np.zeros((nx, ny))
    (u_ref, v_ref, p_ref), state0 = _single_device(cfg, u0, v0, u_bc, v_bc)

    mesh = make_mesh({"x": n_shards}, devices=jax.devices()[:n_shards])
    u_s, v_s, p_s = chorin_spectral_sharded.simulate(
        cfg, state0, u_bc, v_bc, mesh)

    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref), atol=ATOL)


@pytest.mark.slow
def test_sharded_corrected_neumann_matches_single_device():
    """Neumann x-faces work sharded too (the boundary reconstruction rides
    the same padded-operator gathers)."""
    nx = ny = 32
    cfg = chorin_spectral.ChorinSpectralConfig(
        nt=4, nx=nx, ny=ny, dt=1e-3, rho=1.0, nu=0.1,
        quirk_compat=False, deflate_pressure_nullspace=True)
    u_bc = [neumann(0, "left", 0.1, 0.1), neumann(0, "right", 0.1, 0.1),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    x = cheb.gauss_lobatto(nx)
    _, Y = np.meshgrid(x, x, indexing="ij")
    u0 = 1.0 - Y**2
    v0 = np.zeros((nx, ny))
    (u_ref, v_ref, p_ref), state0 = _single_device(cfg, u0, v0, u_bc, v_bc)

    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    u_s, v_s, p_s = chorin_spectral_sharded.simulate(
        cfg, state0, u_bc, v_bc, mesh)
    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), atol=ATOL)


def test_sharded_rejects_quirk_mode():
    cfg = chorin_spectral.ChorinSpectralConfig(nx=16, ny=16,
                                               quirk_compat=True)
    u_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    mesh = make_mesh({"x": 2}, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="corrected"):
        chorin_spectral_sharded.make_sharded_step(cfg, u_bc, u_bc, mesh)


@pytest.mark.slow
def test_sharded_preserves_pressure_boundary_ring():
    """The single-device solver writes only p's interior each step
    (p.at[1:-1,1:-1].set(Q)); the sharded step must preserve a nonzero
    initial boundary ring identically (regression: it used to zero it)."""
    nx = ny = 32
    cfg = chorin_spectral.ChorinSpectralConfig(
        nt=3, nx=nx, ny=ny, dt=1e-3, rho=1.0, nu=0.1,
        quirk_compat=False, deflate_pressure_nullspace=True)
    u_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    x = cheb.gauss_lobatto(nx)
    X, Y = np.meshgrid(x, x, indexing="ij")
    u0 = (1 - X**2) * (1 - Y**2)
    v0 = np.zeros((nx, ny))
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(nx, ny))  # nonzero boundary ring

    state0 = chorin_spectral.init_state(cfg, u0, v0, p0, u_bc, v_bc,
                                        dtype=jnp.float64)
    step = chorin_spectral.make_step(cfg, u_bc, v_bc, dtype=jnp.float64)
    u_ref, v_ref, p_ref = chorin_spectral.simulate(cfg, state0,
                                                   jax.jit(step))

    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    u_s, v_s, p_s = chorin_spectral_sharded.simulate(
        cfg, state0, u_bc, v_bc, mesh)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref),
                               atol=ATOL)
