"""Sharded chorin_fd vs single-device, elementwise, on the fake CPU mesh.

The sharded solver (ns_tpu/parallel/chorin_fd_sharded.py) runs the same
numerics — AB/CN-ADI predictor, pmax-gated red-black SOR, central-gradient
correction — as ns_tpu/solvers/chorin_fd.py with halo exchange replacing
slice neighbors, so the rollouts must agree to float64 roundoff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.parallel import make_mesh
from ns_tpu.parallel import chorin_fd_sharded
from ns_tpu.solvers import chorin_fd

ATOL = 1e-12


def cavity_bcs(dx, dy):
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


def _reference_rollout(cfg, u_bc, v_bc, p_bc):
    z = np.zeros((cfg.nx, cfg.ny))
    state0 = chorin_fd.init_state(cfg, z, z, z, u_bc, v_bc, p_bc,
                                  dtype=jnp.float64)
    return chorin_fd.simulate(cfg, state0, u_bc, v_bc, p_bc,
                              dtype=jnp.float64), state0


@pytest.mark.parametrize("method", ["explicit", "semi_implicit"])
@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_matches_single_device(method, n_shards):
    nx = ny = 40
    cfg = chorin_fd.ChorinFDConfig(nt=4, nit=100, nx=nx, ny=ny, dt=1e-3,
                                   rho=1.0, nu=0.1, beta=1.25, method=method)
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    (u_ref, v_ref, p_ref), state0 = _reference_rollout(cfg, u_bc, v_bc, p_bc)

    mesh = make_mesh({"x": n_shards}, devices=jax.devices()[:n_shards])
    u_s, v_s, p_s = chorin_fd_sharded.simulate(
        cfg, state0, u_bc, v_bc, p_bc, mesh, dtype=jnp.float64)

    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref), atol=ATOL)


def test_sharded_corrected_rectangular():
    """quirk_compat=False rectangular grids: the all_gather corrected
    y-sweep matches the single-device corrected solver."""
    nx, ny = 24, 16
    cfg = chorin_fd.ChorinFDConfig(nt=3, nit=80, nx=nx, ny=ny, dt=1e-3,
                                   rho=1.0, nu=0.1, beta=1.25,
                                   method="semi_implicit", quirk_compat=False)
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    (u_ref, v_ref, p_ref), state0 = _reference_rollout(cfg, u_bc, v_bc, p_bc)

    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    u_s, v_s, p_s = chorin_fd_sharded.simulate(
        cfg, state0, u_bc, v_bc, p_bc, mesh, dtype=jnp.float64)

    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), atol=ATOL)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref), atol=ATOL)


def test_sharded_rejects_unsupported_modes():
    cfg = chorin_fd.ChorinFDConfig(nx=16, ny=16,
                                   pressure_mode="gauss_seidel")
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    mesh = make_mesh({"x": 2}, devices=jax.devices()[:2])
    with pytest.raises(ValueError, match="redblack"):
        chorin_fd_sharded.make_sharded_step(cfg, u_bc, v_bc, p_bc, mesh)
    cfg = chorin_fd.ChorinFDConfig(nx=16, ny=6, method="explicit")
    with pytest.raises(ValueError, match="divisible"):
        chorin_fd_sharded.make_sharded_step(cfg, u_bc, v_bc, p_bc,
                                            make_mesh({"x": 4},
                                                      devices=jax.devices()[:4]))


@pytest.mark.slow
@pytest.mark.parametrize("n_shards", [2, 4, 8])
def test_sharded_dst_matches_single_device(n_shards):
    """Distributed matmul-DST pressure (all_to_all transposes + padded
    basis) matches the single-device pressure_mode='dst' rollout."""
    nx = ny = 40
    cfg = chorin_fd.ChorinFDConfig(nt=4, nit=100, nx=nx, ny=ny, dt=1e-3,
                                   rho=1.0, nu=0.1, beta=1.25,
                                   method="semi_implicit",
                                   pressure_mode="dst")
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    (u_ref, v_ref, p_ref), state0 = _reference_rollout(cfg, u_bc, v_bc, p_bc)

    mesh = make_mesh({"x": n_shards}, devices=jax.devices()[:n_shards])
    u_s, v_s, p_s = chorin_fd_sharded.simulate(
        cfg, state0, u_bc, v_bc, p_bc, mesh, dtype=jnp.float64)

    # both sides are exact direct solves; differences are pure GEMM
    # reassociation roundoff (f64)
    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref), atol=1e-9)


@pytest.mark.slow
@pytest.mark.parametrize("n_shards", [2, 8])
def test_sharded_helmholtz_matches_single_device(n_shards):
    """Distributed unsplit-CN predictor (method='helmholtz', eigenbasis
    solve through the shared dst_apply transposes) matches the
    single-device corrected solver elementwise."""
    nx = ny = 40
    cfg = chorin_fd.ChorinFDConfig(nt=4, nit=100, nx=nx, ny=ny, dt=1e-3,
                                   rho=1.0, nu=0.1, beta=1.25,
                                   method="helmholtz", quirk_compat=False,
                                   pressure_mode="dst")
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    (u_ref, v_ref, p_ref), state0 = _reference_rollout(cfg, u_bc, v_bc, p_bc)

    mesh = make_mesh({"x": n_shards}, devices=jax.devices()[:n_shards])
    u_s, v_s, p_s = chorin_fd_sharded.simulate(
        cfg, state0, u_bc, v_bc, p_bc, mesh, dtype=jnp.float64)

    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), atol=1e-10)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref), atol=1e-9)
