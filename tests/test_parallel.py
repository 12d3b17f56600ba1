"""Distributed tests on the fake 8-device CPU mesh (SURVEY.md §4d).

The sharded direct_fd rollout must match the single-device solver
elementwise — same stencils, same BC order, halo exchange replacing the
slice neighbors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.core.state import FlowState
from ns_tpu.parallel import exchange_halo_rows, make_mesh
from ns_tpu.parallel import direct_fd_sharded
from ns_tpu.solvers import direct_fd


def cavity_bcs(dx, dy):
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


def test_eight_fake_devices_present():
    assert jax.device_count() == 8


def test_halo_exchange_rows():
    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    from jax.sharding import PartitionSpec as P

    def f(a):
        return exchange_halo_rows(a, "x")

    g = jax.jit(jax.shard_map(f, mesh=mesh, in_specs=P("x", None),
                              out_specs=P("x", None)))
    a = jnp.arange(16.0).reshape(8, 2)
    out = np.asarray(g(a))  # (8+2*4, 2): each shard padded
    # shard 1 holds global rows 2,3; its pad = [row1, row2, row3, row4]
    np.testing.assert_array_equal(out[4:8], np.asarray(a)[1:5])
    # first shard's lower halo is zeros (non-periodic chain end)
    np.testing.assert_array_equal(out[0], 0.0)


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_direct_fd_matches_single_device(n_shards):
    nx = ny = 48
    cfg = direct_fd.DirectFDConfig(nt=5, nit=20, nx=nx, ny=ny,
                                   dt=0.001, rho=1.0, nu=0.1)
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    z = np.zeros((nx, ny))

    ref_sys = direct_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, nt=5, nit=20, nx=nx, ny=ny,
        dt=0.001, rho=1, nu=0.1, dtype=jnp.float64)
    u_ref, v_ref, p_ref = ref_sys.simulate()

    mesh = make_mesh({"x": n_shards}, devices=jax.devices()[:n_shards])
    state0 = FlowState(u=jnp.zeros((nx, ny), jnp.float64),
                       v=jnp.zeros((nx, ny), jnp.float64),
                       p=jnp.zeros((nx, ny), jnp.float64))
    u_s, v_s, p_s = direct_fd_sharded.simulate(
        cfg, state0, u_bc, v_bc, p_bc, mesh)

    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref), atol=1e-13)


@pytest.mark.parametrize("shape", [{"x": 2, "y": 2}, {"x": 2, "y": 4}])
def test_2d_sharded_direct_fd_matches_single_device(shape):
    nx = ny = 48
    cfg = direct_fd.DirectFDConfig(nt=4, nit=15, nx=nx, ny=ny,
                                   dt=0.001, rho=1.0, nu=0.1)
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    z = np.zeros((nx, ny))
    ref_sys = direct_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, nt=4, nit=15, nx=nx, ny=ny,
        dt=0.001, rho=1, nu=0.1, dtype=jnp.float64)
    u_ref, v_ref, p_ref = ref_sys.simulate()

    n_dev = shape["x"] * shape["y"]
    mesh = make_mesh(shape, devices=jax.devices()[:n_dev])
    state0 = FlowState(u=jnp.zeros((nx, ny), jnp.float64),
                       v=jnp.zeros((nx, ny), jnp.float64),
                       p=jnp.zeros((nx, ny), jnp.float64))
    u_s, v_s, p_s = direct_fd_sharded.simulate(
        cfg, state0, u_bc, v_bc, p_bc, mesh, axis="x", axis_y="y")

    np.testing.assert_allclose(np.asarray(u_s), np.asarray(u_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_ref), atol=1e-13)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_ref), atol=1e-13)


def test_mesh_preset_and_validation():
    mesh = make_mesh("host-8")
    assert mesh.shape == {"ensemble": 4, "x": 2}
    with pytest.raises(ValueError):
        make_mesh({"x": 3})


@pytest.mark.parametrize("n_shards", [2, 4])
def test_sharded_direct_fd_exact_pressure_matches_single_device(n_shards):
    """Distributed mixed-BC exact pressure (padded eigenbasis + two
    all_to_all transposes) matches the single-device pressure_mode='exact'
    rollout elementwise."""
    nx = ny = 48
    cfg = direct_fd.DirectFDConfig(nt=4, nx=nx, ny=ny, dt=0.001, rho=1.0,
                                   nu=0.1, pressure_mode="exact")
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    z = jnp.zeros((nx, ny), jnp.float64)

    step = direct_fd.make_step(cfg, u_bc, v_bc, p_bc)
    s = FlowState(u=z, v=z, p=z)
    for _ in range(cfg.nt):
        s = step(s)

    mesh = make_mesh({"x": n_shards}, devices=jax.devices()[:n_shards])
    sstep, sharding = direct_fd_sharded.make_sharded_step(
        cfg, u_bc, v_bc, p_bc, mesh, axis="x")
    zs = jax.device_put(z, sharding)
    ss = FlowState(u=zs, v=zs, p=zs)
    for _ in range(cfg.nt):
        ss = sstep(ss)

    np.testing.assert_allclose(np.asarray(ss.u), np.asarray(s.u), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ss.v), np.asarray(s.v), atol=1e-10)
    np.testing.assert_allclose(np.asarray(ss.p), np.asarray(s.p), atol=1e-9)


def test_sharded_direct_fd_exact_rejects_2d_mesh():
    cfg = direct_fd.DirectFDConfig(nx=16, ny=16, pressure_mode="exact")
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    mesh = make_mesh({"x": 2, "y": 2}, devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="1D row decomposition"):
        direct_fd_sharded.make_sharded_step(cfg, u_bc, v_bc, p_bc, mesh,
                                            axis="x", axis_y="y")


def test_ensemble_fd_rollout_matches_members():
    """A sharded vmapped batch of chorin_fd rollouts (dst pressure)
    matches each member's single-state rollout elementwise."""
    from ns_tpu.parallel.ensemble import ensemble_fd_rollout
    from ns_tpu.solvers import chorin_fd

    nx = ny = 24
    cfg = chorin_fd.ChorinFDConfig(nt=4, nx=nx, ny=ny, dt=1e-3, rho=1.0,
                                   nu=0.1, beta=1.25,
                                   method="semi_implicit",
                                   pressure_mode="dst")
    u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
    step = chorin_fd.make_step(cfg, u_bc, v_bc, p_bc, dtype=jnp.float64)

    rng = np.random.default_rng(0)
    members = []
    for i in range(4):
        z = np.zeros((nx, ny))
        u0 = 0.01 * rng.normal(size=(nx, ny))
        members.append(chorin_fd.init_state(cfg, u0, z, z, u_bc, v_bc,
                                            p_bc, dtype=jnp.float64))

    batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *members)
    mesh = make_mesh({"ensemble": 4}, devices=jax.devices()[:4])
    out = ensemble_fd_rollout(step, batch, cfg.nt, mesh)

    for i, m in enumerate(members):
        s = m
        for _ in range(cfg.nt):
            s = step(s)
        np.testing.assert_allclose(np.asarray(out.u[i]), np.asarray(s.u),
                                   atol=1e-12)
        np.testing.assert_allclose(np.asarray(out.p[i]), np.asarray(s.p),
                                   atol=1e-12)
