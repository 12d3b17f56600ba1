"""Communication-model regression tests (VERDICT r2 #5).

docs/scaling.md states the per-step collective budget of every sharded
family; these tests LOWER each sharded program and count the collective
ops in its StableHLO, pinning the scaling design against regressions (a
change that doubles communication fails here, not in a profile three
months later).

Counting semantics: occurrences in the lowered module text — i.e. distinct
collective SITES. Ops inside `lax.scan`/`while` bodies appear once
regardless of trip count, so a rollout's count = init sites + per-step
sites + output sites, and a step's count is its true per-step budget.
"""

import pytest
import re
from collections import Counter

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.core.state import FlowState
from ns_tpu.parallel import make_mesh

COLLECTIVES = ("all_to_all", "all_gather", "all_reduce",
               "collective_permute", "reduce_scatter")


def collective_counts(lowered) -> dict:
    ops = re.findall(r"stablehlo\.(\w+)", lowered.as_text())
    return dict(Counter(o for o in ops if o in COLLECTIVES))


def cavity_bcs(dx, dy):
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


def _mesh4():
    return make_mesh({"x": 4}, devices=jax.devices()[:4])


def test_spectral_fft_one_all_to_all_per_transform():
    """Distributed FFT (scaling.md): ONE all_to_all per 2D transform and
    NOTHING else. simulate = 6 init sites (fwd + 5-transform nonlinear) +
    6 per step (5 nonlinear + 1 output inverse)."""
    from ns_tpu.parallel.spectral_sharded import make_sharded_simulate
    from ns_tpu.solvers import spectral_periodic as sp
    cfg = sp.SpectralPeriodicConfig(nt=3, nx=32, ny=32, dt=0.005, nu=1e-3,
                                    dtype="float64")
    mesh = _mesh4()
    sim, sharding = make_sharded_simulate(cfg, mesh)
    w0 = jax.device_put(sp.taylor_green_vorticity(cfg), sharding)
    assert collective_counts(sim.lower(w0)) == {"all_to_all": 12}


def test_spectral_compact_batched_nonlinear_two_per_step():
    """Compact matmul-DFT (scaling.md): the 4 nonlinear inverses share ONE
    batched transform, so the hot loop has exactly 2 all_to_all per step
    (1 batched inverse + 1 forward). rollout-final = 3 init + 2 step + 1
    output; simulate-uvp = 3 init + 5 (2 step + 3 output recovery)."""
    from ns_tpu.parallel.spectral_sharded import (
        make_sharded_compact_rollout, make_sharded_compact_simulate)
    from ns_tpu.solvers import spectral_periodic as sp
    cfg = sp.SpectralPeriodicConfig(nt=3, nx=32, ny=32, dt=0.005, nu=1e-3,
                                    dtype="float64", transform="matmul",
                                    matmul_precision="highest",
                                    compact_spectrum=True, dealias=True)
    mesh = _mesh4()
    w0 = np.asarray(sp.taylor_green_vorticity(cfg))

    roll, sh = make_sharded_compact_rollout(cfg, mesh)
    assert collective_counts(
        roll.lower(jax.device_put(w0, sh))) == {"all_to_all": 6}

    sim, sh2 = make_sharded_compact_simulate(cfg, mesh, fields="uvp")
    assert collective_counts(
        sim.lower(jax.device_put(w0, sh2))) == {"all_to_all": 8}


def test_direct_fd_halo_budget():
    """direct_fd (scaling.md): 1-cell ppermute halos only — 4 exchange
    sites per step (source term, Jacobi loop body, u/v momentum) x 2
    ppermutes each; the nit Jacobi sweeps reuse the single loop-body site.
    pressure_mode='exact' swaps the Jacobi site for the 2-all_to_all
    direct mixed-BC transpose solve."""
    from ns_tpu.parallel import direct_fd_sharded
    from ns_tpu.solvers import direct_fd
    mesh = _mesh4()
    u_bc, v_bc, p_bc = cavity_bcs(*[2.0 / 31] * 2)

    cfg = direct_fd.DirectFDConfig(nt=2, nit=50, nx=32, ny=32, dt=1e-3,
                                   rho=1.0, nu=0.1)
    step, sh = direct_fd_sharded.make_sharded_step(cfg, u_bc, v_bc, p_bc,
                                                   mesh, axis="x")
    z = jax.device_put(jnp.zeros((32, 32), jnp.float64), sh)
    s = FlowState(u=z, v=z, p=z)
    assert collective_counts(
        jax.jit(step).lower(s)) == {"collective_permute": 8}

    cfg2 = direct_fd.DirectFDConfig(nt=2, nit=50, nx=32, ny=32, dt=1e-3,
                                    rho=1.0, nu=0.1, pressure_mode="exact")
    step2, sh2 = direct_fd_sharded.make_sharded_step(cfg2, u_bc, v_bc,
                                                     p_bc, mesh, axis="x")
    z2 = jax.device_put(jnp.zeros((32, 32), jnp.float64), sh2)
    assert collective_counts(jax.jit(step2).lower(
        FlowState(u=z2, v=z2, p=z2))) == {"collective_permute": 6,
                                          "all_to_all": 2}


def test_chorin_fd_pressure_mode_budgets():
    """chorin_fd (scaling.md): red-black SOR = 2 halo exchanges (4
    ppermutes) per sweep site + ONE pmax convergence gate in the while
    body; pressure_mode='dst' removes the gate entirely and replaces the
    sweep loop with 2 all_to_all transposes (and 2 fewer halo sites)."""
    from ns_tpu.parallel import chorin_fd_sharded
    from ns_tpu.solvers import chorin_fd
    mesh = _mesh4()
    nx = ny = 32
    z = np.zeros((nx, ny))

    def build(pressure_mode):
        cfg = chorin_fd.ChorinFDConfig(nt=2, nit=100, nx=nx, ny=ny,
                                       dt=1e-3, rho=1.0, nu=0.1, beta=1.25,
                                       method="semi_implicit",
                                       pressure_mode=pressure_mode)
        u_bc, v_bc, p_bc = cavity_bcs(cfg.dx, cfg.dy)
        step, sh = chorin_fd_sharded.make_sharded_step(cfg, u_bc, v_bc,
                                                       p_bc, mesh)
        st = chorin_fd.init_state(cfg, z, z, z, u_bc, v_bc, p_bc,
                                  dtype=jnp.float64)
        st = jax.tree.map(lambda a: jax.device_put(a, sh), st)
        return collective_counts(jax.jit(step).lower(st))

    assert build("redblack") == {"collective_permute": 24, "all_reduce": 1}
    assert build("dst") == {"collective_permute": 22, "all_to_all": 2}


def test_chorin_spectral_gather_budget():
    """chorin_spectral corrected (scaling.md): ~10 all_gathers/step for
    the y-contractions against zero-ring-padded operators + psum sites for
    the y-edge reconstruction; NO halo traffic (dense operators, not
    stencils)."""
    from ns_tpu.parallel import chorin_spectral_sharded
    from ns_tpu.solvers import chorin_spectral
    mesh = _mesh4()
    nx = ny = 32
    cfg = chorin_spectral.ChorinSpectralConfig(
        nt=2, nx=nx, ny=ny, dt=1e-3, rho=1.0, nu=0.1,
        quirk_compat=False, deflate_pressure_nullspace=True)
    ub = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    step, sh = chorin_spectral_sharded.make_sharded_step(cfg, ub, ub, mesh)
    z = np.zeros((nx, ny))
    st = chorin_spectral.init_state(cfg, z, z, z, ub, ub)
    st = jax.tree.map(
        lambda a: jax.device_put(jnp.asarray(a, jnp.float64), sh), st)
    counts = collective_counts(jax.jit(step).lower(st))
    assert counts == {"all_gather": 10, "all_reduce": 8}


def test_spectral3d_one_all_to_all_per_transform():
    """Pencil-sharded 3D (scaling.md): each 3D transform costs exactly ONE
    all_to_all; the 6-field nonlinear inverse and 3-field forward are each
    one batched site. rollout-final = 3 init sites (fwd + batched
    nonlinear pair) + 2 per step + 1 output inverse; simulate adds the
    per-step output inverse to the loop body."""
    from ns_tpu.parallel.spectral3d_sharded import (make_sharded_rollout3d,
                                                    make_sharded_simulate3d)
    from ns_tpu.solvers import spectral3d as s3
    cfg = s3.Spectral3DConfig(nt=3, nx=16, ny=12, nz=12, dt=1e-3, nu=1e-3,
                              dtype="float64", transform="matmul",
                              matmul_precision="highest")
    mesh = _mesh4()
    u0 = np.asarray(s3.taylor_green_velocity(cfg))

    roll, sh = make_sharded_rollout3d(cfg, mesh)
    assert collective_counts(
        roll.lower(jax.device_put(u0, sh))) == {"all_to_all": 6}

    sim, sh2 = make_sharded_simulate3d(cfg, mesh)
    assert collective_counts(
        sim.lower(jax.device_put(u0, sh2))) == {"all_to_all": 6}


def test_ensemble_axis_never_communicates():
    """Ensemble data-parallelism (scaling.md): ZERO hot-loop collectives —
    trajectories are independent; the only collectives in a 2D
    ensemble x spatial program ride the spatial axis."""
    from ns_tpu.parallel.spectral_sharded import (
        make_sharded_compact_rollout)
    from ns_tpu.solvers import spectral_periodic as sp
    cfg = sp.SpectralPeriodicConfig(nt=3, nx=16, ny=16, dt=0.005, nu=1e-3,
                                    dtype="float64", transform="matmul",
                                    matmul_precision="highest",
                                    compact_spectrum=True, dealias=True)
    mesh = make_mesh({"ensemble": 2, "x": 4})
    roll, sh = make_sharded_compact_rollout(cfg, mesh, axis="x",
                                            ens_axis="ensemble")
    w0 = np.broadcast_to(np.asarray(sp.taylor_green_vorticity(cfg)),
                         (4, 16, 16))
    txt = roll.lower(jax.device_put(np.ascontiguousarray(w0), sh)).as_text()
    # every all_to_all is over the spatial axis; no collective mentions
    # the ensemble axis's device groups spanning different ensemble rows
    counts = collective_counts(roll.lower(jax.device_put(
        np.ascontiguousarray(w0), sh)))
    assert counts == {"all_to_all": 6}
    # replica groups of each all_to_all partition within ensemble rows:
    # devices {0..3} and {4..7} never appear in the same group
    found = re.findall(r"replica_groups\s*=\s*dense<(\[\[.*?\]\])>", txt)
    assert found, "no replica_groups in lowering — regex needs updating"
    for groups in found:
        for g in eval(groups):
            rows = {d // 4 for d in g}
            assert len(rows) == 1, f"collective crosses ensemble rows: {g}"


@pytest.mark.slow
def test_dp_train_step_grad_sync_only(tmp_path):
    """Data-parallel training (TrainConfig.dp, scaling.md): the sharded
    window batch makes every comm an ALL-REDUCE (loss + gradient sync) —
    no all_gather/all_to_all of field-sized data may appear."""
    from ns_tpu.train.trainer import TrainConfig, Trainer
    rng = np.random.default_rng(5)
    path = str(tmp_path / "dpc.npz")
    np.savez(path, **{k: rng.normal(size=(9, 8, 8)) for k in "uvp"})
    tr = Trainer(TrainConfig(model="fno", npz_path=path,
                             out_dir=str(tmp_path / "o"), n_iters=2,
                             n_frames=9, ckpt_every=2, fno_modes=3,
                             fno_width=6, dp=4))
    chunk = tr._train_chunk(2)
    # sharding here comes from with_sharding_constraint under plain jit,
    # so the collectives only exist AFTER the SPMD partitioner runs —
    # count them in the compiled HLO, not the StableHLO
    hlo = chunk.lower(tr.params, tr.opt_state, tr._noise_key,
                      tr._train_frames).compile().as_text()
    ops = Counter(re.findall(r"\b(all-reduce|all-gather|all-to-all|"
                             r"collective-permute)(?:-start)?\b", hlo))
    assert ops.get("all-reduce", 0) >= 1, ops
    assert ops.get("all-gather", 0) == 0, ops
    assert ops.get("all-to-all", 0) == 0, ops
