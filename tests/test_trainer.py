"""Trainer integration tests: loss decreases, checkpoint save/RESUME
round-trips, io helpers behave (SURVEY.md §5 checkpoint gap: the reference
has no restore path — ours must)."""

import os

import numpy as np
import pytest

from ns_tpu.io import load_rollout, save_rollout, spatial_coarsen
from ns_tpu.train import TrainConfig, Trainer
from ns_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from tests.conftest import GOLDEN_DIR


@pytest.fixture(scope="module")
def small_npz(tmp_path_factory):
    """A tiny training npz derived from the chorin_fd golden rollout."""
    g = np.load(os.path.join(GOLDEN_DIR, "chorin_fd_semi_implicit_nt12.npz"))
    path = tmp_path_factory.mktemp("data") / "train.npz"
    # downsample spatially for test speed
    np.savez(path, u=g["u"][:, ::4, ::4], v=g["v"][:, ::4, ::4],
             p=g["p"][:, ::4, ::4])
    return str(path)


@pytest.mark.slow
@pytest.mark.parametrize("model", ["basis_ode", "basis_ode2", "basis_gru", "rnn"])
def test_training_reduces_loss(model, small_npz, tmp_path):
    cfg = TrainConfig(model=model, npz_path=small_npz,
                      out_dir=str(tmp_path / model), n_iters=30,
                      n_coeffs=3, n_frames=10, ckpt_every=10)
    tr = Trainer(cfg)
    losses = tr.train(progress=False)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # checkpoint written
    assert os.path.exists(os.path.join(cfg.out_dir, "checkpoint.npz"))
    # extrapolation has the full-horizon shape
    out = tr.extrapolate()
    assert out.shape[0] == 12 and out.shape[1] == 3


@pytest.mark.slow
def test_resume_roundtrip(small_npz, tmp_path):
    cfg = TrainConfig(model="basis_gru", npz_path=small_npz,
                      out_dir=str(tmp_path / "a"), n_iters=10,
                      n_coeffs=2, n_frames=8, ckpt_every=5)
    tr = Trainer(cfg)
    tr.train(progress=False)
    ckpt = os.path.join(cfg.out_dir, "checkpoint.npz")

    cfg2 = TrainConfig(model="basis_gru", npz_path=small_npz,
                       out_dir=str(tmp_path / "b"), n_iters=12,
                       n_coeffs=2, n_frames=8, ckpt_every=5, resume=ckpt)
    tr2 = Trainer(cfg2)
    # resumed params identical to saved ones
    for a, b in zip(np.asarray(tr.params["basis"]).ravel(),
                    np.asarray(tr2.params["basis"]).ravel()):
        assert a == b
    assert tr2.start_iter == 11
    tr2.train(progress=False)  # continues without error


def test_checkpoint_generic_pytree(tmp_path):
    state = {"a": np.arange(6).reshape(2, 3).astype(np.float32),
             "nested": {"b": np.ones(4)}}
    save_checkpoint(state, str(tmp_path), is_best=True, meta={"iter": 3})
    like = {"a": np.zeros((2, 3), np.float32), "nested": {"b": np.zeros(4)}}
    got = load_checkpoint(str(tmp_path / "checkpoint.npz"), like)
    np.testing.assert_array_equal(got["a"], state["a"])
    np.testing.assert_array_equal(got["nested"]["b"], state["nested"]["b"])
    assert os.path.exists(tmp_path / "model_best.npz")


def test_checkpoint_mismatch_names_offending_leaves(tmp_path):
    """A changed-optimizer template fails restore with an error that names
    the exact missing/unexpected/mismatched leaves (VERDICT r2: str(treedef)
    equality was brittle across JAX versions and uninformative)."""
    state = {"params": {"w": np.ones((2, 3), np.float32)},
             "opt": {"mu": np.zeros(5), "nu": np.zeros(5)}}
    save_checkpoint(state, str(tmp_path))
    path = str(tmp_path / "checkpoint.npz")

    # different optimizer: extra leaf + missing leaf
    bad = {"params": {"w": np.ones((2, 3), np.float32)},
           "opt": {"mu": np.zeros(5), "trace": np.zeros(5)}}
    with pytest.raises(ValueError) as ei:
        load_checkpoint(path, bad)
    msg = str(ei.value)
    assert "opt/trace" in msg and "opt/nu" in msg

    # same structure, wrong shape
    bad2 = {"params": {"w": np.ones((4, 3), np.float32)},
            "opt": {"mu": np.zeros(5), "nu": np.zeros(5)}}
    with pytest.raises(ValueError, match="shape mismatch at 'params/w'"):
        load_checkpoint(path, bad2)


def test_checkpoint_dtype_mismatch_fails_loudly(tmp_path):
    """An f64-trained checkpoint must not restore into an f32 template by
    silent truncation (VERDICT r3 weak #3): dtype is part of the manifest
    check, with allow_cast=True as the explicit escape hatch."""
    state = {"params": {"w": np.full((2, 3), np.pi, np.float64)}}
    save_checkpoint(state, str(tmp_path))
    path = str(tmp_path / "checkpoint.npz")

    f32_like = {"params": {"w": np.zeros((2, 3), np.float32)}}
    with pytest.raises(ValueError, match="dtype mismatch at 'params/w'"):
        load_checkpoint(path, f32_like)

    got = load_checkpoint(path, f32_like, allow_cast=True)
    assert got["params"]["w"].dtype == np.float32
    np.testing.assert_allclose(got["params"]["w"], np.float32(np.pi))

    # v1 checkpoints (no manifest) get the same dtype enforcement from
    # the stored arrays themselves
    import json
    data = np.load(path)
    arrays = {k: data[k] for k in data.files if k != "__manifest__"}
    v1_path = str(tmp_path / "v1.npz")
    np.savez(v1_path, __treedef__=np.frombuffer(b"x", dtype=np.uint8),
             **arrays)
    with pytest.raises(ValueError, match="dtype mismatch"):
        load_checkpoint(v1_path, f32_like)


def test_checkpoint_manifest_version(tmp_path):
    """Checkpoints carry an explicit format version the loader checks."""
    import json
    state = {"a": np.ones(3)}
    save_checkpoint(state, str(tmp_path))
    path = str(tmp_path / "checkpoint.npz")
    data = np.load(path)
    manifest = json.loads(bytes(data["__manifest__"]).decode())
    assert manifest["format_version"] == 2
    assert manifest["leaves"]["a"]["shape"] == [3]
    # a future-version checkpoint is rejected up front
    arrays = {k: data[k] for k in data.files if k != "__manifest__"}
    manifest["format_version"] = 99
    np.savez(path, __manifest__=np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8), **arrays)
    with pytest.raises(ValueError, match="format_version 99"):
        load_checkpoint(path, {"a": np.zeros(3)})


def test_checkpoint_cross_process_roundtrip(tmp_path):
    """Restore works in a fresh interpreter (true process-restart resume).

    The writer is this process; the reader is a subprocess that rebuilds
    the template independently and loads the checkpoint."""
    import subprocess
    import sys
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "step": np.asarray(7)}
    save_checkpoint(state, str(tmp_path), meta={"iter": 7})
    code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from ns_tpu.train.checkpoint import load_checkpoint, load_meta
path = {str(tmp_path / 'checkpoint.npz')!r}
like = {{"params": {{"w": np.zeros((2, 3), np.float32)}},
        "step": np.asarray(0)}}
got = load_checkpoint(path, like)
assert got["params"]["w"][1, 2] == 5.0
assert int(got["step"]) == 7
assert load_meta(path)["iter"] == 7
print("RESTORED_OK")
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120,
                       cwd=os.path.dirname(os.path.dirname(__file__)))
    assert r.returncode == 0, r.stderr
    assert "RESTORED_OK" in r.stdout


def test_npz_roundtrip(tmp_path):
    u = np.random.default_rng(0).normal(size=(3, 4, 4))
    path = save_rollout(str(tmp_path / "r.npz"), u, u + 1, u + 2)
    u2, v2, p2 = load_rollout(path)
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(u + 1, v2)


def test_spatial_coarsen_block_mean():
    """Vectorized block mean equals the reference's per-block loop
    (utils.py:50-58) for the square agg case."""
    T, nx, ny, agg = 2, 8, 8, 4
    rng = np.random.default_rng(1)
    u = rng.normal(size=(T, nx, ny))
    X, Y = np.meshgrid(np.linspace(0, 2, nx), np.linspace(0, 2, ny),
                       indexing="ij")
    _, _, cu, _, _ = spatial_coarsen(X, Y, u, u, u, agg, agg)
    want = u[:, :4, :4].reshape(T, -1).mean(axis=1)  # block (0,0)
    np.testing.assert_allclose(cu[:, 0, 0], want)
    assert cu.shape == (T, 2, 2)


# ---------------------------------------------------------------------------
# Ensemble trainer product surface (train.py --n-models)
# ---------------------------------------------------------------------------

def _toy_npz(tmp_path, nt=6, nx=8, ny=8, name="edata.npz"):
    import numpy as np
    rng = np.random.default_rng(0)
    path = tmp_path / name
    np.savez(path, u=rng.normal(size=(nt, nx, ny)),
             v=rng.normal(size=(nt, nx, ny)),
             p=rng.normal(size=(nt, nx, ny)))
    return str(path), nt, nx, ny


@pytest.mark.slow
def test_ensemble_trainer_trains_and_resumes(tmp_path):
    import numpy as np
    from ns_tpu.train.ensemble import EnsembleTrainer
    from ns_tpu.train.trainer import TrainConfig

    npz, nt, nx, ny = _toy_npz(tmp_path)
    cfg = TrainConfig(model="basis_ode", npz_path=npz,
                      out_dir=str(tmp_path / "ens"), n_iters=6, n_coeffs=2,
                      n_frames=nt, ckpt_every=3)
    tr = EnsembleTrainer(cfg, n_models=4)
    losses = tr.train(progress=False)
    assert len(losses) == 6 and len(losses[0]) == 4
    arr = np.asarray(losses)
    # each model's loss decreases and the seeds differ
    assert (arr[-1] < arr[0]).all()
    assert np.std(arr[0]) > 0

    extrap = tr.extrapolate()
    assert extrap.shape == (4, nt, 3, nx, ny)

    # resume from the checkpoint continues the iteration count
    cfg2 = TrainConfig(model="basis_ode", npz_path=npz,
                       out_dir=str(tmp_path / "ens"), n_iters=9, n_coeffs=2,
                       n_frames=nt, ckpt_every=3,
                       resume=str(tmp_path / "ens" / "checkpoint.npz"))
    tr2 = EnsembleTrainer(cfg2, n_models=4)
    assert tr2.start_iter == 7
    losses2 = tr2.train(progress=False)
    assert len(losses2) == 9


@pytest.mark.slow
def test_ensemble_trainer_sharded_matches_unsharded(tmp_path):
    """The ensemble-sharded run computes the same losses as mesh=None."""
    import numpy as np
    from ns_tpu.train.ensemble import EnsembleTrainer, ensemble_mesh
    from ns_tpu.train.trainer import TrainConfig

    npz, nt, nx, ny = _toy_npz(tmp_path)
    mesh = ensemble_mesh(8)
    assert mesh is not None and mesh.shape == {"ensemble": 8}
    cfg = TrainConfig(model="basis_gru", npz_path=npz,
                      out_dir=str(tmp_path / "e1"), n_iters=4, n_coeffs=2,
                      n_frames=nt, ckpt_every=4)
    tr_sharded = EnsembleTrainer(cfg, n_models=8, mesh="auto")
    l1 = np.asarray(tr_sharded.train(progress=False))
    cfg2 = TrainConfig(model="basis_gru", npz_path=npz,
                       out_dir=str(tmp_path / "e2"), n_iters=4, n_coeffs=2,
                       n_frames=nt, ckpt_every=4)
    tr_single = EnsembleTrainer(cfg2, n_models=8, mesh=None)
    l2 = np.asarray(tr_single.train(progress=False))
    np.testing.assert_allclose(l1, l2, rtol=1e-5)


@pytest.mark.slow
def test_ensemble_cli(tmp_path, monkeypatch):
    import numpy as np
    from ns_tpu.cli.train import main as train_main

    npz, nt, nx, ny = _toy_npz(tmp_path)
    out = str(tmp_path / "cliens")
    monkeypatch.chdir(tmp_path)
    train_main(["--model", "basis_ode2", "--npz-path", npz,
                "--out-dir", out, "--n-iters", "2", "--n-coeffs", "2",
                "--n-frames", str(nt), "--ckpt-every", "2",
                "--n-models", "2"])
    extrap = np.load(f"{out}_2/extrapolation.npy")
    assert extrap.shape == (2, nt, 3, nx, ny)


def test_ensemble_trainer_rejects_bad_model(tmp_path):
    import pytest as _pytest
    from ns_tpu.train.ensemble import EnsembleTrainer
    from ns_tpu.train.trainer import TrainConfig
    npz, nt, nx, ny = _toy_npz(tmp_path)
    cfg = TrainConfig(model="rnn", npz_path=npz,
                      out_dir=str(tmp_path / "x"), n_frames=nt)
    with _pytest.raises(ValueError, match="ensemble"):
        EnsembleTrainer(cfg, n_models=2)
    # noise keys are not threaded through the vmapped step
    cfg2 = TrainConfig(model="fno", npz_path=npz,
                       out_dir=str(tmp_path / "x2"), n_frames=nt,
                       input_noise=0.1)
    with _pytest.raises(ValueError, match="input_noise"):
        EnsembleTrainer(cfg2, n_models=2)


@pytest.mark.slow
def test_ensemble_trainer_fno_w(tmp_path):
    """fno ensembles: per-model losses decrease, seeds differ, and the
    vmapped closed-loop extrapolation returns per-model uvp rollouts."""
    import numpy as np
    from ns_tpu.train.ensemble import EnsembleTrainer
    from ns_tpu.train.trainer import TrainConfig

    npz, nt, nx, ny = _toy_npz(tmp_path)
    cfg = TrainConfig(model="fno_w", npz_path=npz,
                      out_dir=str(tmp_path / "ensw"), n_iters=8,
                      n_frames=nt, ckpt_every=4, fno_modes=3, fno_width=6,
                      fno_rollout_steps=2)
    tr = EnsembleTrainer(cfg, n_models=2)
    losses = tr.train(progress=False)
    arr = np.asarray(losses)
    assert arr.shape == (8, 2)
    assert (arr[-1] < arr[0]).all()
    assert np.std(arr[0]) > 0
    extrap = tr.extrapolate()
    assert extrap.shape == (2, nt, 3, nx, ny)
    assert np.isfinite(extrap).all()


@pytest.mark.slow
def test_input_noise_stream_survives_resume(tmp_path):
    """Resume continues the advanced noise stream: iterations after a
    checkpoint must see the SAME noise draws as an uninterrupted run
    (previously the key was re-derived from the seed and replayed)."""
    rng = np.random.default_rng(5)
    path = str(tmp_path / "nres.npz")
    nt = 8
    np.savez(path, u=rng.normal(size=(nt, 8, 8)),
             v=rng.normal(size=(nt, 8, 8)), p=rng.normal(size=(nt, 8, 8)))
    kw = dict(model="fno", npz_path=path, n_frames=nt, fno_modes=3,
              fno_width=6, ckpt_every=2, input_noise=0.5)

    full = Trainer(TrainConfig(out_dir=str(tmp_path / "full"),
                               n_iters=4, **kw))
    losses_full = [float(x) for x in full.train(progress=False)]

    first = Trainer(TrainConfig(out_dir=str(tmp_path / "half"),
                                n_iters=2, **kw))
    first.train(progress=False)
    resumed = Trainer(TrainConfig(
        out_dir=str(tmp_path / "half"), n_iters=4,
        resume=str(tmp_path / "half" / "checkpoint.npz"), **kw))
    losses_res = [float(x) for x in resumed.train(progress=False)]
    np.testing.assert_allclose(losses_res, losses_full, rtol=1e-6)


def test_ckpt_every_validated():
    with pytest.raises(ValueError, match="ckpt_every"):
        TrainConfig(model="fno", npz_path="x", out_dir="y", ckpt_every=0)


# ---------------------------------------------------------------------------
# Multi-trajectory training (operator families)
# ---------------------------------------------------------------------------


def _multi_npz(tmp_path, m=2, nt=6, nx=8, name="mt.npz"):
    rng = np.random.default_rng(11)
    path = str(tmp_path / name)
    np.savez(path, u=rng.normal(size=(m, nt, nx, nx)),
             v=rng.normal(size=(m, nt, nx, nx)),
             p=rng.normal(size=(m, nt, nx, nx)))
    return path, m, nt, nx


@pytest.mark.slow
@pytest.mark.parametrize("model", ["fno", "fno_w", "rnn"])
def test_multi_trajectory_training(model, tmp_path):
    """(M, nt, nx, ny) datasets train the operator/rnn families: the
    trajectory axis rides the batch axis; extrapolation follows traj 0."""
    path, m, nt, nx = _multi_npz(tmp_path, name=f"mt_{model}.npz")
    cfg = TrainConfig(model=model, npz_path=path,
                      out_dir=str(tmp_path / f"mt_{model}"), n_iters=4,
                      n_frames=nt, ckpt_every=4, fno_modes=3, fno_width=6,
                      hidden_dim=16)
    tr = Trainer(cfg)
    losses = tr.train(progress=False)
    assert np.isfinite(losses).all()
    out = tr.extrapolate()
    assert out.shape == (nt, 3, nx, nx)
    assert np.isfinite(out).all()


def test_multi_trajectory_rejects_basis_families(tmp_path):
    path, m, nt, nx = _multi_npz(tmp_path, name="mt_basis.npz")
    with pytest.raises(ValueError, match="single"):
        Trainer(TrainConfig(model="basis_ode", npz_path=path,
                            out_dir=str(tmp_path / "mtb"), n_frames=nt))


@pytest.mark.slow
def test_single_trajectory_4d_matches_3d(tmp_path):
    """An (1, nt, nx, ny) dataset trains identically to the same data in
    the reference's (nt, nx, ny) layout."""
    rng = np.random.default_rng(3)
    u, v, p = (rng.normal(size=(5, 8, 8)) for _ in range(3))
    p3 = str(tmp_path / "d3.npz")
    p4 = str(tmp_path / "d4.npz")
    np.savez(p3, u=u, v=v, p=p)
    np.savez(p4, u=u[None], v=v[None], p=p[None])
    kw = dict(model="fno", n_iters=3, n_frames=5, ckpt_every=3,
              fno_modes=3, fno_width=6)
    l3 = Trainer(TrainConfig(npz_path=p3, out_dir=str(tmp_path / "o3"),
                             **kw)).train(progress=False)
    l4 = Trainer(TrainConfig(npz_path=p4, out_dir=str(tmp_path / "o4"),
                             **kw)).train(progress=False)
    np.testing.assert_allclose([float(x) for x in l3],
                               [float(x) for x in l4], rtol=1e-6)


def test_run_solver_n_traj(tmp_path):
    from ns_tpu.cli.run_solver import main as run_main

    out = str(tmp_path / "multi.npz")
    run_main(["decaying_turbulence", "--nx", "16", "--nt", "3",
              "--n-traj", "2", "--out", out])
    d = np.load(out)
    assert d["u"].shape == (2, 3, 16, 16)
    # distinct seeds -> distinct trajectories
    assert not np.allclose(d["u"][0], d["u"][1])


# -- data-parallel training (TrainConfig.dp) --------------------------------


@pytest.mark.slow
def test_dp_fno_matches_single_device(tmp_path):
    """dp=4 shards the fno training-window axis over a {'data': 4} mesh;
    params stay replicated and the grad sync is jit's all-reduce, so the
    loss trajectory matches the single-device run to fp reduction order."""
    rng = np.random.default_rng(7)
    path = str(tmp_path / "dp.npz")
    np.savez(path, **{k: rng.normal(size=(9, 8, 8)) for k in "uvp"})
    kw = dict(model="fno", npz_path=path, n_iters=4, n_frames=9,
              ckpt_every=4, fno_modes=3, fno_width=6)
    l1 = Trainer(TrainConfig(out_dir=str(tmp_path / "s"), **kw)).train(
        progress=False)
    tr = Trainer(TrainConfig(out_dir=str(tmp_path / "d"), dp=4, **kw))
    assert tr.mesh is not None and tr.mesh.shape == {"data": 4}
    ldp = tr.train(progress=False)
    np.testing.assert_allclose([float(x) for x in ldp],
                               [float(x) for x in l1], rtol=1e-4)
    out = tr.extrapolate()
    assert out.shape == (9, 3, 8, 8) and np.isfinite(out).all()


@pytest.mark.slow
def test_dp_fno_w_and_pushforward(tmp_path):
    """dp composes with the vorticity family and the k-step objective
    (sharded windows feed back through the rollout constraint map)."""
    rng = np.random.default_rng(8)
    path = str(tmp_path / "dpw.npz")
    np.savez(path, **{k: rng.normal(size=(9, 8, 8)) for k in "uvp"})
    cfg = TrainConfig(model="fno_w", npz_path=path,
                      out_dir=str(tmp_path / "w"), n_iters=3, n_frames=9,
                      ckpt_every=3, fno_modes=3, fno_width=6,
                      fno_rollout_steps=2, dp=2)
    losses = Trainer(cfg).train(progress=False)
    assert np.isfinite(losses).all()


def test_dp_rnn_shards_trajectories(tmp_path):
    path, m, nt, nx = _multi_npz(tmp_path, name="dp_rnn.npz")
    assert m % 2 == 0
    cfg = TrainConfig(model="rnn", npz_path=path,
                      out_dir=str(tmp_path / "r"), n_iters=3,
                      n_frames=nt, ckpt_every=3, hidden_dim=16, dp=2)
    losses = Trainer(cfg).train(progress=False)
    assert np.isfinite(losses).all()


def test_dp_rejects_basis_and_bad_sizes(tmp_path, small_npz):
    with pytest.raises(ValueError, match="batch axis"):
        Trainer(TrainConfig(model="basis_ode", npz_path=small_npz,
                            out_dir=str(tmp_path / "x"), n_frames=8, dp=2))
    with pytest.raises(ValueError, match="devices"):
        Trainer(TrainConfig(model="fno", npz_path=small_npz,
                            out_dir=str(tmp_path / "y"), n_frames=8,
                            fno_modes=3, fno_width=6, dp=999))
    with pytest.raises(ValueError, match="dp must be"):
        TrainConfig(model="fno", dp=0)


# -- lr schedule / warmup / grad clip ---------------------------------------


@pytest.mark.slow
def test_lr_schedule_and_clip_train(small_npz, tmp_path):
    cfg = TrainConfig(model="basis_gru", npz_path=small_npz,
                      out_dir=str(tmp_path / "sched"), n_iters=10,
                      n_coeffs=2, n_frames=8, ckpt_every=5,
                      lr_schedule="cosine", warmup_iters=3, grad_clip=1.0)
    losses = Trainer(cfg).train(progress=False)
    assert np.isfinite(losses).all() and len(losses) == 10


@pytest.mark.slow
def test_lr_schedule_resumes_mid_schedule(small_npz, tmp_path):
    """The schedule count rides opt_state, so 5 iters + resume-to-10
    reproduces the one-shot 10-iter run."""
    kw = dict(model="basis_gru", npz_path=small_npz, n_coeffs=2,
              n_frames=8, ckpt_every=5, lr_schedule="cosine",
              warmup_iters=2, schedule_horizon=10)
    full = Trainer(TrainConfig(out_dir=str(tmp_path / "f"), n_iters=10,
                               **kw))
    full.train(progress=False)
    half = Trainer(TrainConfig(out_dir=str(tmp_path / "h"), n_iters=5,
                               **kw))
    half.train(progress=False)
    resumed = Trainer(TrainConfig(
        out_dir=str(tmp_path / "r"), n_iters=10,
        resume=os.path.join(str(tmp_path / "h"), "checkpoint.npz"), **kw))
    resumed.train(progress=False)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(full.params),
                    jax.tree_util.tree_leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_schedule_validation():
    with pytest.raises(ValueError, match="lr_schedule"):
        TrainConfig(lr_schedule="step")
    with pytest.raises(ValueError, match="warmup_iters"):
        TrainConfig(warmup_iters=-1)
    with pytest.raises(ValueError, match="grad_clip"):
        TrainConfig(grad_clip=-0.5)


# -- stochastic minibatch training (TrainConfig.batch_size) -----------------


@pytest.mark.slow
def test_minibatch_training(tmp_path):
    """Sampled-window training runs for k=1 and k-step objectives, and the
    per-step cost no longer binds the loss to all nt windows (losses are
    on the sampled batch, so they differ from full-batch)."""
    rng = np.random.default_rng(9)
    path = str(tmp_path / "mb.npz")
    np.savez(path, **{k: rng.normal(size=(12, 8, 8)) for k in "uvp"})
    kw = dict(model="fno", npz_path=path, n_iters=4, n_frames=12,
              ckpt_every=4, fno_modes=3, fno_width=6)
    lfull = Trainer(TrainConfig(out_dir=str(tmp_path / "f"),
                                **kw)).train(progress=False)
    lmb = Trainer(TrainConfig(out_dir=str(tmp_path / "m"), batch_size=4,
                              **kw)).train(progress=False)
    assert np.isfinite(lmb).all()
    assert not np.allclose(lmb, lfull)
    # composes with the pushforward objective and dp sharding
    cfg = TrainConfig(model="fno", npz_path=path,
                      out_dir=str(tmp_path / "k"), n_iters=3, n_frames=12,
                      ckpt_every=3, fno_modes=3, fno_width=6,
                      fno_rollout_steps=3, batch_size=4, dp=2)
    assert np.isfinite(Trainer(cfg).train(progress=False)).all()


@pytest.mark.slow
def test_minibatch_sample_stream_survives_resume(tmp_path):
    """The window-sampling PRNG rides the noise-key stream, so a resumed
    run replays the exact remaining sample sequence."""
    rng = np.random.default_rng(10)
    path = str(tmp_path / "mbr.npz")
    np.savez(path, **{k: rng.normal(size=(10, 8, 8)) for k in "uvp"})
    kw = dict(model="fno", npz_path=path, n_coeffs=2, n_frames=10,
              ckpt_every=3, fno_modes=3, fno_width=6, batch_size=3)
    full = Trainer(TrainConfig(out_dir=str(tmp_path / "f"), n_iters=6, **kw))
    lf = full.train(progress=False)
    half = Trainer(TrainConfig(out_dir=str(tmp_path / "h"), n_iters=3, **kw))
    half.train(progress=False)
    res = Trainer(TrainConfig(
        out_dir=str(tmp_path / "r"), n_iters=6,
        resume=os.path.join(str(tmp_path / "h"), "checkpoint.npz"), **kw))
    lr_ = res.train(progress=False)
    np.testing.assert_allclose([float(x) for x in lr_[3:]],
                               [float(x) for x in lf[3:]], rtol=1e-5)


def test_minibatch_validation(small_npz, tmp_path):
    with pytest.raises(ValueError, match="operator families"):
        TrainConfig(model="basis_ode", batch_size=4)
    with pytest.raises(ValueError, match="batch_size"):
        TrainConfig(model="fno", batch_size=-1)
    from ns_tpu.train.ensemble import EnsembleTrainer
    with pytest.raises(ValueError, match="single-model Trainer"):
        EnsembleTrainer(TrainConfig(model="fno", npz_path=small_npz,
                                    out_dir=str(tmp_path / "e"),
                                    n_frames=8, batch_size=2), 2)


def test_fno3d_w_selection_warns_divergence():
    """fno3d_w reproducibly diverges on this repo's own 3D benchmarks
    (RESULTS.md 3D table); selecting it must warn with the working
    alternatives, and the other 3D families must stay silent."""
    import warnings

    with pytest.warns(UserWarning, match="fno3d_a"):
        TrainConfig(model="fno3d_w")
    for ok in ("fno3d", "fno3d_a"):
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            TrainConfig(model=ok)
