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
