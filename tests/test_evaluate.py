"""cli.evaluate: the quantitative surrogate eval (reference parity gap —
the reference writes extrapolation.npy and stops, ref
spectral_ode.py:208-224; this CLI scores it)."""

import json

import numpy as np
import pytest

from ns_tpu.cli.evaluate import evaluate
from ns_tpu.train.trainer import TrainConfig, Trainer


def _toy_npz(tmp_path, nt=8, nx=8, ny=8, name="edata.npz"):
    rng = np.random.default_rng(7)
    path = tmp_path / name
    np.savez(path, u=rng.normal(size=(nt, nx, ny)),
             v=rng.normal(size=(nt, nx, ny)),
             p=rng.normal(size=(nt, nx, ny)))
    return str(path), nt, nx, ny


def test_evaluate_exact_prediction_scores_zero(tmp_path):
    npz, nt, nx, ny = _toy_npz(tmp_path)
    d = np.load(npz)
    obs = np.stack([d["u"], d["v"], d["p"]], axis=1).astype(np.float32)
    report = evaluate(obs.copy(), obs, n_train=4)
    assert report["windows"]["train"]["rel_l2"] == 0.0
    assert report["windows"]["full"]["rel_l2"] == 0.0
    assert report["windows"]["extrapolation"]["rel_l2"] == 0.0
    # persistence on random data is far from zero
    assert report["windows"]["full"]["persistence_rel_l2"] > 0.5
    assert all(m["rel_l2"] == 0.0 for m in report["horizon_curve"])
    assert set(report["windows"]["full"]["fields"]) == {"u", "v", "p"}


def test_evaluate_shape_mismatch_raises(tmp_path):
    obs = np.zeros((4, 3, 8, 8), np.float32)
    with pytest.raises(ValueError, match="shape"):
        evaluate(np.zeros((4, 3, 8, 9), np.float32), obs, 2)


@pytest.mark.slow
def test_evaluate_cli_ckpt_and_extrapolation(tmp_path, capsys):
    from ns_tpu.cli.evaluate import main

    npz, nt, nx, ny = _toy_npz(tmp_path)
    cfg = TrainConfig(model="fno", npz_path=npz,
                      out_dir=str(tmp_path / "ck"), n_iters=4,
                      n_frames=5, ckpt_every=4, fno_modes=3, fno_width=6)
    tr = Trainer(cfg)
    tr.train(progress=False)

    rpt = str(tmp_path / "report.json")
    main(["--ckpt", str(tmp_path / "ck"), "--npz-path", npz,
          "--json", rpt])
    out = capsys.readouterr().out
    assert "| full |" in out and "persistence" in out
    with open(rpt) as f:
        report = json.load(f)
    # train window comes from the checkpoint's own n_frames, not the flag
    assert report["n_train"] == 5
    assert "extrapolation" in report["windows"]
    assert np.isfinite(report["windows"]["full"]["rel_l2"])

    # --extrapolation mode scores a saved file identically to the array
    extrap = tr.extrapolate()
    path = str(tmp_path / "extrapolation.npy")
    np.save(path, extrap)
    main(["--extrapolation", path, "--npz-path", npz, "--n-frames", "5"])
    d = np.load(npz)
    obs = np.stack([d["u"], d["v"], d["p"]], axis=1).astype(np.float32)
    want = evaluate(extrap.astype(np.float32), obs, 5)
    got_line = [ln for ln in capsys.readouterr().out.splitlines()
                if ln.startswith("| full |")][0]
    assert f"{want['windows']['full']['rel_l2']:.4f}" in got_line


def test_evaluate_cli_offset(tmp_path, capsys):
    """--offset k compares pred[t] to obs[t+k] (reference rnn files)."""
    from ns_tpu.cli.evaluate import main

    npz, nt, nx, ny = _toy_npz(tmp_path, name="off.npz")
    d = np.load(npz)
    obs = np.stack([d["u"], d["v"], d["p"]], axis=1).astype(np.float32)
    # a "prediction" that is obs shifted by one: perfect under --offset 1
    path = str(tmp_path / "shifted.npy")
    np.save(path, np.concatenate([obs[1:], obs[-1:]]))
    main(["--extrapolation", path, "--npz-path", npz,
          "--n-frames", "4", "--offset", "1"])
    out = capsys.readouterr().out
    assert "| full | 0.0000 |" in out


def test_evaluate_cli_offset_beyond_train_window_is_clear(tmp_path):
    """--offset >= n_frames must fail with an offset-pointed message,
    not a downstream 'n_train must be >= 1' that blames the wrong knob."""
    import pytest

    from ns_tpu.cli.evaluate import main

    npz, nt, nx, ny = _toy_npz(tmp_path, name="off2.npz")
    d = np.load(npz)
    obs = np.stack([d["u"], d["v"], d["p"]], axis=1).astype(np.float32)
    path = str(tmp_path / "pred2.npy")
    np.save(path, obs)
    with pytest.raises(SystemExit, match="train window"):
        main(["--extrapolation", path, "--npz-path", npz,
              "--n-frames", "4", "--offset", "5"])


@pytest.mark.slow
def test_evaluate_physics_metrics(tmp_path, capsys):
    """--physics: solver-produced frames score ~zero spectrum error and
    near-machine divergence; a perturbed prediction scores worse."""
    import jax
    from ns_tpu.cli.evaluate import physics_metrics
    from ns_tpu.models.vorticity import dealias_field
    from ns_tpu.solvers import spectral_periodic as sp

    nx = 32
    cfg = sp.SpectralPeriodicConfig(nt=4, nx=nx, ny=nx, dt=1e-3, nu=1e-3,
                                    dtype="float32")
    w0 = np.asarray(jax.jit(dealias_field)(
        sp.decaying_turbulence_vorticity(cfg, seed=0)))
    u, v, p = (np.asarray(a) for a in sp.NavierStokesSystem(
        w0, nt=4, nx=nx, ny=nx, dt=1e-3, nu=1e-3).simulate())
    obs = np.stack([u, v, p], axis=1).astype(np.float32)

    ph = physics_metrics(obs.copy(), obs)
    # identical inputs score identically-0 spectrum error by construction;
    # the real signal is (a) the solver field is near-divergence-free and
    # (b) a perturbed prediction scores materially worse on both axes
    assert ph["spectrum_rel_l2"] == 0.0
    assert ph["divergence_max_pred"] < 1e-3  # f32 spectral round-off scale
    rng = np.random.default_rng(0)
    bad = obs + 0.3 * obs.std() * rng.normal(
        size=obs.shape).astype(np.float32)
    ph_bad = physics_metrics(bad, obs)
    assert ph_bad["spectrum_rel_l2"] > 1e-3
    assert ph_bad["divergence_max_pred"] > 10 * ph["divergence_max_pred"]


@pytest.mark.slow
def test_evaluate_cli_ensemble_checkpoint(tmp_path, capsys):
    """Ensemble checkpoints score the member mean; the report carries
    member count and spread."""
    from ns_tpu.cli.evaluate import main
    from ns_tpu.train.ensemble import EnsembleTrainer

    npz, nt, nx, ny = _toy_npz(tmp_path, name="eens.npz")
    cfg = TrainConfig(model="fno", npz_path=npz,
                      out_dir=str(tmp_path / "eens_ck"), n_iters=4,
                      n_frames=5, ckpt_every=4, fno_modes=3, fno_width=6)
    etr = EnsembleTrainer(cfg, n_models=2)
    etr.train(progress=False)
    rpt = str(tmp_path / "ens_report.json")
    main(["--ckpt", str(tmp_path / "eens_ck"), "--npz-path", npz,
          "--json", rpt])
    with open(rpt) as f:
        report = json.load(f)
    assert report["ensemble"]["n_models"] == 2
    assert report["ensemble"]["member_spread"] > 0
    assert np.isfinite(report["windows"]["full"]["rel_l2"])
    assert "ensemble: 2 members" in capsys.readouterr().out
