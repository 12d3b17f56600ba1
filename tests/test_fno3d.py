"""FNO3D surrogate: engine equivalence, residual contract, rollout post,
train/serve/evaluate round trips."""

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.models.fno3d import FNO3D
from ns_tpu.models.projection import project_leray3d


def _model(transform, n=10, **kw):
    kw.setdefault("width", 6)
    kw.setdefault("modes", 3)
    kw.setdefault("depth", 2)
    return FNO3D(n, n, n, transform=transform, **kw)


def test_engines_agree():
    n = 10
    m_fft = _model("fft", n)
    m_mm = _model("matmul", n)
    params = m_fft.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 4, n, n, n)), jnp.float64)
    y_fft = np.asarray(jax.jit(m_fft.apply)(params, x))
    y_mm = np.asarray(jax.jit(m_mm.apply)(params, x))
    np.testing.assert_allclose(y_mm, y_fft, atol=1e-10)


def test_zero_weights_identity_residual():
    # zero spectral + bypass + proj weights -> apply(x) == x exactly
    m = _model("matmul")
    params = jax.tree.map(jnp.zeros_like, m.init(jax.random.PRNGKey(1)))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 10, 10, 10)), jnp.float32)
    np.testing.assert_allclose(np.asarray(jax.jit(m.apply)(params, x)),
                               np.asarray(x), atol=1e-6)


def test_rollout_with_leray_projection():
    m = _model("matmul")
    params = m.init(jax.random.PRNGKey(2))
    x0 = jnp.asarray(np.random.default_rng(2).standard_normal(
        (4, 10, 10, 10)), jnp.float32)

    def post(x):
        u, v, w = project_leray3d(x[..., 0, :, :, :], x[..., 1, :, :, :],
                                  x[..., 2, :, :, :])
        return jnp.stack([u, v, w, x[..., 3, :, :, :]], axis=-4)

    xs = np.asarray(jax.jit(
        lambda p, x: m.rollout(p, x, 3, post=post))(params, x0))
    assert xs.shape == (3, 4, 10, 10, 10)
    # every fed-back state is exactly divergence-free (spectral div)
    u, v, w = (jnp.asarray(xs[-1][i]) for i in range(3))
    uh = jnp.fft.rfftn(u)
    # paired modes only: the projection zeroes derivative operators at the
    # unpaired Nyquist wavenumbers (projection.py) — exclude them here too
    kx = np.fft.fftfreq(10, 0.1); kx[5] = 0.0
    ky = kx.copy()
    kz = np.fft.rfftfreq(10, 0.1); kz[-1] = 0.0
    div = (kx[:, None, None] * uh
           + ky[None, :, None] * jnp.fft.rfftn(v)
           + kz[None, None, :] * jnp.fft.rfftn(w))
    # f32 fields: spectral-divergence residual at fp32 rounding scale
    assert float(jnp.abs(div).max()) < 1e-4 * float(jnp.abs(uh).max())


def test_leray3d_projection_exact_and_idempotent():
    rng = np.random.default_rng(3)
    u, v, w = (jnp.asarray(rng.standard_normal((12, 10, 8)))
               for _ in range(3))
    up, vp, wp = project_leray3d(u, v, w)
    # solenoidal input round-trips
    up2, vp2, wp2 = project_leray3d(up, vp, wp)
    np.testing.assert_allclose(np.asarray(up2), np.asarray(up), atol=1e-12)
    # divergence is removed (checked spectrally)
    axes = (-3, -2, -1)
    kx = np.fft.fftfreq(12, 1 / 12)[:, None, None].copy(); kx[6] = 0.0
    ky = np.fft.fftfreq(10, 1 / 10)[None, :, None].copy(); ky[0, 5] = 0.0
    kz = np.fft.rfftfreq(8, 1 / 8)[None, None, :].copy(); kz[0, 0, -1] = 0.0
    div = (kx * np.fft.rfftn(np.asarray(up), axes=axes)
           + ky * np.fft.rfftn(np.asarray(vp), axes=axes)
           + kz * np.fft.rfftn(np.asarray(wp), axes=axes))
    assert np.abs(div).max() < 1e-10


def test_validation():
    with pytest.raises(ValueError):
        FNO3D(8, 8, 8, transform="bogus")


@pytest.mark.slow
def test_fno3d_trains_and_extrapolates(tmp_path):
    """End to end on tiny 3D data: run_solver 3D npz -> Trainer(fno3d)
    loss decreases -> frame-aligned extrapolation -> checkpoint resume."""
    from ns_tpu.cli.run_solver import main as run_main
    from ns_tpu.train.trainer import TrainConfig, Trainer

    npz = tmp_path / "d3.npz"
    run_main(["decaying_turbulence_3d", "--nx", "8", "--nt", "8",
              "--nu", "1e-2", "--transform", "matmul",
              "--precision", "highest", "--out", str(npz)])

    cfg = TrainConfig(model="fno3d", npz_path=str(npz),
                      out_dir=str(tmp_path / "ckpt"), n_iters=30,
                      n_frames=8, ckpt_every=10, fno_modes=3, fno_width=6,
                      fno_project=True, fno_rollout_steps=2)
    tr = Trainer(cfg)
    tr.train(progress=False)
    assert tr.losses[-1] < tr.losses[0] * 0.9
    out = tr.extrapolate()
    assert out.shape == (8, 4, 8, 8, 8) and np.isfinite(out).all()
    # frame alignment: out[0] is the exact initial frame
    obs = np.load(npz)
    np.testing.assert_allclose(out[0, 0], obs["u"][0].astype(np.float32),
                               atol=1e-6)

    # resume continues bitwise (same protocol as the 2D families)
    cfg2 = TrainConfig(**{**dataclasses.asdict(cfg), "n_iters": 40,
                          "resume": str(tmp_path / "ckpt" /
                                        "checkpoint.npz")})
    tr2 = Trainer(cfg2)
    assert tr2.start_iter == 31

    # 2D/3D data-model mismatches fail with a clear error
    with pytest.raises(ValueError, match="expects"):
        Trainer(TrainConfig(model="fno", npz_path=str(npz),
                            out_dir=str(tmp_path / "x")))




@pytest.mark.slow
def test_fno3d_serve_and_evaluate_roundtrip(tmp_path, capsys):
    """Checkpoint -> InferenceEngine predictions match the trainer's
    frame-aligned extrapolation; evaluate CLI scores the 3D rollout."""
    from ns_tpu.cli.evaluate import main as eval_main
    from ns_tpu.cli.run_solver import main as run_main
    from ns_tpu.serve.engine import InferenceEngine
    from ns_tpu.train.trainer import TrainConfig, Trainer

    npz = tmp_path / "d3.npz"
    run_main(["decaying_turbulence_3d", "--nx", "8", "--nt", "6",
              "--nu", "1e-2", "--transform", "matmul",
              "--precision", "highest", "--out", str(npz)])
    cfg = TrainConfig(model="fno3d", npz_path=str(npz),
                      out_dir=str(tmp_path / "ckpt"), n_iters=10,
                      n_frames=6, ckpt_every=10, fno_modes=3, fno_width=6,
                      fno_project=True)
    tr = Trainer(cfg)
    tr.train(progress=False)
    tr.save(10)
    ref = tr.extrapolate()                      # (6, 4, 8, 8, 8)

    eng = InferenceEngine.from_checkpoint(str(tmp_path / "ckpt"), chunk=4)
    assert eng.nz == 8
    obs0 = np.asarray(ref[0])
    out = eng.predict(obs0, 5)                  # (6, 4, 8, 8, 8)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    # batched request agrees with single
    out_b = eng.predict(np.stack([obs0, obs0]), 2)
    np.testing.assert_allclose(out_b[0], out[:3], rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        eng.predict(np.zeros((3, 8, 8, 8), np.float32), 1)

    ext = tmp_path / "extrapolation.npy"
    np.save(ext, ref)
    eval_main(["--extrapolation", str(ext), "--npz-path", str(npz),
               "--n-frames", "4", "--json", str(tmp_path / "r.json")])
    capsys.readouterr()
    import json
    rep = json.loads((tmp_path / "r.json").read_text())
    assert set(rep["windows"]["full"]["fields"]) == {"u", "v", "w", "p"}
    assert np.isfinite(rep["windows"]["full"]["rel_l2"])
    # ckpt mode scores the engine directly
    eval_main(["--ckpt", str(tmp_path / "ckpt"), "--npz-path", str(npz)])
    assert "full" in capsys.readouterr().out
    # --physics: 3D observables (spectrum error + spectral divergence)
    eval_main(["--extrapolation", str(ext), "--npz-path", str(npz),
               "--physics", "--json", str(tmp_path / "p.json")])
    rep = json.loads((tmp_path / "p.json").read_text())
    ph = rep["physics"]
    assert np.isfinite(ph["spectrum_rel_l2"])
    # fno_project rollouts are exactly solenoidal (f32 rounding scale)
    assert ph["divergence_max_pred"] < 1e-3


@pytest.mark.slow
def test_fno3d_ensemble_trains(tmp_path):
    """EnsembleTrainer vmaps fno3d members; extrapolate stacks them."""
    from ns_tpu.cli.run_solver import main as run_main
    from ns_tpu.train.ensemble import EnsembleTrainer
    from ns_tpu.train.trainer import TrainConfig

    npz = tmp_path / "d3.npz"
    run_main(["decaying_turbulence_3d", "--nx", "8", "--nt", "6",
              "--nu", "1e-2", "--transform", "matmul",
              "--precision", "highest", "--out", str(npz)])
    cfg = TrainConfig(model="fno3d", npz_path=str(npz),
                      out_dir=str(tmp_path / "ens"), n_iters=6,
                      n_frames=6, ckpt_every=3, fno_modes=2, fno_width=4)
    tr = EnsembleTrainer(cfg, n_models=2, mesh=None)
    tr.train(progress=False)
    assert len(tr.losses) == 6 and len(tr.losses[0]) == 2
    out = tr.extrapolate()
    assert out.shape == (2, 6, 4, 8, 8, 8) and np.isfinite(out).all()
    # members differ (independent seeds)
    assert np.abs(out[0] - out[1]).max() > 0
