"""FNO surrogate tests."""

import jax
import jax.numpy as jnp
import numpy as np
import os

import pytest

from ns_tpu.models.fno import FNO2D
from ns_tpu.train import TrainConfig, Trainer
from tests.conftest import GOLDEN_DIR


@pytest.mark.slow
def test_fno_shapes_and_batch_polymorphism():
    model = FNO2D(16, 16, width=8, modes=4, depth=2)
    params = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16, 16)),
                    jnp.float32)
    y = model.apply(params, x)
    assert y.shape == (3, 16, 16)
    xb = jnp.stack([x, x + 1.0])
    yb = model.apply(params, xb)
    assert yb.shape == (2, 3, 16, 16)
    np.testing.assert_allclose(np.asarray(yb[0]), np.asarray(y), atol=1e-6)


def test_fno_rollout():
    model = FNO2D(12, 12, width=8, modes=4, depth=2)
    params = model.init(jax.random.PRNGKey(1))
    x0 = jnp.zeros((3, 12, 12))
    xs = model.rollout(params, x0, 5)
    assert xs.shape == (5, 3, 12, 12)
    assert np.isfinite(np.asarray(xs)).all()


@pytest.mark.slow
def test_fno_rollout_training_objective(tmp_path):
    g = np.load(os.path.join(GOLDEN_DIR, "chorin_fd_semi_implicit_nt12.npz"))
    path = tmp_path / "d.npz"
    np.savez(path, u=g["u"][:, ::4, ::4], v=g["v"][:, ::4, ::4],
             p=g["p"][:, ::4, ::4])
    cfg = TrainConfig(model="fno", npz_path=str(path),
                      out_dir=str(tmp_path / "fno_k3"), n_iters=15,
                      n_frames=10, ckpt_every=15, fno_rollout_steps=3)
    tr = Trainer(cfg)
    losses = tr.train(progress=False)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_fno_trains_on_rollout(tmp_path):
    g = np.load(os.path.join(GOLDEN_DIR, "chorin_fd_semi_implicit_nt12.npz"))
    path = tmp_path / "d.npz"
    np.savez(path, u=g["u"][:, ::4, ::4], v=g["v"][:, ::4, ::4],
             p=g["p"][:, ::4, ::4])
    cfg = TrainConfig(model="fno", npz_path=str(path),
                      out_dir=str(tmp_path / "fno"), n_iters=30,
                      n_frames=10, ckpt_every=15)
    tr = Trainer(cfg)
    losses = tr.train(progress=False)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    out = tr.extrapolate()
    assert out.shape == (12, 3, 13, 13)


@pytest.mark.slow
def test_fno_input_noise_trains_and_perturbs(tmp_path):
    """input_noise: loss still decreases; the noise stream actually changes
    the training trajectory (same seed, sigma=0 vs sigma>0 diverge), and
    sigma=0 stays bitwise on the pre-noise path (key threading is inert)."""
    g = np.load(os.path.join(GOLDEN_DIR, "chorin_fd_semi_implicit_nt12.npz"))
    path = tmp_path / "d.npz"
    np.savez(path, u=g["u"][:, ::4, ::4], v=g["v"][:, ::4, ::4],
             p=g["p"][:, ::4, ::4])

    def run(sigma, out):
        cfg = TrainConfig(model="fno", npz_path=str(path),
                          out_dir=str(tmp_path / out), n_iters=12,
                          n_frames=10, ckpt_every=12, fno_rollout_steps=2,
                          input_noise=sigma)
        tr = Trainer(cfg)
        return np.asarray(tr.train(progress=False))

    clean = run(0.0, "clean")
    clean2 = run(0.0, "clean2")
    noisy = run(0.05, "noisy")
    np.testing.assert_array_equal(clean, clean2)
    assert np.isfinite(noisy).all()
    assert noisy[-1] < noisy[0]
    assert not np.array_equal(clean, noisy)


def test_input_noise_rejects_negative(tmp_path):
    g = np.load(os.path.join(GOLDEN_DIR, "chorin_fd_semi_implicit_nt12.npz"))
    path = tmp_path / "d.npz"
    np.savez(path, u=g["u"][:, ::4, ::4], v=g["v"][:, ::4, ::4],
             p=g["p"][:, ::4, ::4])
    cfg = TrainConfig(model="fno", npz_path=str(path),
                      out_dir=str(tmp_path / "neg"), input_noise=-0.1)
    import pytest
    with pytest.raises(ValueError, match="input_noise"):
        Trainer(cfg)


@pytest.mark.slow
def test_fno_remat_matches_nonremat(tmp_path):
    """jax.checkpoint on the k-step unroll changes memory, not values."""
    g = np.load(os.path.join(GOLDEN_DIR, "chorin_fd_semi_implicit_nt12.npz"))
    path = tmp_path / "d.npz"
    np.savez(path, u=g["u"][:, ::4, ::4], v=g["v"][:, ::4, ::4],
             p=g["p"][:, ::4, ::4])

    def run(remat, out):
        cfg = TrainConfig(model="fno", npz_path=str(path),
                          out_dir=str(tmp_path / out), n_iters=8,
                          n_frames=10, ckpt_every=8, fno_rollout_steps=3,
                          fno_remat=remat)
        tr = Trainer(cfg)
        return np.asarray(tr.train(progress=False))

    np.testing.assert_allclose(run(False, "a"), run(True, "b"), rtol=1e-6)


# ---------------------------------------------------------------------------
# Transform engines: matmul-DFT twin of the fft spectral layer
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_spectral_engines_agree():
    """The matmul-DFT engine computes the identical layer to the fft one
    (retained-mode DFT GEMMs vs rfft2+mask), across even/odd grids and
    the Nyquist-column edge (my == ny//2 + 1)."""
    from ns_tpu.models.fno import (_spectral_conv_fft,
                                   _spectral_conv_matmul, _spectral_init)
    for nx, ny, modes in [(16, 16, 5), (17, 15, 5), (16, 18, 8),
                          (16, 16, 9), (32, 32, 16)]:
        mx, my = min(modes, nx // 2), min(modes, ny // 2 + 1)
        wts = _spectral_init(jax.random.PRNGKey(0), 4, 4, mx, my, 0.1)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, nx, ny),
                              jnp.float32)
        a = jax.jit(lambda w, x: _spectral_conv_fft(w, x, mx, my))(wts, x)
        b = jax.jit(lambda w, x: _spectral_conv_matmul(w, x, mx, my))(wts, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_fno_apply_engines_agree_and_checkpoints_transfer():
    """Same params through both engines -> same operator; a model built
    with transform='fft' serves a 'matmul' rollout and vice versa (the
    transform is an execution detail, not part of the checkpoint)."""
    m_f = FNO2D(24, 24, width=8, modes=10, transform="fft")
    m_m = FNO2D(24, 24, width=8, modes=10, transform="matmul")
    p = m_f.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 24, 24),
                          jnp.float32)
    ya = jax.jit(m_f.apply)(p, x)
    yb = jax.jit(m_m.apply)(p, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=2e-4, atol=1e-5)
    ra = jax.jit(lambda p, x: m_f.rollout(p, x, 4))(p, x[:1])
    rb = jax.jit(lambda p, x: m_m.rollout(p, x, 4))(p, x[:1])
    np.testing.assert_allclose(np.asarray(ra), np.asarray(rb),
                               rtol=1e-3, atol=1e-4)


def test_fno_rejects_bad_transform():
    import pytest
    with pytest.raises(ValueError, match="transform"):
        FNO2D(16, 16, transform="dft")
    with pytest.raises(ValueError, match="fno_transform"):
        TrainConfig(model="fno", fno_transform="dft")


@pytest.mark.slow
def test_dealias_engines_agree():
    """matmul dealias (two real cosine-kernel GEMMs) == masked-rfft2
    round trip, including odd grids."""
    from ns_tpu.models.vorticity import dealias_field
    for nx, ny in [(16, 16), (17, 15), (32, 48)]:
        w = jax.random.normal(jax.random.PRNGKey(0), (2, nx, ny),
                              jnp.float32)
        a = jax.jit(lambda w: dealias_field(w, engine="fft"))(w)
        b = jax.jit(lambda w: dealias_field(w, engine="matmul"))(w)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_spectral_engines_agree_odd_ny_full_band_and_f64():
    """The two remaining gc-weight edges: odd ny with my == ny//2 + 1
    (no Nyquist column exists), and float64 inputs (dtype-aware DFT
    constants — f64 through the matmul engine must stay f64-tight)."""
    from ns_tpu.models.fno import (_spectral_conv_fft,
                                   _spectral_conv_matmul, _spectral_init)
    for dtype, tol in [(jnp.float32, 2e-4), (jnp.float64, 1e-12)]:
        nx, ny, modes = 16, 15, 8           # my = min(8, 15//2+1) = 8
        mx, my = min(modes, nx // 2), min(modes, ny // 2 + 1)
        assert my == ny // 2 + 1
        wts = _spectral_init(jax.random.PRNGKey(0), 4, 4, mx, my, 0.1)
        wts = jax.tree_util.tree_map(lambda a: a.astype(dtype), wts)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, nx, ny),
                              dtype)
        a = jax.jit(lambda w, x: _spectral_conv_fft(w, x, mx, my))(wts, x)
        b = jax.jit(lambda w, x: _spectral_conv_matmul(w, x, mx, my))(wts, x)
        assert a.dtype == b.dtype == dtype
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=tol, atol=tol)


def test_dealias_rejects_bad_engine():
    from ns_tpu.models.vorticity import dealias_field

    with pytest.raises(ValueError, match="engine"):
        dealias_field(jnp.zeros((8, 8)), engine="matmull")


def test_fno_precision_knob():
    """precision='highest' is accepted end-to-end (constructor validation
    + layer plumbing); bad names are rejected at config construction."""
    from ns_tpu.models.fno import FNO2D
    from ns_tpu.train.trainer import TrainConfig

    m = FNO2D(8, 8, width=4, modes=3, channels=1, transform="matmul",
              precision="highest")
    p = m.init(jax.random.PRNGKey(0))
    out = jax.jit(m.apply)(p, jnp.zeros((1, 1, 8, 8)))
    assert out.shape == (1, 1, 8, 8)
    with pytest.raises(ValueError, match="precision"):
        FNO2D(8, 8, precision="sloppy")
    with pytest.raises(ValueError, match="fno_precision"):
        TrainConfig(model="fno", npz_path="x", out_dir="y",
                    fno_precision="sloppy")
