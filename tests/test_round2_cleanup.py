"""Round-2 cleanup coverage: exposed alternates (cg pressure mode,
basis_ode_conv trainer model), the corrected rectangular ADI sweep, the
coarsen quirk refusal, and checkpoint treedef validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.core.bc import dirichlet, neumann
from ns_tpu.solvers import chorin_fd


def cavity_bcs(dx, dy):
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
            neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
    return u_bc, v_bc, p_bc


def _chorin_run(nx, ny, **kw):
    u_bc, v_bc, p_bc = cavity_bcs(2 / (nx - 1), 2 / (ny - 1))
    z = np.zeros((nx, ny))
    sys_ = chorin_fd.NavierStokesSystem(
        z, z, z, u_bc, v_bc, p_bc, nt=5, nit=200, nx=nx, ny=ny,
        dt=1e-3, rho=1, nu=0.1, beta=1.25, dtype=jnp.float64, **kw)
    return sys_.simulate()


def test_chorin_fd_cg_pressure_matches_redblack():
    """pressure_mode='cg' solves the same Dirichlet-frame system: the
    rollouts agree to solver tolerance."""
    u1, v1, p1 = _chorin_run(33, 33, pressure_mode="redblack")
    u2, v2, p2 = _chorin_run(33, 33, pressure_mode="cg")
    assert np.abs(np.asarray(u1) - np.asarray(u2)).max() < 1e-3
    p1, p2 = np.asarray(p1), np.asarray(p2)
    # p agrees relative to its own scale (the two solvers stop at different
    # points of the same system: max|dp| < tol vs residual-norm < tol)
    assert np.abs(p1 - p2).max() < 5e-3 * max(np.abs(p1).max(), 1.0)


def test_chorin_fd_quirk_rejects_rectangular_semi_implicit():
    with pytest.raises(ValueError, match="nx == ny"):
        chorin_fd.ChorinFDConfig(nx=33, ny=17, method="semi_implicit",
                                 quirk_compat=True)


def test_chorin_fd_corrected_rectangular_semi_implicit():
    """quirk_compat=False applies the y operator along y and supports
    nx != ny."""
    u, v, p = _chorin_run(33, 17, quirk_compat=False)
    assert np.isfinite(np.asarray(u)).all()
    assert np.abs(np.asarray(u[-1])).max() <= 2.0


def test_chorin_fd_corrected_square_sweep_differs_from_quirk():
    """On square grids the corrected y-sweep (S @ B^-T) is a different
    scheme from the reference's (B^-1 @ S) — guard that the flag actually
    switches the numerics."""
    u_q, _, _ = _chorin_run(33, 33, quirk_compat=True)
    u_c, _, _ = _chorin_run(33, 33, quirk_compat=False)
    assert np.abs(np.asarray(u_q) - np.asarray(u_c)).max() > 1e-12


def test_coarsen_quirk_rejects_agg_x_lt_agg_y():
    from ns_tpu.io.coarsen import spatial_coarsen
    T, nx, ny = 2, 8, 8
    X, Y = np.meshgrid(np.linspace(0, 2, nx), np.linspace(0, 2, ny),
                       indexing="ij")
    seq = np.random.default_rng(0).normal(size=(T, nx, ny))
    with pytest.raises(IndexError):
        spatial_coarsen(X, Y, seq, seq, seq, agg_x=2, agg_y=4,
                        quirk_compat=True)
    # corrected mode handles it
    _, _, u, _, _ = spatial_coarsen(X, Y, seq, seq, seq, agg_x=2, agg_y=4,
                                    quirk_compat=False)
    assert u.shape == (T, 4, 2)


def test_checkpoint_treedef_mismatch_raises(tmp_path):
    from ns_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    state = {"a": np.zeros(3), "b": {"c": np.ones(2)}}
    path = save_checkpoint(state, str(tmp_path))
    wrong = {"a": np.zeros(3), "x": {"c": np.ones(2)}}
    with pytest.raises((ValueError, KeyError)):
        load_checkpoint(path, wrong)
    # matching template round-trips
    out = load_checkpoint(path, {"a": np.full(3, 9.0),
                                 "b": {"c": np.zeros(2)}})
    assert np.array_equal(out["a"], np.zeros(3))
    assert np.array_equal(out["b"]["c"], np.ones(2))


@pytest.mark.slow
def test_trainer_basis_ode_conv(tmp_path):
    from ns_tpu.train.trainer import TrainConfig, Trainer
    nt, nx, ny = 6, 8, 8
    rng = np.random.default_rng(0)
    npz = tmp_path / "data.npz"
    np.savez(npz, u=rng.normal(size=(nt, nx, ny)),
             v=rng.normal(size=(nt, nx, ny)),
             p=rng.normal(size=(nt, nx, ny)))
    cfg = TrainConfig(model="basis_ode_conv", npz_path=str(npz),
                      out_dir=str(tmp_path / "out"), n_iters=3, n_coeffs=2,
                      n_frames=nt, ckpt_every=3)
    tr = Trainer(cfg)
    losses = tr.train(progress=False)
    assert len(losses) == 3 and np.isfinite(losses).all()
    extrap = tr.extrapolate()
    assert extrap.shape == (nt, 3, nx, ny)


def test_trainer_fno_rollout_steps_validated(tmp_path):
    from ns_tpu.train.trainer import TrainConfig, Trainer
    nt, nx, ny = 4, 8, 8
    rng = np.random.default_rng(0)
    npz = tmp_path / "data.npz"
    np.savez(npz, u=rng.normal(size=(nt, nx, ny)),
             v=rng.normal(size=(nt, nx, ny)),
             p=rng.normal(size=(nt, nx, ny)))
    cfg = TrainConfig(model="fno", npz_path=str(npz),
                      out_dir=str(tmp_path / "out"), n_iters=1,
                      n_frames=nt, fno_rollout_steps=nt)
    with pytest.raises(ValueError, match="fno_rollout_steps"):
        Trainer(cfg)


def test_fit_initial_vorticity_chunked_dispatch():
    """The data-assimilation demo runs all its GD steps in one dispatch and
    still converges on a tiny problem."""
    from ns_tpu.solvers import spectral_periodic as sp
    from ns_tpu.solvers.diffable import fit_initial_vorticity
    cfg = sp.SpectralPeriodicConfig(nt=4, nx=16, ny=16, dt=1e-3, nu=1e-3)
    target = np.asarray(sp.taylor_green_vorticity(cfg))
    w0, losses = fit_initial_vorticity(cfg, target, nt=4, n_iters=20, lr=0.5)
    assert len(losses) == 20
    assert losses[-1] < losses[0]
