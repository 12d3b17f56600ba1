"""Tests for the surrogate models and ODE runtime."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ns_tpu.models import basis, gru, node


def test_odeint_matches_exact_exponential():
    """dz/dt = -z, z(0)=1 over t in [0,1]: RK4 on nt=50 steps ~ e^{-t}."""
    func = lambda t, z: -z
    z0 = jnp.ones((1,), jnp.float64)
    for method, tol in (("Euler", 1e-2), ("RK2", 1e-4), ("RK4", 1e-8)):
        zs = node.odeint(func, z0, 50, method)
        t = (np.arange(50) + 1) / 50.0
        np.testing.assert_allclose(np.asarray(zs)[:, 0], np.exp(-t), atol=tol)


def test_odeint_checkpoint_same_values_and_grads():
    """The recompute adjoint must change memory, not math (anode
    adjoint.py:41-70 semantics)."""
    w = jnp.asarray(0.7, jnp.float64)

    def rollout_sum(w, use_ckpt):
        func = lambda t, z: -w * z
        z0 = jnp.ones((2,), jnp.float64)
        f = node.odeint_checkpoint if use_ckpt else node.odeint
        return jnp.sum(f(func, z0, 20, "RK4"))

    v1, g1 = jax.value_and_grad(lambda w: rollout_sum(w, False))(w)
    v2, g2 = jax.value_and_grad(lambda w: rollout_sum(w, True))(w)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-12)
    np.testing.assert_allclose(float(g1), float(g2), rtol=1e-12)


def test_odeint_bad_method():
    with pytest.raises(ValueError):
        node.odeint(lambda t, z: z, jnp.ones(1), 5, "RK7")


@pytest.mark.slow
@pytest.mark.parametrize("cls", [basis.BasisODE, basis.BasisODE2, basis.BasisGRU])
def test_basis_models_shapes_and_grads(cls):
    K, nx, ny, nt, mb = 4, 8, 9, 6, 2
    model = cls(K, nx, ny)
    params = model.init(jax.random.PRNGKey(0))
    grid0 = jnp.zeros((mb, 3, nx, ny))
    pred = model.apply(params, grid0, nt)
    assert pred.shape == (nt, mb, 3, nx, ny)
    assert np.isfinite(np.asarray(pred)).all()

    def loss(p):
        return jnp.sum(model.apply(p, grid0, nt) ** 2)

    grads = jax.grad(loss)(params)
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0.0


def test_diversity_penalty_matches_pairwise_loop():
    W = jnp.asarray(np.random.default_rng(0).normal(size=(5, 7)))
    got = float(basis.diversity_penalty(W))
    acc = 0.0
    for i in range(5):
        for j in range(i, 5):  # reference includes i == j (adds 0)
            acc += float(np.linalg.norm(np.asarray(W[i] - W[j])))
    np.testing.assert_allclose(got, 1.0 / acc, rtol=1e-6)


@pytest.mark.slow
def test_fullfield_gru_teacher_forced_and_extrapolate():
    D, H, mb, nt = 12, 16, 3, 5
    model = gru.FullFieldGRU(D, H)
    params = model.init(jax.random.PRNGKey(1))
    seq = jax.random.normal(jax.random.PRNGKey(2), (mb, nt, D))
    out = model.apply(params, seq)
    assert out.shape == (mb, nt, D)
    ex = model.extrapolate(params, seq[:, 0], 7)
    assert ex.shape == (mb, 7, D)
    assert np.isfinite(np.asarray(ex)).all()


def test_gru_cell_matches_torch():
    """Gate-equation parity with torch.nn.GRUCell on identical weights."""
    torch = pytest.importorskip("torch")
    from ns_tpu.models.layers import gru_cell

    D, H, mb = 5, 7, 3
    tcell = torch.nn.GRUCell(D, H)
    params = {
        "w_ih": jnp.asarray(tcell.weight_ih.detach().numpy().T),
        "w_hh": jnp.asarray(tcell.weight_hh.detach().numpy().T),
        "b_ih": jnp.asarray(tcell.bias_ih.detach().numpy()),
        "b_hh": jnp.asarray(tcell.bias_hh.detach().numpy()),
    }
    rng = np.random.default_rng(0)
    x = rng.normal(size=(mb, D)).astype(np.float32)
    h = rng.normal(size=(mb, H)).astype(np.float32)
    want = tcell(torch.from_numpy(x), torch.from_numpy(h)).detach().numpy()
    got = np.asarray(gru_cell(params, jnp.asarray(h), jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_reference_named_odesolver_entries():
    """odesolver/odesolver_adjoint mirror the ANODE entry signatures
    (options={'Nt':..,'method':..}) and agree with odeint, including the
    adjoint's gradients."""
    from ns_tpu.models.node import (odeint, odesolver, odesolver_adjoint)

    def f(t, y):
        return -y + jnp.sin(3.0 * t)

    z0 = jnp.asarray([1.0, -0.5])
    opts = {"Nt": 16, "method": "RK4"}
    np.testing.assert_allclose(np.asarray(odesolver(f, z0, opts)),
                               np.asarray(odeint(f, z0, 16)), atol=0)

    def loss(z):
        return jnp.sum(odesolver_adjoint(f, z, opts)[-1] ** 2)

    def loss_plain(z):
        return jnp.sum(odeint(f, z, 16)[-1] ** 2)

    g1 = jax.grad(loss)(z0)
    g2 = jax.grad(loss_plain)(z0)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-12)
