"""Learned-basis surrogates: x(x,y,t) = sum_k w_k(t) * f_k(x,y).

Capability parity with the reference neural_spectral surrogate family:

  - BasisODE  — joint K*3 coefficient neural ODE (reference
    spectral_ode.py PDEFunc :37-97 + ODEFunc :14-34): learnable init
    coefficients ~N(0,1), MLP vector field K*3 -> 128 -> 128 -> K*3
    (ReLU/ELU, weights N(0,0.1), zero bias), K learnable basis fields
    (3, nx, ny) ~N(0,1), integrated with the RK4 recompute adjoint.
  - BasisODE2 — per-field variant: separate K-dim ODEs and basis banks for
    u, v, p (reference spectral_ode2.py PDEFunc :37-107).
  - BasisGRU  — coefficients rolled out by a GRU(K*3 -> K*3) feeding its
    own output back from a learned init vector (reference
    spectral_rnn.py PDEFunc :13-79, rnnint :36-44).

TPU design: the reference's python loop over K basis fields
(spectral_ode.py:73-79) becomes ONE einsum 'tmkc,kcxy->tmcxy' (MXU); the
time rollouts are lax.scan; the diversity penalty's pairwise loop becomes a
vectorized pairwise-distance reduction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ns_tpu.models.layers import dense, dense_init, gru_cell, gru_init
from ns_tpu.models.node import odeint_checkpoint

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# MLP vector field (reference ODEFunc, spectral_ode.py:14-34)
# ---------------------------------------------------------------------------

def mlp_field_init(key, dim: int, hidden: int = 128):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "l1": dense_init(k1, dim, hidden, w_std=0.1),
        "l2": dense_init(k2, hidden, hidden, w_std=0.1),
        "l3": dense_init(k3, hidden, dim, w_std=0.1),
    }


def mlp_field_apply(params, z: Array) -> Array:
    z = jax.nn.relu(dense(params["l1"], z))
    z = jax.nn.elu(dense(params["l2"], z))
    return dense(params["l3"], z)


# ---------------------------------------------------------------------------
# BasisODE (joint K*3 system)
# ---------------------------------------------------------------------------

class BasisODE:
    """Joint basis-expansion neural-ODE surrogate (ref spectral_ode.py)."""

    def __init__(self, K: int, nx: int, ny: int, method: str = "RK4"):
        self.K, self.nx, self.ny, self.method = K, nx, ny, method

    def init(self, key) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "init_coeffs": jax.random.normal(k1, (self.K * 3,)),
            "field": mlp_field_init(k2, self.K * 3),
            "basis": jax.random.normal(k3, (self.K, 3, self.nx, self.ny)),
        }

    def apply(self, params, grid0: Array, nt: int) -> Array:
        """grid0 (mb, 3, nx, ny) -> prediction (nt, mb, 3, nx, ny).
        grid0 fixes the batch size only (the reference likewise ignores its
        values, spectral_ode.py:62-81)."""
        mb = grid0.shape[0]
        func = lambda t, z: mlp_field_apply(params["field"], z)
        z0 = jnp.tile(params["init_coeffs"], (mb, 1))
        coeff = odeint_checkpoint(func, z0, nt, self.method)  # (nt, mb, K*3)
        coeff = coeff.reshape(nt, mb, self.K, 3)
        return jnp.einsum("tmkc,kcxy->tmcxy", coeff, params["basis"])

    def diversity_penalty(self, params) -> Array:
        return diversity_penalty(params["basis"].reshape(self.K, -1))


# ---------------------------------------------------------------------------
# BasisODE2 (separate u/v/p systems, ref spectral_ode2.py:37-107)
# ---------------------------------------------------------------------------

class BasisODE2:
    def __init__(self, K: int, nx: int, ny: int, method: str = "RK4"):
        self.K, self.nx, self.ny, self.method = K, nx, ny, method

    def init(self, key) -> dict:
        keys = jax.random.split(key, 9)
        p = {}
        for i, f in enumerate(("u", "v", "p")):
            p[f] = {
                "init_coeffs": jax.random.normal(keys[3 * i], (self.K,)),
                "field": mlp_field_init(keys[3 * i + 1], self.K),
                "basis": jax.random.normal(keys[3 * i + 2],
                                           (self.K, self.nx, self.ny)),
            }
        return p

    def apply(self, params, grid0: Array, nt: int) -> Array:
        mb = grid0.shape[0]
        outs = []
        for f in ("u", "v", "p"):
            pf = params[f]
            func = lambda t, z, pf=pf: mlp_field_apply(pf["field"], z)
            z0 = jnp.tile(pf["init_coeffs"], (mb, 1))
            coeff = odeint_checkpoint(func, z0, nt, self.method)  # (nt,mb,K)
            outs.append(jnp.einsum("tmk,kxy->tmxy", coeff, pf["basis"]))
        return jnp.stack(outs, axis=2)  # (nt, mb, 3, nx, ny)


# ---------------------------------------------------------------------------
# BasisGRU (ref spectral_rnn.py:13-79)
# ---------------------------------------------------------------------------

class BasisGRU:
    def __init__(self, K: int, nx: int, ny: int):
        self.K, self.nx, self.ny = K, nx, ny

    def init(self, key) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "init_coeffs": jax.random.normal(k1, (self.K * 3,)),
            "gru": gru_init(k2, self.K * 3, self.K * 3),
            "basis": jax.random.normal(k3, (self.K, 3, self.nx, self.ny)),
        }

    def apply(self, params, grid0: Array, nt: int) -> Array:
        """GRU rollout feeding its own hidden state back as the next input
        (ref rnnint, spectral_rnn.py:36-44): x_0 = init_coeffs, h_0 = 0,
        h_t = GRU(h_{t-1}, x_t), x_{t+1} = h_t; coefficients are the h_t."""
        mb = grid0.shape[0]
        x0 = jnp.tile(params["init_coeffs"], (mb, 1))
        h0 = jnp.zeros_like(x0)

        def body(carry, _):
            h, x = carry
            h_new = gru_cell(params["gru"], h, x)
            return (h_new, h_new), h_new

        _, coeff = jax.lax.scan(body, (h0, x0), None, length=nt)
        coeff = coeff.reshape(nt, mb, self.K, 3)
        return jnp.einsum("tmkc,kcxy->tmcxy", coeff, params["basis"])

    def diversity_penalty(self, params) -> Array:
        return diversity_penalty(params["basis"].reshape(self.K, -1))


# ---------------------------------------------------------------------------
# Conv basis (the reference's alternative BasisFunc parameterization,
# spectral_ode.py:100-119 — kept in its file but unused by its drivers)
# ---------------------------------------------------------------------------

_CONV_WIDTHS = (3, 16, 32, 32, 16, 3)  # ref spectral_ode.py:106-116


def conv_basis_init(key, widths=_CONV_WIDTHS):
    """K-independent stack of 1x1 convs == per-pixel channel MLP."""
    keys = jax.random.split(key, len(widths) - 1)
    return [dense_init(k, widths[i], widths[i + 1])
            for i, k in enumerate(keys)]


def conv_basis_apply(params, grid: Array) -> Array:
    """grid (mb, 3, nx, ny) -> (mb, 3, nx, ny); 1x1 convs act on the
    channel axis (ReLU between layers, none after the last — ref :106-116)."""
    x = jnp.moveaxis(grid, 1, -1)  # (mb, nx, ny, C)
    for i, layer in enumerate(params):
        x = dense(layer, x)
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return jnp.moveaxis(x, -1, 1)


class BasisODEConv:
    """BasisODE with basis fields GENERATED from grid0 by K conv nets
    (the reference's commented-out alternative, spectral_ode.py:55-56,
    100-119) instead of free parameters."""

    def __init__(self, K: int, nx: int, ny: int, method: str = "RK4"):
        self.K, self.nx, self.ny, self.method = K, nx, ny, method

    def init(self, key) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "init_coeffs": jax.random.normal(k1, (self.K * 3,)),
            "field": mlp_field_init(k2, self.K * 3),
            "conv": [conv_basis_init(k) for k in jax.random.split(k3, self.K)],
        }

    def apply(self, params, grid0: Array, nt: int) -> Array:
        mb = grid0.shape[0]
        func = lambda t, z: mlp_field_apply(params["field"], z)
        z0 = jnp.tile(params["init_coeffs"], (mb, 1))
        coeff = odeint_checkpoint(func, z0, nt, self.method)
        coeff = coeff.reshape(nt, mb, self.K, 3)
        # basis fields from the initial grid: (K, mb, 3, nx, ny)
        fks = jnp.stack([conv_basis_apply(c, grid0) for c in params["conv"]])
        return jnp.einsum("tmkc,kmcxy->tmcxy", coeff, fks)


def diversity_penalty(W: Array) -> Array:
    """1 / sum_{i <= j} ||W_i - W_j||_2 (ref spectral_ode.py:90-97; the
    i == j terms contribute 0 exactly as in the reference's loop)."""
    diff = W[:, None, :] - W[None, :, :]
    norms = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 0.0)
    K = W.shape[0]
    iu = jnp.triu_indices(K)  # includes the diagonal, like the reference
    return 1.0 / jnp.sum(norms[iu])
