"""Parameter-pytree building blocks for the surrogate models.

Plain pytrees + pure functions (no Module framework): every model is
`init(key, ...) -> params` and `apply(params, ...) -> out`, so train steps
jit/grad/shard_map cleanly and the time loops are lax.scan.

The GRU cell follows the standard gate equations (the same ones
torch.nn.GRU implements, which the reference's surrogates rely on —
rnn.py:18, spectral_rnn.py:30):

    r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
    z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
    n = tanh  (x W_in + b_in + r * (h W_hn + b_hn))
    h' = (1 - z) * n + z * h

with uniform(-1/sqrt(H), 1/sqrt(H)) init like torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def dense_init(key, in_dim: int, out_dim: int, w_std: float | None = None,
               dtype=jnp.float32):
    """Dense layer params. w_std=None -> torch Linear default
    (uniform +-1/sqrt(in_dim)); else N(0, w_std) with zero bias (the
    reference's ODEFunc init, spectral_ode.py:28-31)."""
    kw, kb = jax.random.split(key)
    if w_std is None:
        bound = 1.0 / jnp.sqrt(in_dim)
        w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
        b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    else:
        w = w_std * jax.random.normal(kw, (in_dim, out_dim), dtype)
        b = jnp.zeros((out_dim,), dtype)
    return {"w": w, "b": b}


def dense(params, x: Array) -> Array:
    return x @ params["w"] + params["b"]


def gru_init(key, in_dim: int, hidden: int, dtype=jnp.float32):
    bound = 1.0 / jnp.sqrt(hidden)
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -bound, bound)
    return {
        "w_ih": u(ks[0], (in_dim, 3 * hidden)),
        "w_hh": u(ks[1], (hidden, 3 * hidden)),
        "b_ih": u(ks[2], (3 * hidden,)),
        "b_hh": u(ks[3], (3 * hidden,)),
    }


def gru_cell(params, h: Array, x: Array) -> Array:
    """One GRU step; h (..., H), x (..., in_dim) -> h' (..., H)."""
    gi = x @ params["w_ih"] + params["b_ih"]
    return gru_cell_pre(params, h, gi)


def gru_cell_pre(params, h: Array, gi: Array) -> Array:
    """GRU step from a PRECOMPUTED input projection gi = x@w_ih + b_ih.

    The input projection is independent of the recurrence, so a
    teacher-forced pass can hoist it out of the scan as ONE batched
    (nt*mb, in)x(in, 3H) GEMM — the w_ih weight (48 MB at the rnn
    baseline's 7803x1536 f32) is then read from HBM once instead of
    once per sequential step. The recurrent body left inside the scan
    touches only the (H, 3H) w_hh. Numerics are the same matmul on the
    same operands, merely batched.
    """
    H = params["w_hh"].shape[0]
    gh = h @ params["w_hh"] + params["b_hh"]
    i_r, i_z, i_n = gi[..., :H], gi[..., H:2 * H], gi[..., 2 * H:]
    h_r, h_z, h_n = gh[..., :H], gh[..., H:2 * H], gh[..., 2 * H:]
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h
