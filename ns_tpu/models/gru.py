"""Full-field next-step GRU baseline.

Capability parity with the reference rnn.py RNN (:13-40): flattened
(u, v, p) frames (3*nx*ny) through a GRU(input -> hidden) + 2-layer MLP
head predicting the next frame. Teacher-forced training forward
(ref :24-30) vs autoregressive closed-loop `extrapolate` feeding
predictions back (ref :32-40) — the train/test mismatch is the reference's
deliberate design, preserved.

TPU design: both the teacher-forced pass and the autoregressive rollout
are lax.scan over the GRU cell; batch and hidden dims ride the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ns_tpu.models.layers import (dense, dense_init, gru_cell,
                                  gru_cell_pre, gru_init)

Array = jnp.ndarray


class FullFieldGRU:
    def __init__(self, input_dim: int, hidden_dim: int = 256):
        self.input_dim, self.hidden_dim = input_dim, hidden_dim

    def init(self, key) -> dict:
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "gru": gru_init(k1, self.input_dim, self.hidden_dim),
            "head1": dense_init(k2, self.hidden_dim, self.hidden_dim),
            "head2": dense_init(k3, self.hidden_dim, self.input_dim),
        }

    def _head(self, params, h: Array) -> Array:
        return dense(params["head2"], jax.nn.relu(dense(params["head1"], h)))

    def apply(self, params, obs_seq: Array) -> Array:
        """Teacher-forced forward: obs_seq (mb, nt, D) -> (mb, nt, D)
        (ref :24-30)."""
        mb = obs_seq.shape[0]
        h0 = jnp.zeros((mb, self.hidden_dim), obs_seq.dtype)

        # hoist the input projection out of the recurrence: one
        # (nt*mb, D) GEMM instead of nt sequential reads of the large
        # w_ih (see layers.gru_cell_pre)
        gi = obs_seq @ params["gru"]["w_ih"] + params["gru"]["b_ih"]

        def body(h, gi_t):
            h = gru_cell_pre(params["gru"], h, gi_t)
            return h, h

        _, hs = jax.lax.scan(body, h0, jnp.swapaxes(gi, 0, 1))
        out = self._head(params, hs)  # (nt, mb, D)
        return jnp.swapaxes(out, 0, 1)

    def extrapolate(self, params, obs0: Array, n_steps: int) -> Array:
        """Closed-loop rollout: obs0 (mb, D) -> (mb, n_steps, D), feeding
        each prediction back as the next input (ref :32-40; the GRU hidden
        state persists across steps exactly as there)."""
        mb = obs0.shape[0]
        h0 = jnp.zeros((mb, self.hidden_dim), obs0.dtype)

        def body(carry, _):
            h, x = carry
            h = gru_cell(params["gru"], h, x)
            y = self._head(params, h)
            return (h, y), y

        _, ys = jax.lax.scan(body, (h0, obs0), None, length=n_steps)
        return jnp.swapaxes(ys, 0, 1)
