"""Fourier Neural Operator surrogate: learned next-step flow map.

Paper-inspired fifth surrogate family (PAPERS.md: Factorized Fourier Neural
Operators): instead of the reference's global basis expansion in time, an
FNO learns the one-step evolution operator (u,v,p)_t -> (u,v,p)_{t+1} with
spectral convolutions — truncated per-mode complex mixing of channels —
which on TPU is a batched einsum between rfft2 transforms (MXU work).

Layout: lift (1x1 conv) -> L x [spectral conv + pointwise bypass, GELU]
-> project. Complex spectral weights are stored as real/imag pairs (the
axon tunnel cannot move complex buffers). Autoregressive rollout under
lax.scan gives full-horizon extrapolation like the reference drivers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ns_tpu.models.layers import dense, dense_init

Array = jnp.ndarray


def _spectral_init(key, c_in, c_out, mx, my, scale):
    # independent weights for the positive- and negative-kx blocks (the
    # standard FNO weights1/weights2 — sharing them would tie unrelated
    # wavenumber pairs and halve spectral-mixing capacity)
    ks = jax.random.split(key, 4)
    shape = (c_in, c_out, mx, my)
    return {"lo_re": scale * jax.random.normal(ks[0], shape),
            "lo_im": scale * jax.random.normal(ks[1], shape),
            "hi_re": scale * jax.random.normal(ks[2], shape),
            "hi_im": scale * jax.random.normal(ks[3], shape)}


def _spectral_conv(wts, x: Array, mx: int, my: int) -> Array:
    """x (..., C, nx, ny) -> (..., C_out, nx, ny): per-retained-mode complex
    channel mixing; all other modes are zeroed (spectral truncation)."""
    nx, ny = x.shape[-2], x.shape[-1]
    xh = jnp.fft.rfft2(x)                       # (..., C, nx, nyh)
    W_lo = jax.lax.complex(wts["lo_re"], wts["lo_im"]).astype(xh.dtype)
    W_hi = jax.lax.complex(wts["hi_re"], wts["hi_im"]).astype(xh.dtype)
    c_out = W_lo.shape[1]

    def mix(block, Wb):
        # block (..., C, mx, my) x Wb (C, C_out, mx, my) -> (..., C_out, mx, my)
        return jnp.einsum("...ixy,ioxy->...oxy", block, Wb)

    lo = mix(xh[..., :, :mx, :my], W_lo)
    hi = mix(xh[..., :, nx - mx:, :my], W_hi)
    out = jnp.zeros(x.shape[:-3] + (c_out, nx, ny // 2 + 1), xh.dtype)
    out = out.at[..., :, :mx, :my].set(lo)
    out = out.at[..., :, nx - mx:, :my].set(hi)
    return jnp.fft.irfft2(out, s=(nx, ny))


class FNO2D:
    """Next-step operator on (..., 3, nx, ny) fields."""

    def __init__(self, nx: int, ny: int, width: int = 32, modes: int = 12,
                 depth: int = 4, channels: int = 3):
        self.nx, self.ny = nx, ny
        self.width, self.depth, self.channels = width, depth, channels
        self.mx = min(modes, nx // 2)
        self.my = min(modes, ny // 2 + 1)

    def init(self, key) -> dict:
        n_layers = self.depth
        keys = jax.random.split(key, 2 + 2 * n_layers)
        scale = 1.0 / (self.width * self.width)
        p = {
            "lift": dense_init(keys[0], self.channels + 2, self.width),
            "proj": dense_init(keys[1], self.width, self.channels),
            "spectral": [], "bypass": [],
        }
        for l in range(n_layers):
            p["spectral"].append(_spectral_init(
                keys[2 + 2 * l], self.width, self.width,
                self.mx, self.my, scale))
            p["bypass"].append(dense_init(keys[3 + 2 * l],
                                          self.width, self.width))
        return p

    def _coords(self, dtype):
        gx = jnp.linspace(0.0, 1.0, self.nx, dtype=dtype)
        gy = jnp.linspace(0.0, 1.0, self.ny, dtype=dtype)
        X = jnp.broadcast_to(gx[:, None], (self.nx, self.ny))
        Y = jnp.broadcast_to(gy[None, :], (self.nx, self.ny))
        return jnp.stack([X, Y])  # (2, nx, ny)

    def apply(self, params, x: Array) -> Array:
        """x (..., 3, nx, ny) -> next state (..., 3, nx, ny); the model
        learns the residual (identity + correction) for stable rollouts."""
        coords = jnp.broadcast_to(self._coords(x.dtype),
                                  x.shape[:-3] + (2, self.nx, self.ny))
        h = jnp.concatenate([x, coords], axis=-3)     # (..., 3+2, nx, ny)
        # channels-last for the dense ops
        h = jnp.moveaxis(h, -3, -1)
        h = dense(params["lift"], h)
        h = jnp.moveaxis(h, -1, -3)                   # (..., W, nx, ny)
        for wts, byp in zip(params["spectral"], params["bypass"]):
            s = _spectral_conv(wts, h, self.mx, self.my)
            b = jnp.moveaxis(dense(byp, jnp.moveaxis(h, -3, -1)), -1, -3)
            h = jax.nn.gelu(s + b)
        h = jnp.moveaxis(h, -3, -1)
        out = dense(params["proj"], h)
        out = jnp.moveaxis(out, -1, -3)
        return x + out

    def rollout(self, params, x0: Array, n_steps: int,
                post=None) -> Array:
        """Autoregressive extrapolation: (..., C, nx, ny) -> stacked
        (n_steps, ..., C, nx, ny). `post`, if given, maps each prediction
        back onto a constraint manifold before it is fed forward (e.g.
        divergence projection, dealias filtering — models/projection.py,
        models/vorticity.py)."""
        def body(x, _):
            x = self.apply(params, x)
            if post is not None:
                x = post(x)
            return x, x

        _, xs = jax.lax.scan(body, x0, None, length=n_steps)
        return xs
