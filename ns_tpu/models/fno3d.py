"""3D Fourier Neural Operator: learned next-step flow map for 3D DNS data.

The 3D counterpart of models/fno.py (sixth surrogate family; no reference
counterpart — the reference is 2D-only). The operator maps
(u, v, w, p)_t -> (u, v, w, p)_{t+1} on (..., 4, nx, ny, nz) fields with
per-retained-mode complex channel mixing between spectral transforms.

Retained block: kx in [0,mx) u [nx-mx,nx), ky in [0,my) u [ny-my,ny),
kz in [0,mz) (rfft half-axis) — ONE weight tensor over the concatenated
(2mx, 2my, mz) block (equivalent to the classical four corner-block
weights; the concatenated row sets make them one einsum). Two engines
compute the identical layer, like the 2D family:

  'fft'    rfftn + corner gather/scatter
  'matmul' truncated-mode DFT GEMMs that compute ONLY the retained block
           (the solver's matmul-DFT insight; on TPU the emulated FFT runs
           far off the roofline — RESULTS.md 3D engine table)

Complex weights/constants live as real/imag pairs; complex is formed only
inside traced code (axon transfer + MLIR-constant-embedding hazards,
solvers/spectral3d.py make_compact_transforms note).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.models.fno import resolve_precision
from ns_tpu.models.layers import dense, dense_init

Array = jnp.ndarray

# XLA's emulated TPU FFT loses to the truncated-mode DFT GEMMs at every
# single-chip 3D size measured (RESULTS.md: 2.5-5.6x at 64^3-512^3)
_MATMUL_MAX_SIDE = 512


def _rows(n: int, m: int) -> np.ndarray:
    return np.concatenate([np.arange(m), np.arange(n - m, n)])


@lru_cache(maxsize=16)
def _dft_mats3d(nx: int, ny: int, nz: int, mx: int, my: int, mz: int,
                dtype: str = "float32"):
    """Truncated per-axis DFT matrices of the retained (2mx, 2my, mz)
    block, as (real, imag) host pairs. Inverse z carries the irfft
    half-spectrum weights (w=2 interior, 1 at kz=0/Nyquist) — the same
    convention as models/fno.py::_dft_mats and the solver transforms."""
    rx, ry = _rows(nx, mx), _rows(ny, my)
    a, b, c = np.arange(nx), np.arange(ny), np.arange(nz)
    j = np.arange(mz)
    fx = np.exp(-2j * np.pi * np.outer(rx, a) / nx)           # (2mx, nx)
    fy = np.exp(-2j * np.pi * np.outer(ry, b) / ny)           # (2my, ny)
    fz = np.exp(-2j * np.pi * np.outer(c, j) / nz)            # (nz, mz)
    gx = np.exp(2j * np.pi * np.outer(a, rx) / nx) / nx       # (nx, 2mx)
    gy = np.exp(2j * np.pi * np.outer(b, ry) / ny) / ny       # (ny, 2my)
    wz = np.where((j == 0) | ((nz % 2 == 0) & (j == nz // 2)), 1.0, 2.0)
    gz = (wz[:, None] * np.exp(2j * np.pi * np.outer(j, c) / nz)) / nz
    dt = np.dtype(dtype)
    ri = lambda M: (M.real.astype(dt), M.imag.astype(dt))
    return ri(fx), ri(fy), ri(fz), ri(gx), ri(gy), ri(gz)     # gz (mz, nz)


def _mix3d(block, W, prec=None):
    """Per-mode channel mixing: block (..., C, X, Y, Z) x W (C_out, C,
    X*Y*Z) -> (..., C_out, X, Y, Z), as broadcast-multiply-reduce over
    the channel axis with ALL mode axes flattened.

    Layout, not FLOPs, dictates this shape. The mixing is a tiny C x C
    map per retained mode; any dot_general formulation puts either a
    mode axis (mz ~ 8-21) or the channel pair (C ~ 24-32) on the
    128-lane minor tile, and XLA then pads every weight, gradient,
    Adam-state, and remat copy ~5-6x — measured 434 MB per 81 MB weight
    tensor at modes 21, ~19 live copies, which OOMed 64^3 training by
    4.7 GB. With (C_out, C, M) storage and an elementwise
    multiply-reduce the minor axis is M (thousands; <2% tile pad),
    every copy stays compact, and the VPU reduction is
    bandwidth-bound on the same bytes the GEMM would have read.
    `prec` is unused (no dot); kept for signature parity with the 2D
    family."""
    del prec
    m = block.shape[-3] * block.shape[-2] * block.shape[-1]
    b2 = block.reshape(block.shape[:-3] + (m,))
    out = (b2[..., None, :, :] * W).sum(axis=-2)
    return out.reshape(out.shape[:-1] + block.shape[-3:])


def _spectral_conv3d_fft(wts, x: Array, mx: int, my: int, mz: int,
                         prec=None) -> Array:
    nx, ny, nz = x.shape[-3], x.shape[-2], x.shape[-1]
    rx, ry = _rows(nx, mx), _rows(ny, my)
    xh = jnp.fft.rfftn(x, axes=(-3, -2, -1))    # (..., C, nx, ny, nzh)
    W = jax.lax.complex(wts["re"], wts["im"]).astype(xh.dtype)
    block = xh[..., rx[:, None], ry[None, :], :mz]
    mixed = _mix3d(block, W, prec)
    out = jnp.zeros(x.shape[:-4] + (W.shape[0], nx, ny, nz // 2 + 1),
                    xh.dtype)
    out = out.at[..., rx[:, None], ry[None, :], :mz].set(mixed)
    return jnp.fft.irfftn(out, s=(nx, ny, nz), axes=(-3, -2, -1))


def _spectral_conv3d_matmul(wts, x: Array, mx: int, my: int, mz: int,
                            prec=None) -> Array:
    """Identical layer; transforms are truncated-mode DFT GEMMs computing
    ONLY the retained block (z first — the axis that shrinks most — then
    y, then x; inverse in reverse with the half-spectrum-weighted gz)."""
    nx, ny, nz = x.shape[-3], x.shape[-2], x.shape[-1]
    (fxr, fxi), (fyr, fyi), (fzr, fzi), (gxr, gxi), (gyr, gyi), \
        (gzr, gzi) = _dft_mats3d(nx, ny, nz, mx, my, mz, str(x.dtype))
    ein = lambda s, a, b: jnp.einsum(s, a, b, precision=prec)
    cplx = lambda r, i: jax.lax.complex(jnp.asarray(r), jnp.asarray(i))

    # forward z: real input -> two real GEMMs, then complex y/x stages
    tr = ein("...xyz,zk->...xyk", x, jnp.asarray(fzr))
    ti = ein("...xyz,zk->...xyk", x, jnp.asarray(fzi))
    t = jax.lax.complex(tr, ti)                       # (..., C, nx, ny, mz)
    t = ein("...xyk,by->...xbk", t, cplx(fyr, fyi))   # (..., C, nx, 2my, mz)
    xh = ein("...xbk,ax->...abk", t, cplx(fxr, fxi))  # (..., C, 2mx, 2my, mz)

    W = jax.lax.complex(wts["re"], wts["im"]).astype(xh.dtype)
    mixed = _mix3d(xh, W, prec)

    z = ein("...abk,xa->...xbk", mixed, cplx(gxr, gxi))
    z = ein("...xbk,yb->...xyk", z, cplx(gyr, gyi))   # (..., C_out, nx, ny, mz)
    return (ein("...xyk,kz->...xyz", z.real, jnp.asarray(gzr))
            - ein("...xyk,kz->...xyz", z.imag, jnp.asarray(gzi)))


def _spectral_conv3d(wts, x, mx, my, mz, engine="fft", prec=None):
    if engine == "matmul":
        return _spectral_conv3d_matmul(wts, x, mx, my, mz, prec)
    return _spectral_conv3d_fft(wts, x, mx, my, mz, prec)


class FNO3D:
    """Next-step operator on (..., C, nx, ny, nz) fields (C=4: u,v,w,p)."""

    def __init__(self, nx: int, ny: int, nz: int, width: int = 24,
                 modes: int = 8, depth: int = 4, channels: int = 4,
                 transform: str = "auto", precision: str | None = None):
        if transform not in ("auto", "fft", "matmul"):
            raise ValueError(f"transform must be auto|fft|matmul, got "
                             f"{transform!r}")
        self.nx, self.ny, self.nz = nx, ny, nz
        self.width, self.depth, self.channels = width, depth, channels
        self.mx = min(modes, nx // 2)
        self.my = min(modes, ny // 2)
        self.mz = min(modes, nz // 2 + 1)
        if transform == "auto":
            transform = ("matmul" if max(nx, ny, nz) <= _MATMUL_MAX_SIDE
                         else "fft")
        self.transform = transform
        self.precision = resolve_precision(precision)

    def init(self, key) -> dict:
        keys = jax.random.split(key, 2 + 2 * self.depth)
        scale = 1.0 / (self.width * self.width)
        p = {
            "lift": dense_init(keys[0], self.channels + 3, self.width),
            "proj": dense_init(keys[1], self.width, self.channels),
            "spectral": [], "bypass": [],
        }
        # (C_out, C_in, X*Y*Z) with mode axes flattened — _mix3d's layout
        # note explains why this shape is load-bearing on TPU
        shape = (self.width, self.width,
                 2 * self.mx * 2 * self.my * self.mz)
        for l in range(self.depth):
            k1, k2 = jax.random.split(keys[2 + 2 * l])
            p["spectral"].append({"re": scale * jax.random.normal(k1, shape),
                                  "im": scale * jax.random.normal(k2, shape)})
            p["bypass"].append(dense_init(keys[3 + 2 * l],
                                          self.width, self.width))
        return p

    def _coords(self, dtype):
        gx = jnp.linspace(0.0, 1.0, self.nx, dtype=dtype)
        gy = jnp.linspace(0.0, 1.0, self.ny, dtype=dtype)
        gz = jnp.linspace(0.0, 1.0, self.nz, dtype=dtype)
        shape = (self.nx, self.ny, self.nz)
        return jnp.stack([jnp.broadcast_to(gx[:, None, None], shape),
                          jnp.broadcast_to(gy[None, :, None], shape),
                          jnp.broadcast_to(gz[None, None, :], shape)])

    def apply(self, params, x: Array) -> Array:
        """x (..., C, nx, ny, nz) -> next state; residual (identity +
        correction) for stable rollouts, like FNO2D.apply."""
        coords = jnp.broadcast_to(
            self._coords(x.dtype),
            x.shape[:-4] + (3, self.nx, self.ny, self.nz))
        h = jnp.concatenate([x, coords], axis=-4)
        h = jnp.moveaxis(h, -4, -1)
        h = dense(params["lift"], h)
        h = jnp.moveaxis(h, -1, -4)                  # (..., W, nx, ny, nz)
        for wts, byp in zip(params["spectral"], params["bypass"]):
            s = _spectral_conv3d(wts, h, self.mx, self.my, self.mz,
                                 self.transform, self.precision)
            b = jnp.moveaxis(dense(byp, jnp.moveaxis(h, -4, -1)), -1, -4)
            h = jax.nn.gelu(s + b)
        h = jnp.moveaxis(h, -4, -1)
        out = dense(params["proj"], h)
        out = jnp.moveaxis(out, -1, -4)
        return x + out

    def rollout(self, params, x0: Array, n_steps: int, post=None) -> Array:
        """Autoregressive extrapolation: (..., C, nx, ny, nz) -> stacked
        (n_steps, ...); `post` maps each fed-back prediction onto a
        constraint manifold (e.g. the exact 3D Leray projection,
        models/projection.py::project_leray3d)."""
        def body(x, _):
            x = self.apply(params, x)
            if post is not None:
                x = post(x)
            return x, x

        _, xs = jax.lax.scan(body, x0, None, length=n_steps)
        return xs
