"""Spatially-sharded periodic spectral solver: transpose-based distributed
FFT under shard_map.

The 1024^2-and-beyond scale path for the Fourier family (SURVEY.md §5:
"FFT/Chebyshev transforms sharded via ... transpose-based decomposition").
Physical fields are row-sharded over the mesh axis; each 2D transform is:

    local rfft along y  ->  all_to_all transpose  ->  local fft along x

so the only inter-chip traffic is one all-to-all (ICI) per transform, and
every FFT executes on full local lines. Spectra live column-sharded (ky
chunks per shard); all spectral elementwise ops (1/k^2, i*k, dealias,
viscous factor) act on per-shard constant chunks selected by axis_index.

The rfft half-spectrum width ny//2+1 is zero-padded up to a multiple of the
shard count for the all_to_all; padded columns carry zeros end-to-end.

Numerics are identical to ns_tpu/solvers/spectral_periodic (same IF-AB2
step); validated elementwise against the unsharded rollout on a fake
8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.solvers.spectral_periodic import SpectralPeriodicConfig, _ik_mul

Array = jnp.ndarray


def _padded_width(cfg: SpectralPeriodicConfig, n_shards: int) -> int:
    nyh = cfg.ny // 2 + 1
    return ((nyh + n_shards - 1) // n_shards) * n_shards


def _host_constants(cfg: SpectralPeriodicConfig, n_shards: int):
    """Full-width padded spectral constants (host numpy), sliced per shard
    inside the kernel."""
    nyh = cfg.ny // 2 + 1
    nyp = _padded_width(cfg, n_shards)
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)[:, None]          # (nx, 1)
    ky = np.zeros((1, nyp))
    ky[0, :nyh] = np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny)
    k2 = kx**2 + ky**2
    with np.errstate(divide="ignore"):
        inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    visc = np.exp(-cfg.nu * k2 * cfg.dt)
    mask_y = np.zeros(nyp, bool)
    if cfg.dealias:
        mask_x = np.abs(kx[:, 0]) < cfg.nx / 3.0
        mask_y[:nyh] = np.abs(
            np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny)) < cfg.ny / 3.0
    else:
        mask_x = np.ones(cfg.nx, bool)
        mask_y[:nyh] = True
    mask = mask_x[:, None] & mask_y[None, :]
    rdt = cfg.real_dtype
    return dict(kx=jnp.asarray(kx, rdt), ky=jnp.asarray(ky, rdt),
                inv_k2=jnp.asarray(inv_k2, rdt), visc=jnp.asarray(visc, rdt),
                mask=jnp.asarray(mask), nyh=nyh, nyp=nyp)


def make_sharded_rollout(cfg: SpectralPeriodicConfig, mesh: Mesh,
                         axis: str = "x"):
    """Build (rollout_fn, physical_sharding). rollout_fn maps a row-sharded
    physical vorticity (nx, ny) to the final row-sharded vorticity after
    cfg.nt IF-AB2 steps."""
    n = mesh.shape[axis]
    if cfg.nx % n:
        raise ValueError(f"nx={cfg.nx} not divisible by {n} shards")
    C = _host_constants(cfg, n)
    nyh, nyp = C["nyh"], C["nyp"]
    cp = nyp // n          # spectral columns per shard
    bx = cfg.nx // n       # physical rows per shard
    dt = cfg.dt

    def chunk(full: Array) -> Array:
        """Slice this shard's ky-chunk of a (nx|1, nyp) constant."""
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(full, i * cp, cp, axis=1)

    def fwd(w_local: Array) -> Array:
        """(bx, ny) real -> (nx, cp) complex column-sharded spectrum."""
        a = jnp.fft.rfft(w_local, axis=1)                      # (bx, nyh)
        a = jnp.pad(a, ((0, 0), (0, nyp - nyh)))               # (bx, nyp)
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0,
                               tiled=True)                     # (nx, cp)
        return jnp.fft.fft(a, axis=0)

    def inv(s: Array) -> Array:
        """(nx, cp) complex -> (bx, ny) real."""
        a = jnp.fft.ifft(s, axis=0)                            # (nx, cp)
        a = jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=1,
                               tiled=True)                     # (bx, nyp)
        return jnp.fft.irfft(a[:, :nyh], n=cfg.ny, axis=1)

    def block_rollout(w0_local: Array) -> Array:
        kx = C["kx"]
        ky_c = chunk(C["ky"])
        inv_k2_c = chunk(C["inv_k2"])
        visc_c = chunk(C["visc"])
        mask_c = chunk(C["mask"].astype(jnp.int8)) > 0

        def nonlinear(w_hat):
            w_hat = jnp.where(mask_c, w_hat, 0.0)
            psi = w_hat * inv_k2_c
            u = inv(_ik_mul(ky_c, psi))
            v = inv(-_ik_mul(kx, psi))
            wx = inv(_ik_mul(kx, w_hat))
            wy = inv(_ik_mul(ky_c, w_hat))
            N = -fwd(u * wx + v * wy)
            return jnp.where(mask_c, N, 0.0)

        w_hat0 = fwd(w0_local)
        N0 = nonlinear(w_hat0)

        def body(carry, _):
            w_hat, N_prev = carry
            N = nonlinear(w_hat)
            w_new = visc_c * w_hat + dt * (1.5 * visc_c * N
                                           - 0.5 * visc_c * visc_c * N_prev)
            return (w_new, N), None

        (w_hat, _), _ = jax.lax.scan(body, (w_hat0, N0), None, length=cfg.nt)
        return inv(w_hat)

    sharded = jax.shard_map(block_rollout, mesh=mesh,
                            in_specs=P(axis, None), out_specs=P(axis, None))
    rollout = jax.jit(sharded)
    return rollout, NamedSharding(mesh, P(axis, None))
