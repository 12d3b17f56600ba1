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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.solvers.spectral_periodic import (SpectralPeriodicConfig,
                                              _forcing_hat_np, _ik_mul)

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
    out = dict(kx=jnp.asarray(kx, rdt), ky=jnp.asarray(ky, rdt),
               inv_k2=jnp.asarray(inv_k2, rdt), visc=jnp.asarray(visc, rdt),
               mask=jnp.asarray(mask), nyh=nyh, nyp=nyp)
    f_hat = _forcing_hat_np(cfg)
    if f_hat is not None:
        fp = np.zeros((cfg.nx, nyp), np.complex128)
        fp[:, :nyh] = f_hat                  # pad columns stay exact zeros
        out["f_re"] = jnp.asarray(fp.real, rdt)
        out["f_im"] = jnp.asarray(fp.imag, rdt)
    return out


def _make_fft_pieces(cfg: SpectralPeriodicConfig, mesh: Mesh, axis: str):
    """Shared machinery of the distributed-FFT entry points: transposed
    transforms, per-shard constants, the masked nonlinear term and the
    IF-AB2 step."""
    n = mesh.shape[axis]
    if cfg.nx % n:
        raise ValueError(f"nx={cfg.nx} not divisible by {n} shards")
    C = _host_constants(cfg, n)
    nyh, nyp = C["nyh"], C["nyp"]
    cp = nyp // n          # spectral columns per shard
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

    def consts():
        c = dict(kx=C["kx"], ky=chunk(C["ky"]),
                 inv_k2=chunk(C["inv_k2"]), visc=chunk(C["visc"]),
                 mask=chunk(C["mask"].astype(jnp.int8)) > 0)
        if "f_re" in C:
            c["f_re"], c["f_im"] = chunk(C["f_re"]), chunk(C["f_im"])
        return c

    def nonlinear(w_hat, c):
        w_hat = jnp.where(c["mask"], w_hat, 0.0)
        psi = w_hat * c["inv_k2"]
        u = inv(_ik_mul(c["ky"], psi))
        v = inv(-_ik_mul(c["kx"], psi))
        wx = inv(_ik_mul(c["kx"], w_hat))
        wy = inv(_ik_mul(c["ky"], w_hat))
        N = -fwd(u * wx + v * wy)
        if "f_re" in c:  # constant body forcing rides the advective RHS
            N = N + jax.lax.complex(c["f_re"], c["f_im"])
        return jnp.where(c["mask"], N, 0.0)

    def step(carry, c):
        w_hat, N_prev = carry
        N = nonlinear(w_hat, c)
        E = c["visc"]
        w_new = E * w_hat + dt * (1.5 * E * N - 0.5 * E * E * N_prev)
        return (w_new, N), w_new

    return dict(fwd=fwd, inv=inv, consts=consts, nonlinear=nonlinear,
                step=step)


def make_sharded_rollout(cfg: SpectralPeriodicConfig, mesh: Mesh,
                         axis: str = "x"):
    """Build (rollout_fn, physical_sharding). rollout_fn maps a row-sharded
    physical vorticity (nx, ny) to the final row-sharded vorticity after
    cfg.nt IF-AB2 steps."""
    K = _make_fft_pieces(cfg, mesh, axis)

    def block_rollout(w0_local: Array) -> Array:
        c = K["consts"]()
        w_hat0 = K["fwd"](w0_local)
        N0 = K["nonlinear"](w_hat0, c)

        def body(carry, _):
            carry, _ = K["step"](carry, c)
            return carry, None

        (w_hat, _), _ = jax.lax.scan(body, (w_hat0, N0), None, length=cfg.nt)
        return K["inv"](w_hat)

    sharded = jax.shard_map(block_rollout, mesh=mesh,
                            in_specs=P(axis, None), out_specs=P(axis, None))
    rollout = jax.jit(sharded)
    return rollout, NamedSharding(mesh, P(axis, None))


def make_sharded_simulate(cfg: SpectralPeriodicConfig, mesh: Mesh,
                          axis: str = "x"):
    """(simulate, physical_sharding) for the distributed-FFT path:
    simulate maps row-sharded physical vorticity to the STACKED
    (nt, nx, ny) vorticity rollout (row-sharded per frame) — the stacked
    counterpart of make_sharded_rollout's final-state contract."""
    K = _make_fft_pieces(cfg, mesh, axis)

    def block_simulate(w0_local: Array) -> Array:
        c = K["consts"]()
        w_hat0 = K["fwd"](w0_local)
        N0 = K["nonlinear"](w_hat0, c)

        def body(carry, _):
            carry, w_new = K["step"](carry, c)
            return carry, K["inv"](w_new)

        _, w_seq = jax.lax.scan(body, (w_hat0, N0), None, length=cfg.nt)
        return w_seq

    sharded = jax.shard_map(block_simulate, mesh=mesh,
                            in_specs=P(axis, None),
                            out_specs=P(None, axis, None))
    return jax.jit(sharded), NamedSharding(mesh, P(axis, None))


# ---------------------------------------------------------------------------
# Distributed compact matmul-DFT path
# ---------------------------------------------------------------------------
#
# The record single-chip path (solvers/spectral_periodic.py compact_spectrum:
# dealias-truncated DFT as MXU matmuls) sharded over a mesh axis. Layouts:
#
#   physical  (nx, ny)   row-sharded    -> (bx, ny) per shard
#   spectral  (Rx, kyc)  column-sharded -> (Rx, cp) per shard (ky chunks,
#                                          kyc zero-padded to n*cp)
#
# forward:  local (bx,ny) @ Fy_t^T -> (bx,kyc) -> pad -> all_to_all
#           -> (nx,cp) -> Fx_t @ . -> (Rx,cp)
# inverse:  Fxi_t @ (Rx,cp) -> (nx,cp) -> all_to_all -> (bx,kycp)
#           -> drop pad -> @ B_t -> (bx,ny)
#
# so each transform is two local MXU matmuls + ONE all_to_all (ICI), same
# skeleton as the FFT path above but with the truncated DFT matrices. The
# four inverse transforms of the nonlinear term ride one BATCHED inverse
# (stacked (4, Rx, cp)): bigger matmuls, one collective for all four.


def _compact_dft_split(cfg: SpectralPeriodicConfig):
    """Truncated DFT matrices as (real, imag) device pairs (complex buffers
    never cross host->device on the axon tunnel)."""
    from ns_tpu.solvers.spectral_periodic import _compact_meta, _dft_constants
    M = _dft_constants(cfg)
    rows, kxc, n_neg, kyc = _compact_meta(cfg)
    f = np.float32 if cfg.dtype == "float32" else np.float64
    split = lambda Mt: (jnp.asarray(Mt.real.astype(f)),
                        jnp.asarray(Mt.imag.astype(f)))
    Fx = M["Fx"][0] + 1j * M["Fx"][1]
    Fx_inv = M["Fx_inv"][0] + 1j * M["Fx_inv"][1]
    Fy = M["Fy"][0] + 1j * M["Fy"][1]
    B = M["B"][0] + 1j * M["B"][1]
    return dict(Fx_t=split(Fx[rows, :]), Fxi_t=split(Fx_inv[:, rows]),
                Fy_t=split(Fy[:kyc, :]), B_t=split(B[:kyc, :]),
                rows=rows, kyc=kyc)


def _compact_pad_constants(cfg: SpectralPeriodicConfig, n_shards: int):
    """Spectral constants on the (Rx, kycp) ky-padded compact layout; pad
    columns carry exact zeros in inv_k2/visc so padded modes stay zero
    through the whole rollout."""
    from ns_tpu.solvers.spectral_periodic import _compact_meta
    rows, kxc, n_neg, kyc = _compact_meta(cfg)
    kycp = ((kyc + n_shards - 1) // n_shards) * n_shards
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)[rows][:, None]
    ky = np.zeros((1, kycp))
    ky[0, :kyc] = np.fft.rfftfreq(cfg.ny, d=1.0 / cfg.ny)[:kyc]
    k2 = kx * kx + ky * ky
    with np.errstate(divide="ignore"):
        inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    visc = np.exp(-cfg.nu * k2 * cfg.dt)
    pad = np.arange(kycp)[None, :] >= kyc
    inv_k2 = np.where(pad, 0.0, inv_k2)
    visc = np.where(pad, 0.0, visc)
    rdt = cfg.real_dtype
    out = dict(kx=jnp.asarray(kx, rdt), ky=jnp.asarray(ky, rdt),
               inv_k2=jnp.asarray(inv_k2, rdt),
               visc=jnp.asarray(visc, rdt), kyc=kyc, kycp=kycp)
    f_hat = _forcing_hat_np(cfg)
    if f_hat is not None:
        f_c = np.concatenate([f_hat[:kxc, :kyc],
                              f_hat[cfg.nx - n_neg:, :kyc]], axis=0)
        fp = np.zeros((len(rows), kycp), np.complex128)
        fp[:, :kyc] = f_c                    # pad columns stay exact zeros
        out["f_re"] = jnp.asarray(fp.real, rdt)
        out["f_im"] = jnp.asarray(fp.imag, rdt)
    return out


def make_sharded_compact(cfg: SpectralPeriodicConfig, mesh: Mesh,
                         axis: str = "x"):
    """Sharded compact-DFT machinery: returns a dict of pieces used by the
    rollout/simulate entry points below (and by tests).

    Requires cfg.transform='matmul' and cfg.dealias (the compact layout IS
    the 2/3-rule truncation — solvers/spectral_periodic.py:209-233)."""
    if cfg.transform != "matmul" or not cfg.dealias:
        raise ValueError("sharded compact path needs transform='matmul' "
                         "and dealias=True")
    n = mesh.shape[axis]
    if cfg.nx % n:
        raise ValueError(f"nx={cfg.nx} not divisible by {n} shards")
    D = _compact_dft_split(cfg)
    C = _compact_pad_constants(cfg, n)
    kyc, kycp = C["kyc"], C["kycp"]
    cp = kycp // n
    bx = cfg.nx // n
    prec = cfg.matmul_precision
    mm = lambda a, b: jnp.matmul(a, b, precision=prec)
    cplx = lambda pair: jax.lax.complex(pair[0], pair[1])

    def chunk(full: Array) -> Array:
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(full, i * cp, cp, axis=1)

    def fwd(w_local: Array) -> Array:
        """(..., bx, ny) real -> (..., Rx, cp) column-sharded spectrum."""
        t = mm(w_local.astype(cfg.complex_dtype), cplx(D["Fy_t"]).T)
        t = jnp.pad(t, [(0, 0)] * (t.ndim - 1) + [(0, kycp - kyc)])
        t = jax.lax.all_to_all(t, axis, split_axis=t.ndim - 1,
                               concat_axis=t.ndim - 2, tiled=True)
        return mm(cplx(D["Fx_t"]), t)

    def inv(z: Array) -> Array:
        """(..., Rx, cp) -> (..., bx, ny) real; batched over leading dims
        (the 4 nonlinear-term transforms stack here)."""
        a = mm(cplx(D["Fxi_t"]), z)                    # (..., nx, cp)
        a = jax.lax.all_to_all(a, axis, split_axis=a.ndim - 2,
                               concat_axis=a.ndim - 1, tiled=True)
        return mm(a[..., :kyc], cplx(D["B_t"])).real   # (..., bx, ny)

    def nonlinear(w_hat, kx, ky_c, inv_k2_c):
        psi = w_hat * inv_k2_c
        # one batched inverse for u, v, w_x, w_y: (4, Rx, cp)
        stack = jnp.stack([_ik_mul(ky_c, psi), -_ik_mul(kx, psi),
                           _ik_mul(kx, w_hat), _ik_mul(ky_c, w_hat)])
        u, v, wx, wy = inv(stack)
        N = -fwd(u * wx + v * wy)
        if "f_re" in C:  # constant body forcing rides the advective RHS
            N = N + cplx((chunk(C["f_re"]), chunk(C["f_im"])))
        return N

    def step(carry, kx, ky_c, inv_k2_c, visc_c):
        w_hat, N_prev = carry
        N = nonlinear(w_hat, kx, ky_c, inv_k2_c)
        w_new = visc_c * w_hat + cfg.dt * (1.5 * visc_c * N
                                           - 0.5 * visc_c * visc_c * N_prev)
        return (w_new, N), w_new

    return dict(C=C, D=D, fwd=fwd, inv=inv, nonlinear=nonlinear, step=step,
                chunk=chunk, cp=cp, bx=bx, mm=mm, cplx=cplx)


def make_sharded_compact_rollout(cfg: SpectralPeriodicConfig, mesh: Mesh,
                                 axis: str = "x",
                                 ens_axis: Optional[str] = None):
    """(rollout, physical_sharding): rollout maps row-sharded physical
    vorticity (nx, ny) -> final row-sharded vorticity after cfg.nt compact
    IF-AB2 steps — the distributed form of rollout_final_compact.

    With `ens_axis`, the input carries a LEADING batch axis sharded
    data-parallel over that mesh axis (the north-star topology: batch-64
    ensembles x spatial rows on a 2D mesh) — every transform matmul gains a
    batch dim (bigger GEMMs) and the spatial all_to_all stays confined to
    the `axis` ring; the ensemble axis never communicates in the hot loop.
    """
    K = make_sharded_compact(cfg, mesh, axis)
    C = K["C"]

    def block(w0_local):
        kx = C["kx"]
        ky_c, inv_k2_c, visc_c = (K["chunk"](C["ky"]),
                                  K["chunk"](C["inv_k2"]),
                                  K["chunk"](C["visc"]))
        w_hat0 = K["fwd"](w0_local.astype(cfg.real_dtype))
        N0 = K["nonlinear"](w_hat0, kx, ky_c, inv_k2_c)

        def body(carry, _):
            carry, _ = K["step"](carry, kx, ky_c, inv_k2_c, visc_c)
            return carry, None

        (w_hat, _), _ = jax.lax.scan(body, (w_hat0, N0), None, length=cfg.nt)
        return K["inv"](w_hat)

    spec = P(ens_axis, axis, None) if ens_axis else P(axis, None)
    sharded = jax.shard_map(block, mesh=mesh, in_specs=spec, out_specs=spec)
    return jax.jit(sharded), NamedSharding(mesh, spec)


def make_sharded_compact_simulate(cfg: SpectralPeriodicConfig, mesh: Mesh,
                                  axis: str = "x", fields: str = "w"):
    """(simulate, physical_sharding): simulate maps row-sharded physical
    vorticity to STACKED rollouts — fields='w' returns (nt, nx, ny)
    vorticity; fields='uvp' returns the (u, v, p) triple of (nt, nx, ny)
    arrays (the reference simulate() contract, with pressure recovered via
    the spectral Poisson solve, solvers/spectral_periodic.py:436-452).
    Outputs stay row-sharded over the mesh."""
    if fields not in ("w", "uvp"):
        raise ValueError("fields must be 'w'|'uvp'")
    K = make_sharded_compact(cfg, mesh, axis)
    C = K["C"]
    rho = cfg.rho

    def block(w0_local):
        kx = C["kx"]
        ky_c, inv_k2_c, visc_c = (K["chunk"](C["ky"]),
                                  K["chunk"](C["inv_k2"]),
                                  K["chunk"](C["visc"]))
        w_hat0 = K["fwd"](w0_local.astype(cfg.real_dtype))
        N0 = K["nonlinear"](w_hat0, kx, ky_c, inv_k2_c)

        def out(w_hat):
            if fields == "w":
                return K["inv"](w_hat)
            psi = w_hat * inv_k2_c
            u_hat = _ik_mul(ky_c, psi)
            v_hat = -_ik_mul(kx, psi)
            u, v, ux, uy, vx, vy = K["inv"](jnp.stack([
                u_hat, v_hat,
                _ik_mul(kx, u_hat), _ik_mul(ky_c, u_hat),
                _ik_mul(kx, v_hat), _ik_mul(ky_c, v_hat)]))
            rhs = -rho * (ux * ux + 2.0 * uy * vx + vy * vy)
            p = K["inv"](-K["fwd"](rhs) * inv_k2_c)
            return u, v, p

        def body(carry, _):
            carry, w_new = K["step"](carry, kx, ky_c, inv_k2_c, visc_c)
            return carry, out(w_new)

        _, seqs = jax.lax.scan(body, (w_hat0, N0), None, length=cfg.nt)
        return seqs

    out_spec = (P(None, axis, None) if fields == "w"
                else (P(None, axis, None),) * 3)
    sharded = jax.shard_map(block, mesh=mesh,
                            in_specs=P(axis, None), out_specs=out_spec)
    return jax.jit(sharded), NamedSharding(mesh, P(axis, None))
