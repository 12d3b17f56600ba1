"""Pencil-sharded 3D periodic spectral solver: transpose-based distributed
transforms under shard_map.

The scale-out path for the 3D family (ns_tpu/solvers/spectral3d.py) — and
the point of 3D: a 1024^3 velocity state (~13 GB complex f32 before
workspace) does not fit one chip, so the mesh is mandatory, not an
optimization. Decomposition (the classical slab/pencil scheme, here with
the compact matmul-DFT engine so every local stage is MXU GEMMs):

    physical  (3, nx, ny, nz)   x-sharded  -> (3, bx, ny, nz) per shard
    spectral  (3, Rx, Ry, Kzc)  ky-sharded -> (3, Rx, cp, Kzc) per shard

    forward:  local z GEMM -> local y GEMM -> pad Ry -> all_to_all
              (ky chunks out, x rows in) -> local x GEMM
    inverse:  local x GEMM -> all_to_all -> drop pad -> local y GEMM
              -> local z GEMM (real part)

so each 3D transform costs exactly ONE all_to_all (ICI) — the identical
collective budget as the 2D compact path (spectral_sharded.py:203-211),
asserted in tests/test_collectives.py. The 6 inverse transforms of the
nonlinear term (u, omega) ride one batched GEMM chain and ONE collective;
the 3 forward transforms of the Lamb vector likewise: 3 all_to_alls per
step total (inverse, forward, and one in the diagnostics-free step none —
see test_collectives for the pinned table).

Numerics are identical to the unsharded compact engine (same IF-AB2
step); validated elementwise on a fake 8-device CPU mesh. An optional
ensemble mesh axis batches independent rollouts data-parallel with zero
hot-loop communication (the north-star ensemble x spatial topology).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.solvers.spectral3d import (Spectral3DConfig, _compact_meta,
                                       _dft_constants_np, _forcing_hat_np)
from ns_tpu.solvers.spectral_periodic import _ik_mul

Array = jnp.ndarray


def _split_dev(M: np.ndarray, dtype) -> tuple:
    """Host complex matrix -> (real, imag) device pair (axon: complex
    buffers never cross host->device)."""
    f = np.float32 if dtype == "float32" else np.float64
    return (jnp.asarray(M.real.astype(f)), jnp.asarray(M.imag.astype(f)))


def _padded_chunks(n_rows: int, n_shards: int) -> int:
    return ((n_rows + n_shards - 1) // n_shards) * n_shards


def _host_constants(cfg: Spectral3DConfig, n_shards: int):
    """Spectral constants on the ky-padded compact layout (Rx, Ryp, Kzc);
    pad rows carry exact zeros in inv_k2/visc so padded modes stay zero
    through the rollout."""
    rows_x, rows_y, kzc = _compact_meta(cfg)
    Ry = len(rows_y)
    Ryp = _padded_chunks(Ry, n_shards)
    kx = np.fft.fftfreq(cfg.nx, d=1.0 / cfg.nx)[rows_x][:, None, None]
    ky = np.zeros((1, Ryp, 1))
    ky[0, :Ry, 0] = np.fft.fftfreq(cfg.ny, d=1.0 / cfg.ny)[rows_y]
    kz = np.fft.rfftfreq(cfg.nz, d=1.0 / cfg.nz)[:kzc][None, None, :]
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = np.where(k2 == 0.0, 0.0, 1.0 / np.where(k2 == 0.0, 1.0, k2))
    visc = np.exp(-cfg.nu * k2 * cfg.dt)
    pad = np.arange(Ryp)[None, :, None] >= Ry
    inv_k2 = np.where(pad, 0.0, inv_k2)
    visc = np.where(pad, 0.0, visc)
    # the true mean mode (pinned in the nonlinear term): k2 == 0 only at
    # the origin and on pad rows — pad rows are zero anyway, so the joint
    # mask is safe to use as "origin or already-zero"
    origin = (k2 == 0.0)
    rdt = cfg.real_dtype
    out = dict(kx=jnp.asarray(kx, rdt), ky=jnp.asarray(ky, rdt),
               kz=jnp.asarray(kz, rdt), inv_k2=jnp.asarray(inv_k2, rdt),
               visc=jnp.asarray(visc, rdt), origin=jnp.asarray(origin),
               Ry=Ry, Ryp=Ryp)
    f_hat = _forcing_hat_np(cfg)  # (3, Rx, Ry, kzc) in compact layout
    if f_hat is not None:
        fp = np.zeros((3, len(rows_x), Ryp, kzc), np.complex128)
        fp[:, :, :Ry, :] = f_hat             # pad rows stay exact zeros
        out["f_re"] = jnp.asarray(fp.real, rdt)
        out["f_im"] = jnp.asarray(fp.imag, rdt)
    return out


def make_sharded_compact3d(cfg: Spectral3DConfig, mesh: Mesh,
                           axis: str = "x"):
    """Sharded 3D compact-DFT machinery: transposed transforms, chunked
    constants, the projected nonlinear term and the IF-AB2 step. Requires
    cfg.transform='matmul' (the compact layout IS the 2/3 truncation)."""
    if not cfg.compact:
        raise ValueError("sharded 3D path needs transform='matmul' "
                         "(compact dealias-truncated layout)")
    n = mesh.shape[axis]
    if cfg.nx % n:
        raise ValueError(f"nx={cfg.nx} not divisible by {n} shards")
    M = _dft_constants_np(cfg)
    C = _host_constants(cfg, n)
    Ry, Ryp = C["Ry"], C["Ryp"]
    cp = Ryp // n
    D = {k: _split_dev(v, cfg.dtype) for k, v in M.items()}
    prec = cfg.matmul_precision
    ein = lambda s, a, b: jnp.einsum(s, a, b, precision=prec)
    cplx = jax.lax.complex

    def chunk(full: Array) -> Array:
        """This shard's ky-chunk of a (..., Rx|1, Ryp, Kzc|1) constant."""
        i = jax.lax.axis_index(axis)
        return jax.lax.dynamic_slice_in_dim(full, i * cp, cp,
                                            axis=full.ndim - 2)

    def fwd(w_local: Array) -> Array:
        """(..., bx, ny, nz) real -> (..., Rx, cp, Kzc) ky-sharded."""
        t = ein("...xyz,kz->...xyk", w_local.astype(cfg.complex_dtype),
                cplx(*D["Fz_t"]))
        t = ein("...xyk,by->...xbk", t, cplx(*D["Fy_t"]))
        t = jnp.pad(t, [(0, 0)] * (t.ndim - 2) + [(0, Ryp - Ry), (0, 0)])
        t = jax.lax.all_to_all(t, axis, split_axis=t.ndim - 2,
                               concat_axis=t.ndim - 3, tiled=True)
        return ein("...xbk,ax->...abk", t, cplx(*D["Fx_t"]))

    def inv(z: Array) -> Array:
        """(..., Rx, cp, Kzc) -> (..., bx, ny, nz) real; batched over
        leading dims (the 6 nonlinear-term transforms stack here)."""
        a = ein("...abk,xa->...xbk", z, cplx(*D["Fxi_t"]))
        a = jax.lax.all_to_all(a, axis, split_axis=a.ndim - 3,
                               concat_axis=a.ndim - 2, tiled=True)
        a = a[..., :Ry, :]
        a = ein("...xbk,yb->...xyk", a, cplx(*D["Fyi_t"]))
        return ein("...xyk,kz->...xyz", a, cplx(*D["Bz"])).real

    def consts():
        c = dict(kx=C["kx"], kz=C["kz"], ky=chunk(C["ky"]),
                 inv_k2=chunk(C["inv_k2"]), visc=chunk(C["visc"]),
                 origin=chunk(C["origin"].astype(jnp.int8)) > 0)
        if "f_re" in C:
            c["f_re"], c["f_im"] = chunk(C["f_re"]), chunk(C["f_im"])
        return c

    # component access at axis -4: the spectra may carry LEADING batch
    # dims (ensemble axis), so u_hat[0] would index the batch, not the
    # velocity component
    comp = lambda a, i: a[..., i, :, :, :]
    stk = lambda xs: jnp.stack(xs, axis=-4)

    def project(v_hat, c):
        """Leray projection on the chunked layout, batch-safe."""
        kx, ky, kz = c["kx"], c["ky"], c["kz"]
        kdot = (kx * comp(v_hat, 0) + ky * comp(v_hat, 1)
                + kz * comp(v_hat, 2))
        corr = kdot * c["inv_k2"]
        return stk([comp(v_hat, 0) - kx * corr,
                    comp(v_hat, 1) - ky * corr,
                    comp(v_hat, 2) - kz * corr])

    def nonlinear(u_hat, c):
        """P[FFT(u x omega)] (+ f) on the chunked layout — one batched
        inverse collective for all 6 fields, one forward for the 3 Lamb
        components (solvers/spectral3d.py nonlinear_term, distributed)."""
        kx, ky, kz = c["kx"], c["ky"], c["kz"]
        ux, uy, uz = (comp(u_hat, i) for i in range(3))
        wx = _ik_mul(ky, uz) - _ik_mul(kz, uy)
        wy = _ik_mul(kz, ux) - _ik_mul(kx, uz)
        wz = _ik_mul(kx, uy) - _ik_mul(ky, ux)
        fields = inv(jnp.concatenate([u_hat, stk([wx, wy, wz])], axis=-4))
        u1, u2, u3, w1, w2, w3 = (comp(fields, i) for i in range(6))
        lamb = stk([u2 * w3 - u3 * w2,
                    u3 * w1 - u1 * w3,
                    u1 * w2 - u2 * w1])
        N = project(fwd(lamb), c)
        N = jnp.where(c["origin"], 0.0, N)  # pin the mean mode (fp hygiene)
        if "f_re" in c:
            N = N + cplx(c["f_re"], c["f_im"])
        return N

    def step(carry, c):
        u_hat, N_prev = carry
        N = nonlinear(u_hat, c)
        E = c["visc"]
        u_new = E * u_hat + cfg.dt * (1.5 * E * N - 0.5 * E * E * N_prev)
        return (u_new, N), u_new

    return dict(fwd=fwd, inv=inv, consts=consts, nonlinear=nonlinear,
                step=step, project=project, cp=cp)


def make_sharded_rollout3d(cfg: Spectral3DConfig, mesh: Mesh,
                           axis: str = "x",
                           ens_axis: Optional[str] = None):
    """(rollout, physical_sharding): rollout maps x-sharded physical
    velocity (3, nx, ny, nz) -> final x-sharded physical velocity after
    cfg.nt IF-AB2 steps (the distributed rollout_final + fields_from_hat).

    With `ens_axis` the input gains a LEADING batch axis sharded
    data-parallel over that mesh axis; the spatial all_to_all stays
    confined to the `axis` ring and the ensemble axis never communicates
    in the hot loop (spectral_sharded.make_sharded_compact_rollout)."""
    K = make_sharded_compact3d(cfg, mesh, axis)

    def block(u0_local):
        c = K["consts"]()
        # project the IC like the unsharded carry builder
        u_hat0 = K["project"](K["fwd"](u0_local.astype(cfg.real_dtype)), c)
        N0 = K["nonlinear"](u_hat0, c)

        def body(carry, _):
            carry, _ = K["step"](carry, c)
            return carry, None

        (u_hat, _), _ = jax.lax.scan(body, (u_hat0, N0), None,
                                     length=cfg.nt)
        return K["inv"](u_hat)

    spec = (P(ens_axis, None, axis, None, None) if ens_axis
            else P(None, axis, None, None))
    sharded = jax.shard_map(block, mesh=mesh, in_specs=spec, out_specs=spec)
    return jax.jit(sharded), NamedSharding(mesh, spec)


def make_sharded_simulate3d(cfg: Spectral3DConfig, mesh: Mesh,
                            axis: str = "x"):
    """(simulate, physical_sharding): x-sharded physical velocity ->
    STACKED (nt, 3, nx, ny, nz) velocity rollout (x-sharded per frame) —
    the validation contract; production horizons should prefer
    make_sharded_rollout3d + strided host extraction (O(nt) HBM here)."""
    K = make_sharded_compact3d(cfg, mesh, axis)

    def block(u0_local):
        c = K["consts"]()
        u_hat0 = K["project"](K["fwd"](u0_local.astype(cfg.real_dtype)), c)
        N0 = K["nonlinear"](u_hat0, c)

        def body(carry, _):
            carry, u_new = K["step"](carry, c)
            return carry, K["inv"](u_new)

        _, seq = jax.lax.scan(body, (u_hat0, N0), None, length=cfg.nt)
        return seq

    sharded = jax.shard_map(block, mesh=mesh,
                            in_specs=P(None, axis, None, None),
                            out_specs=P(None, None, axis, None, None))
    return jax.jit(sharded), NamedSharding(mesh, P(None, axis, None, None))
