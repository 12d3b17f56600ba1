"""Built-in multi-process validation worker.

Run via the launcher:

    python -m ns_tpu.launch --nprocs 2 --devices-per-proc 2 --selftest

Each process bootstraps jax.distributed from the NS_TPU_* env, then the
whole gang validates, end to end across REAL process boundaries (Gloo on
CPU, ICI on TPU):

  1. device discovery        — local vs global device counts
  2. halo exchange           — cross-process ppermute delivers the true
                               neighbor edge rows (parallel/halo.py)
  3. distributed spectral    — the sharded compact matmul-DFT rollout
                               (parallel/spectral_sharded.py: all_to_all
                               transposes) matches a single-device local
                               rollout elementwise
  4. psum                    — global reduction agrees with the analytic
                               total
  5. per-host sharded IO     — save_array_shards writes only local
                               shards; the coordinator reassembles the
                               global field and checks it

Prints `SELFTEST OK p{pid}` on success; any failure raises (nonzero exit,
which the launcher propagates).
"""

from __future__ import annotations


def main() -> None:
    import jax
    from ns_tpu.parallel import distributed as dist

    dist.initialize_from_env()
    jax.config.update("jax_enable_x64", True)

    import os
    import tempfile

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ns_tpu.parallel.halo import exchange_halo_rows
    from ns_tpu.parallel.spectral_sharded import make_sharded_compact_rollout
    from ns_tpu.solvers import spectral_periodic as sp

    pid = dist.process_index()
    nproc = dist.process_count()
    n_local = len(jax.local_devices())
    n_global = len(jax.devices())
    print(f"p{pid}: {nproc} processes, {n_local} local / {n_global} global "
          f"devices on {jax.devices()[0].platform}")
    assert n_global == nproc * n_local, (n_global, nproc, n_local)

    mesh = dist.make_global_mesh({"x": n_global})

    # -- 2. halo exchange across the process boundary ----------------------
    nx, ny = 8 * n_global, 16
    full = np.arange(nx * ny, dtype=np.float64).reshape(nx, ny)
    sharding = NamedSharding(mesh, P("x", None))
    lo, hi = dist.process_local_rows(nx, mesh, "x")
    garr = dist.global_array(sharding, full[lo:hi])

    padded = jax.jit(jax.shard_map(
        lambda a: exchange_halo_rows(a, "x"), mesh=mesh,
        in_specs=P("x", None), out_specs=P("x", None)))(garr)
    # each shard's padded block is (bx+2, ny); row 0 = lower neighbor's
    # last row (zeros on shard 0), row -1 = upper neighbor's first row
    bx = nx // n_global
    for idx, block in dist.local_shards(padded):
        s = idx[0][0] // (bx + 2) * bx  # shard ordinal * rows per shard
        want_below = np.zeros(ny) if s == 0 else full[s - 1]
        want_above = np.zeros(ny) if s + bx == nx else full[s + bx]
        np.testing.assert_array_equal(block[0], want_below)
        np.testing.assert_array_equal(block[-1], want_above)
        np.testing.assert_array_equal(block[1:-1], full[s:s + bx])
    print(f"p{pid}: halo exchange across processes OK")

    # -- 3. distributed compact spectral rollout vs local single-device ----
    cfg = sp.SpectralPeriodicConfig(nt=8, nx=8 * n_global, ny=8 * n_global,
                                    dt=0.005, nu=1e-3, dtype="float64",
                                    transform="matmul",
                                    matmul_precision="highest",
                                    compact_spectrum=True, dealias=True)
    w0 = np.asarray(sp.decaying_turbulence_vorticity(cfg, seed=3))

    from ns_tpu.utils.host import to_host

    carry0 = sp.init_from_vorticity(cfg, w0)
    w_hat_ref, _ = sp.rollout_final_compact(cfg, carry0)
    _, cinv = sp.make_compact_transforms(cfg)
    # to_host, not np.asarray: cinv's executable contains complex ops,
    # whose outputs the axon TPU tunnel cannot read back directly
    w_ref = to_host(jax.jit(cinv)(w_hat_ref))

    rollout, phys_sharding = make_sharded_compact_rollout(cfg, mesh)
    lo, hi = dist.process_local_rows(cfg.nx, mesh, "x")
    w0_g = dist.global_array(phys_sharding, w0[lo:hi])
    w_fin = rollout(w0_g)

    got = {tuple(i[0] for i in idx): blk
           for idx, blk in dist.local_shards(w_fin)}
    for (r0, _), blk in got.items():
        np.testing.assert_allclose(blk, w_ref[r0:r0 + blk.shape[0]],
                                   atol=1e-11)
    print(f"p{pid}: distributed matmul-DFT rollout matches local "
          f"single-device rollout at {cfg.nx}^2")

    # -- 4. global psum ----------------------------------------------------
    total = jax.jit(jax.shard_map(
        lambda a: jax.lax.psum(a.sum(), "x"), mesh=mesh,
        in_specs=P("x", None), out_specs=P()))(garr)
    assert float(np.asarray(total)) == full.sum(), float(np.asarray(total))
    print(f"p{pid}: psum OK")

    # -- 5. per-host sharded output ---------------------------------------
    out_dir = os.environ.get("NS_TPU_SELFTEST_DIR")
    if out_dir is None:
        out_dir = os.path.join(tempfile.gettempdir(),
                               f"ns_tpu_selftest_{os.environ.get('NS_TPU_COORDINATOR', 'x').replace(':', '_')}")
    # pod runs (no launcher env) reuse a fixed dir: the coordinator clears
    # stale shard files from earlier runs before anyone writes, else
    # assemble_shards rejects (or a matching-topology stale set corrupts)
    if dist.is_coordinator() and os.path.isdir(out_dir):
        import glob
        for f in glob.glob(os.path.join(out_dir, "w_final.proc*.npz")):
            os.remove(f)
    dist.barrier("selftest_clean")
    dist.save_array_shards(out_dir, "w_final", w_fin)
    dist.barrier("selftest_io")
    if dist.is_coordinator():
        assembled = dist.assemble_shards(out_dir, "w_final")
        np.testing.assert_allclose(assembled, w_ref, atol=1e-11)
        print(f"p{pid}: per-host shard files reassemble to the global "
              f"field ({out_dir})")
    dist.barrier("selftest_done")
    print(f"SELFTEST OK p{pid}")


if __name__ == "__main__":
    main()
