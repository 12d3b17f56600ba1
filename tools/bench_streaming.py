"""Streaming rollout IO: device/disk overlap across writer backends.

Times stream_rollout end-to-end on a periodic spectral rollout big
enough that the per-chunk host write is a real fraction of the chunk's
device time, for each writer backend:

  memmap  synchronous np memmap store (the pre-round-3 path)
  sync    synchronous os.pwrite (isolates memmap page-fault cost)
  thread  python worker thread (GIL-releasing pwrite)
  native  C++ ring writer (runtime/native/stream_writer.cpp)

Every backend writes byte-identical .npy files (asserted); the metric is
wall-clock for the same rollout. Run on the real TPU:
python tools/bench_streaming.py [--nx 1024] [--nt 512] [--chunk 64]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--nt", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--cpu", action="store_true",
                    help="run the producer on CPU. Over the axon TPU "
                         "tunnel the device->host readback (~20 MB/s) "
                         "dwarfs any disk-write cost, so writer backends "
                         "are indistinguishable there; on CPU the frames "
                         "are host-resident and the disk write is the "
                         "real denominator")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ns_tpu.io.streaming import stream_rollout
    from ns_tpu.solvers import spectral_periodic as sp

    cfg = sp.SpectralPeriodicConfig(nt=args.nt, nx=args.nx, ny=args.nx,
                                    dt=1e-4, nu=1e-3, dtype="float32")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0, k_peak=args.nx / 12)
    state0 = sp.init_from_vorticity(cfg, w0)
    _step, _ = sp.make_step(cfg)
    step = lambda c: _step(c)[0]

    def extract(c):
        u, v, w = sp.fields_from_hat(cfg, c[0])
        p = sp.pressure_from_hat(cfg, c[0])
        return {"u": u, "v": v, "p": p, "w": w}

    root = tempfile.mkdtemp()
    gb = args.nt * args.nx * args.nx * 4 * len(
        ["u", "v", "p", "w"]) / 1e9

    # warm-up: compile the full-chunk and remainder programs outside the
    # timed regions (CLAUDE.md: benchmark only warm programs). Works
    # because stream_rollout's chunk programs are jit-cached on the
    # (step, extract, n) objects shared across these calls.
    warm = os.path.join(root, "_warm")
    stream_rollout(step, state0, args.nt % args.chunk or args.chunk,
                   extract, warm, chunk=args.chunk, writer="memmap")
    stream_rollout(step, state0, args.chunk, extract, warm,
                   chunk=args.chunk, writer="memmap")
    shutil.rmtree(warm, ignore_errors=True)

    rows = {}
    oracle_dir = None
    for backend in ("memmap", "sync", "thread", "native"):
        out = os.path.join(root, backend)
        if backend == "native":
            from ns_tpu.runtime.native.build import load
            if load() is None:  # only this row needs the g++ library
                print(f"| {backend} | unavailable (no native lib) |",
                      flush=True)
                continue
        t0 = time.perf_counter()
        paths = stream_rollout(step, state0, args.nt, extract, out,
                               chunk=args.chunk, writer=backend)
        dt = time.perf_counter() - t0
        rows[backend] = dt
        print(f"| {backend} | {dt:.2f} s | {gb / dt:.2f} GB/s end-to-end |",
              flush=True)
        if oracle_dir is None:
            oracle_dir = out
        else:  # byte-identical across backends
            for name, p in paths.items():
                a = np.load(p, mmap_mode="r")
                b = np.load(os.path.join(oracle_dir, f"{name}.npy"),
                            mmap_mode="r")
                assert np.array_equal(a, b), (backend, name)
            shutil.rmtree(out)

    if "memmap" in rows and "native" in rows:
        print(f"\nnative vs memmap: {rows['memmap'] / rows['native']:.2f}x "
              f"({gb:.1f} GB streamed, {args.nt} frames of "
              f"{args.nx}^2 x 4 fields)")
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
