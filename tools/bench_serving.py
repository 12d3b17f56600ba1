"""Steady-state serving benchmark -> printed markdown rows.

Trains a small surrogate briefly (the checkpoint is a vehicle; serving
cost does not depend on training quality), then measures the
InferenceEngine's request latency after warmup:

  - single-frame requests at several horizons (the chunked-scan path),
  - a batched request bucket,
  - first-request compile cost vs steady state (what --warmup-steps buys).

Usage: python tools/bench_serving.py [--nx 64] [--model fno_w]
       [--chunk 64] [--steps 50 200 1000]
       python tools/bench_serving.py --solver [--stride 1]   # oracle endpoint
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--model", default="fno_w")
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--steps", type=int, nargs="*", default=[50, 200, 1000])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n-iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs while the "
                         "TPU is busy)")
    ap.add_argument("--solver", action="store_true",
                    help="bench the SolverEngine (classical-solver oracle "
                         "endpoint) instead of a surrogate checkpoint")
    ap.add_argument("--stride", type=int, default=1,
                    help="solver steps per served frame (--solver only)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from ns_tpu.serve.engine import InferenceEngine
    from ns_tpu.solvers import spectral_periodic as sp
    from ns_tpu.io.npz import save_rollout
    from ns_tpu.train.trainer import TrainConfig, Trainer

    if args.solver:
        from ns_tpu.serve.solver import SolverEngine
        from ns_tpu.utils.host import to_host
        cfg = sp.SpectralPeriodicConfig(nt=1, nx=args.nx, ny=args.nx,
                                        dt=1e-3, nu=1e-3, dtype="float32")
        w0 = sp.decaying_turbulence_vorticity(cfg, seed=0)
        u, v, p = to_host(sp.NavierStokesSystem(
            w0, nt=2, nx=args.nx, ny=args.nx, dt=1e-3, nu=1e-3).simulate())
        frame0 = np.stack([u[0], v[0], p[0]]).astype(np.float32)
        eng = SolverEngine(args.nx, args.nx, stride=args.stride,
                           chunk=args.chunk)
        label = (f"solver {args.nx}^2 stride={args.stride} "
                 f"chunk={args.chunk}")

        t0 = time.perf_counter()
        eng.predict(frame0, args.steps[0])
        cold = time.perf_counter() - t0
        print(f"| {label} | first request ({args.steps[0]} steps) | "
              f"{cold:.2f} s |", flush=True)

        for n in args.steps:
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                eng.predict(frame0, n)
                best = min(best, time.perf_counter() - t0)
            print(f"| {label} | {n}-step rollout | {best * 1e3:.1f} ms "
                  f"({n / best:.0f} frames/s) |", flush=True)
        print("\n(| engine | request | latency |)")
        return

    # tiny training run to produce a real checkpoint
    cfg = sp.SpectralPeriodicConfig(nt=40, nx=args.nx, ny=args.nx,
                                    dt=1e-3, nu=1e-3, dtype="float32")
    from ns_tpu.utils.host import to_host
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0)
    # to_host: simulate()'s executables contain complex spectral ops
    u, v, p = to_host(sp.NavierStokesSystem(
        w0, nt=40, nx=args.nx, ny=args.nx, dt=1e-3, nu=1e-3).simulate())
    tmp = tempfile.mkdtemp()
    npz = os.path.join(tmp, "data.npz")
    save_rollout(npz, u, v, p)
    tc = TrainConfig(model=args.model, npz_path=npz,
                     out_dir=os.path.join(tmp, "ckpt"),
                     n_iters=args.n_iters, n_frames=40,
                     ckpt_every=args.n_iters,
                     fno_modes=args.nx // 3 + 1)
    Trainer(tc).train(progress=False)

    eng = InferenceEngine.from_checkpoint(os.path.join(tmp, "ckpt"),
                                          chunk=args.chunk)
    frame0 = np.stack([u[0], v[0], p[0]]).astype(np.float32)

    # first-request (compile) cost
    t0 = time.perf_counter()
    eng.predict(frame0, args.steps[0])
    cold = time.perf_counter() - t0

    print(f"| {args.model} {args.nx}^2 chunk={args.chunk} | "
          f"first request ({args.steps[0]} steps) | {cold:.2f} s |",
          flush=True)

    for n in args.steps:
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            eng.predict(frame0, n)
            best = min(best, time.perf_counter() - t0)
        print(f"| {args.model} {args.nx}^2 chunk={args.chunk} | "
              f"{n}-step rollout | {best * 1e3:.1f} ms "
              f"({n / best:.0f} frames/s) |", flush=True)

    batch = np.broadcast_to(frame0, (args.batch,) + frame0.shape).copy()
    eng.predict(batch, args.steps[0])  # compile the bucket
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        eng.predict(batch, args.steps[0])
        best = min(best, time.perf_counter() - t0)
    n_frames = args.batch * args.steps[0]
    print(f"| {args.model} {args.nx}^2 chunk={args.chunk} | "
          f"batch-{args.batch} x {args.steps[0]}-step | "
          f"{best * 1e3:.1f} ms ({n_frames / best:.0f} frames/s) |",
          flush=True)

    print("\n(| engine | request | latency |)")


if __name__ == "__main__":
    main()
