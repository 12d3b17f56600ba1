"""3D spectral family throughput sweep on the real TPU -> RESULTS.md table.

Measures steady-state cell-updates/s for both transform engines at cube
grids, the same methodology as the 2D headline (bench.py: long warm scan
inside one jit, slope-honest via hard host-sync warmup; per-execution
dispatch overhead amortized over nt steps).

Usage: python tools/bench_3d.py [--sizes 64,128,256] [--nt 200]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def bench(cfg, u0, n=3):
    import jax

    from ns_tpu.solvers import spectral3d as s3
    from ns_tpu.utils.host import sync

    carry = s3.init_from_velocity(cfg, u0)
    roll = jax.jit(lambda c: s3.rollout_final(cfg, c))
    sync(roll(carry))  # hard-sync warmup (axon async-compile hazard)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = roll(carry)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    # plausibility gate scaled with the workload (bench.py convention)
    cells = cfg.nx * cfg.ny * cfg.nz
    if best < cfg.nt * cells / 1e12:
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            sync(roll(carry))
            best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,128,256")
    ap.add_argument("--nt", type=int, default=200)
    ap.add_argument("--precisions", default="default,high")
    args = ap.parse_args()

    from ns_tpu.solvers import spectral3d as s3

    rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        u0 = np.asarray(s3.taylor_green_velocity(
            s3.Spectral3DConfig(nx=n, ny=n, nz=n)))
        engines = [("fft", None, False)] + [
            ("matmul", p, f) for p in args.precisions.split(",")
            for f in (False, True)]
        for transform, prec, fused in engines:
            kw = dict(nt=args.nt, nx=n, ny=n, nz=n, dt=5e-4, nu=6.25e-4,
                      dtype="float32", transform=transform,
                      use_pallas_transform=fused)
            if prec:
                kw["matmul_precision"] = prec
            cfg = s3.Spectral3DConfig(**kw)
            try:
                t = bench(cfg, u0)
            except Exception as e:  # OOM at large grids: record, continue
                rows.append(dict(n=n, engine=transform, prec=prec,
                                 fused=fused, error=str(e)[:120]))
                print(rows[-1])
                continue
            cups = args.nt * n**3 / t
            rows.append(dict(n=n, engine=transform, prec=prec, fused=fused,
                             ms_per_step=1e3 * t / args.nt, gcups=cups / 1e9))
            tag = transform + ("/" + prec if prec else "") + \
                ("+pallas" if fused else "")
            print(f"{n}^3 {tag:22s} {1e3 * t / args.nt:8.3f} ms/step  "
                  f"{cups / 1e9:7.2f} Gcups")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
