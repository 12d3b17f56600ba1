"""Measure the parity-split DST engine vs the full-GEMM path on the TPU.

For each grid size, times a scan of `iters` back-to-back Poisson solves
(one warm jitted program — per-call dispatch would otherwise dominate,
CLAUDE.md) for parity_split=False and True, f32 HIGHEST precision (the
production setting of pressure_mode='dst').

Usage: python tools/bench_parity_dst.py [sizes...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.ops.fast_poisson import make_dst_poisson


def bench_one(n: int, parity: bool, iters: int = 50, reps: int = 5) -> float:
    solve = make_dst_poisson(n, n, 2.0 / (n - 1), 2.0 / (n - 1),
                             dtype=jnp.float32, parity_split=parity)

    def body(p, _):
        return solve(p, f), None

    @jax.jit
    def run(p):
        p, _ = jax.lax.scan(body, p, None, length=iters)
        return p

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    f = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    run(p).block_until_ready()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(p).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [129, 257, 513, 1025, 2049]
    print(f"devices: {jax.devices()}")
    print(f"{'n':>6} {'full us':>10} {'parity us':>10} {'speedup':>8}")
    for n in sizes:
        tf = bench_one(n, False)
        tp = bench_one(n, True)
        print(f"{n:>6} {tf * 1e6:>10.1f} {tp * 1e6:>10.1f} {tf / tp:>8.2f}x")


if __name__ == "__main__":
    main()
