"""FNO transform-engine shootout: fft vs matmul-DFT spectral layers.

Sync-honest timing (the rollout is reduced to a scalar inside jit and
read back with float(); block_until_ready alone is not reliable over the
axon device tunnel — see bench.py). Informs the transform='auto'
crossover (_MATMUL_MAX_SIDE in models/fno.py).

Usage: python tools/bench_fno_transform.py [--sizes 64 128 256 512]
       [--width 32] [--steps 64] [--dealias]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[64, 128, 256, 512])
    ap.add_argument("--width", type=int, default=32)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--dealias", action="store_true",
                    help="include the per-step dealias post (the fno_w "
                         "serving configuration)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from ns_tpu.models.fno import FNO2D
    from ns_tpu.models.vorticity import dealias_field

    def bench(nx, transform):
        modes = nx // 3 + 1  # the full dealiased band (showcase config)
        m = FNO2D(nx, nx, width=args.width, modes=modes, channels=1,
                  transform=transform)
        p = m.init(jax.random.PRNGKey(0))
        x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, nx, nx),
                               jnp.float32)
        post = ((lambda x: dealias_field(x, engine=transform))
                if args.dealias else None)
        roll = jax.jit(lambda p, x: jnp.sum(jnp.abs(
            m.rollout(p, x, args.steps, post=post))))
        # to_host: the fft-engine executable contains complex ops, whose
        # outputs float() cannot read back directly over the axon tunnel
        from ns_tpu.utils.host import to_host
        float(to_host(roll(p, x0)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(to_host(roll(p, x0)))
            best = min(best, time.perf_counter() - t0)
        return best / args.steps * 1e3

    for nx in args.sizes:
        f = bench(nx, "fft")
        m = bench(nx, "matmul")
        print(f"| {nx}^2 w={args.width} modes={nx // 3 + 1}"
              f"{' +dealias' if args.dealias else ''} | fft {f:.2f} ms/step"
              f" | matmul {m:.2f} ms/step | {f / m:.2f}x |", flush=True)

    print("\n(| config | fft | matmul | speedup |)")


if __name__ == "__main__":
    main()
