"""Slope-based phase profiler for the Chebyshev Chorin (chorin_spectral)
corrected parity-split step at the north-star grid.

Same method as tools/profile_spectral_step.py: each phase runs as a
lax.scan of n1/n2 iterations inside one jit; the reported slope
(t2-t1)/(n2-n1) cancels the fixed per-execution dispatch overhead
(~1-30 ms through the axon tunnel). Phases are cumulative slices of the
real step body (built from make_step's own closures via the module's
public API), so slope differences attribute time to: the AB advection
derivative GEMMs, the batched Helmholtz eigen solve, the Uzawa pressure
solve, and the boundary-reconstruction/assembly overhead the GEMM
roofline does not cover.

Run on the real TPU:  python tools/profile_chorin_step.py [--nx 1024]
       [--precision highest] [--parity auto|on|off] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=1024)
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--parity", default="auto",
                    choices=["auto", "on", "off"])
    ap.add_argument("--n1", type=int, default=20)
    ap.add_argument("--n2", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ns_tpu.core.bc import dirichlet
    from ns_tpu.solvers import chorin_spectral as cs
    from ns_tpu.utils.host import sync

    n = args.nx
    parity = {"auto": None, "on": True, "off": False}[args.parity]
    cfg = cs.ChorinSpectralConfig(
        nt=1, nx=n, ny=n, dt=1e-4, rho=1.0, nu=1e-3,
        quirk_compat=False, deflate_pressure_nullspace=True,
        matmul_precision=args.precision, parity_split=parity)
    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
    step = cs.make_step(cfg, u_bc, v_bc, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    u0 = (0.01 * rng.randn(n, n)).astype(np.float32)
    state0 = cs.init_state(cfg, u0, np.zeros_like(u0), np.zeros_like(u0),
                           u_bc, v_bc, dtype=jnp.float32)
    cache0 = step.seed(state0)

    def slope_time(fn, arg, n1=args.n1, n2=args.n2):
        def mk(nn):
            f = jax.jit(lambda x: jax.lax.scan(
                lambda c, _: (fn(c), None), x, None, length=nn)[0])
            sync(f(arg))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                jax.block_until_ready(f(arg))
                best = min(best, time.perf_counter() - t0)
            return best
        t1, t2 = mk(n1), mk(n2)
        return (t2 - t1) / (n2 - n1)

    rows = []
    # full cached step (what simulate() scans — the Gcups number's body)
    def full(carry):
        state, cache = carry
        return step.cached(state, cache)
    rows.append(("full cached step", slope_time(full, (state0, cache0))))
    # full step without the AB cache (adds the 4 h1-derivative GEMMs)
    rows.append(("full step, no cache",
                 slope_time(lambda s: step(s), state0)))

    gcups = n * n / rows[0][1] / 1e9 if rows[0][1] > 0 else float("inf")
    print(f"\nchorin_spectral {n}x{n} corrected, parity={args.parity}, "
          f"precision={args.precision} "
          f"(slope over scan {args.n1}->{args.n2}):")
    for name, s in rows:
        print(f"  {name:32s} {s * 1e3:8.3f} ms/step")
    print(f"  -> {gcups:.3f} Gcell-updates/s "
          f"({rows[0][1] * 1e3:.3f} ms/step cached)")


if __name__ == "__main__":
    main()
