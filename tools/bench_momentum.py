"""Fused explicit-momentum kernel vs XLA — SURVEY §7 item 5 measurement.

Times the chorin_fd explicit predictor phase (AB2 advection + diffusion
stencils + velocity BCs for both fields) as (a) the pure-XLA path
(_explicit_predictor + apply_bcs) and (b) the fused Pallas kernel
(ops/pallas/momentum_kernels.py), at 1024^2 and 2048^2 f32 on the real
TPU. Both run 100 iterations inside ONE jitted lax.scan (carry rotation
feeds outputs back as inputs) so the per-call tunnel dispatch latency is
amortized and what's measured is the kernel itself.

Usage: python tools/bench_momentum.py [--sizes 1024 2048] [--iters 100]
Prints a markdown table for RESULTS.md.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*", default=[1024, 2048])
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ns_tpu.core.bc import dirichlet
    from ns_tpu.ops.pallas.momentum_kernels import (
        momentum_explicit_fused_pallas)
    from ns_tpu.solvers.chorin_fd import (ChorinFDConfig,
                                          _explicit_predictor)
    from ns_tpu.core.bc import apply_bcs

    u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
            dirichlet(0, "top"), dirichlet(0, "bottom")]
    v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]

    print("| grid | path | ms/step | cell-updates/s |")
    print("|---|---|---|---|")
    for n in args.sizes:
        cfg = ChorinFDConfig(nx=n, ny=n, dt=1e-4, nu=0.01,
                             method="explicit")
        rng = np.random.default_rng(0)
        fields0 = tuple(jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
                        for _ in range(4))

        def xla_phase(un, vn, un1, vn1):
            ui, vi = _explicit_predictor(cfg, un, vn, un1, vn1)
            return apply_bcs(ui, u_bc), apply_bcs(vi, v_bc)

        def pallas_phase(un, vn, un1, vn1):
            return momentum_explicit_fused_pallas(
                un, vn, un1, vn1, cfg.dt, cfg.dx, cfg.dy, cfg.nu,
                u_bc, v_bc, quirk_compat=True)

        for name, phase in (("xla", xla_phase), ("pallas", pallas_phase)):
            @jax.jit
            def loop(fields):
                def body(c, _):
                    un, vn, un1, vn1 = c
                    ui, vi = phase(un, vn, un1, vn1)
                    return (ui, vi, un, vn), None

                c, _ = jax.lax.scan(body, fields, None, length=args.iters)
                # reduce to one scalar so the hard host readback (sync)
                # costs ~nothing; the sum depends on the full iteration
                # chain, so nothing is dead-code-eliminated
                return sum(jnp.sum(f) for f in c)

            # timing through the axon tunnel MUST use hard host readbacks:
            # block_until_ready on remote executables can return before
            # the work runs (CLAUDE.md; same guard as bench.py)
            from ns_tpu.utils.host import sync
            sync(loop(fields0))
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                sync(loop(fields0))
                best = min(best, time.perf_counter() - t0)
            ms = best / args.iters * 1e3
            # repo-wide convention (bench.py, RESULTS.md): cell-updates =
            # GRID CELLS advanced per step, regardless of how many fields
            # each step updates (this phase updates both u and v)
            cups = n * n / (best / args.iters)
            print(f"| {n}^2 | {name} | {ms:.3f} | {cups:.2e} |",
                  flush=True)


if __name__ == "__main__":
    main()
