"""Pressure-solver shoot-out at large grids: SOR vs multigrid vs MGCG.

VERDICT round-1 item 3 asked for multigrid benched against SOR at
513^2/1025^2. Manufactured Dirichlet problem laplace(p) = f with
p_exact = sin(pi x) sin(pi y) on [0,1]^2 (zero boundary), p0 = 0.

SOR runs its theoretically optimal omega = 2/(1+sin(pi/(n-1))) for a
sweep count sized to reach ~1e-6 error contraction (2|ln 1e-6|/(2pi/N)
sweeps); multigrid/MGCG run 10 cycles/iterations. Timing is slope-based
(scan of n1 vs n2 repeats inside one jit) so the fixed ~30 ms dispatch
overhead cancels; each repeat re-solves from p0 (defeating loop-invariant
hoisting with a 1e-30 carry perturbation).

Run on the real TPU: python tools/bench_poisson.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ns_tpu.ops.fast_poisson import make_dst_poisson
    from ns_tpu.ops.multigrid import poisson_mgcg, poisson_multigrid
    from ns_tpu.ops.poisson import sor_redblack
    from ns_tpu.utils.host import sync, to_host

    def problem(n):
        x = np.linspace(0.0, 1.0, n)
        X, Y = np.meshgrid(x, x, indexing="ij")
        p_exact = np.sin(np.pi * X) * np.sin(np.pi * Y)
        f = -2.0 * np.pi**2 * p_exact
        dx = x[1] - x[0]
        return (jnp.zeros((n, n), jnp.float32),
                jnp.asarray(f, jnp.float32), float(dx),
                jnp.asarray(p_exact, jnp.float32))

    def rel_err(p, p_exact):
        return float(to_host(jnp.linalg.norm(p - p_exact)
                             / jnp.linalg.norm(p_exact)))

    def slope_time(solve, p0, n1=2, n2=8):
        def mk(n):
            @jax.jit
            def run(p0):
                def body(c, _):
                    return solve(p0 + 1e-30 * c[0, 0]), None
                out, _ = jax.lax.scan(body, p0, None, length=n)
                return out
            sync(run(p0))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(p0))
                best = min(best, time.perf_counter() - t0)
            return best
        return (mk(n2) - mk(n1)) / (n2 - n1)

    rows = []
    for n in (513, 1025):
        p0, f, dx, p_exact = problem(n)
        beta_opt = 2.0 / (1.0 + np.sin(np.pi / (n - 1)))
        sweeps = int(2 * abs(np.log(1e-6)) / (2 * np.pi / (n - 1)))
        rhs_c = f * dx * dx * dx * dx  # rhs_c = dx^2 dy^2 f (see sor_redblack)

        cases = [
            (f"SOR omega_opt, {sweeps} sweeps",
             lambda p: sor_redblack(p, rhs_c, dx, dx, beta_opt, 0.0, sweeps),
             2, 4),
            ("multigrid 10 V(2,2)-cycles",
             lambda p: poisson_multigrid(p, f, dx, dx, n_cycles=10), 2, 10),
            ("MGCG 10 iters",
             lambda p: poisson_mgcg(p, f, dx, dx, n_iters=10), 2, 10),
            ("DST direct solve",
             lambda p, s=make_dst_poisson(n, n, dx, dx): s(p, f), 8, 64),
        ]
        for name, solve, n1, n2 in cases:
            t = slope_time(solve, p0, n1, n2)
            err = rel_err(jax.jit(solve)(p0), p_exact)
            rows.append((f"{n}^2 {name}", f"{t*1e3:.2f} ms/solve",
                         f"rel err {err:.1e}"))
            print(f"| {rows[-1][0]} | {rows[-1][1]} | {rows[-1][2]} |",
                  flush=True)

    print()
    print("| solver | time | accuracy |")
    print("|---|---|---|")
    for r in rows:
        print("| " + " | ".join(r) + " |")


if __name__ == "__main__":
    main()
