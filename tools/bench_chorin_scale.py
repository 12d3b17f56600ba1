"""chorin_fd at scale: marginal per-step cost vs grid size and pressure mode.

Slope-timed (nt=64 vs nt=512 rollouts inside one jit each, difference
divided by the step delta) so the fixed ~30 ms dispatch round trip
cancels. Both predictor methods, redblack (gated SOR) vs dst (direct
matmul-DST) pressure. Cavity BCs, dt sized small to stay stable at the
finest grid; throughput is independent of dt.

Run on the real TPU: python tools/bench_chorin_scale.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from ns_tpu.core.bc import dirichlet, neumann
    from ns_tpu.solvers.chorin_fd import (ChorinFDConfig, init_state,
                                          make_step)
    from ns_tpu.utils.host import sync

    def bench(nx, method, pressure_mode, n1=64, n2=512, pallas=False):
        ny = nx
        dx = 2.0 / (nx - 1)
        u_bc = [dirichlet(0, "left"), dirichlet(0, "right"),
                dirichlet(1, "top"), dirichlet(0, "bottom")]
        v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
        p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dx),
                neumann(0, "left", dx, dx), neumann(0, "right", dx, dx)]
        cfg = ChorinFDConfig(nt=n2, nit=200, nx=nx, ny=ny, dt=1e-5,
                             rho=1.0, nu=0.1, beta=1.25, method=method,
                             quirk_compat=(method != "helmholtz"),
                             pressure_mode=pressure_mode,
                             use_pallas_momentum=pallas)
        z = np.zeros((nx, ny), np.float32)
        state0 = init_state(cfg, z, z, z, u_bc, v_bc, p_bc)
        step = make_step(cfg, u_bc, v_bc, p_bc)

        def timed(n):
            @jax.jit
            def roll(s):
                def body(s, _):
                    return step(s), None
                s, _ = jax.lax.scan(body, s, None, length=n)
                return s.u
            sync(roll(state0))
            best = float("inf")
            for _ in range(4):
                t0 = time.perf_counter()
                # hard host readback, not block_until_ready: through the
                # axon tunnel the latter can return before the work runs
                # (CLAUDE.md; same guard as bench.py)
                sync(roll(state0))
                best = min(best, time.perf_counter() - t0)
            return best

        per_step = (timed(n2) - timed(n1)) / (n2 - n1)
        gcups = nx * ny / per_step / 1e9
        return per_step, gcups

    print("| grid | method | pressure | ms/step | Gcups |")
    print("|---|---|---|---|---|")
    for nx in (256, 512, 1024):
        for method in ("semi_implicit", "explicit", "helmholtz"):
            for mode in (("redblack", "dst") if method != "helmholtz"
                         else ("dst",)):
                t, g = bench(nx, method, mode)
                print(f"| {nx}^2 | {method} | {mode} | {t*1e3:.3f} | "
                      f"{g:.2f} |", flush=True)
            if method == "explicit" and jax.devices()[0].platform == "tpu":
                # end-to-end effect of the fused momentum kernel
                t, g = bench(nx, method, "dst", pallas=True)
                print(f"| {nx}^2 | explicit+pallas | dst | {t*1e3:.3f} | "
                      f"{g:.2f} |", flush=True)


if __name__ == "__main__":
    main()
