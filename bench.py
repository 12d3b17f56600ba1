"""Benchmark harness: one JSON line for the driver.

Primary metric (BASELINE.json north star): cell-updates/sec/chip for the
2D Chorin-spectral (periodic Fourier) solver at 1024^2, target 1e9.
vs_baseline is value / 1e9 (the reference publishes no numbers of its own —
BASELINE.md records its measured CPU oracle rates; the chorin_fd CPU oracle
measured 2.7e3 cell-updates/s).

Run: python bench.py  (on the real TPU; JAX_PLATFORMS left as-is)
"""

import json
import time

import jax
import jax.numpy as jnp

from ns_tpu.solvers import spectral_periodic as sp

NORTH_STAR = 1.0e9  # cell-updates/sec/chip @ 1024^2 spectral


def bench_spectral(nx=1024, nt=5000):
    # nt=5000: every rollout execution pays a fixed ~30 ms dispatch/launch
    # round trip through the tunnel transport (measured: slope of elapsed
    # vs nt is 93 us/step while nt=200 takes 50 ms total). Production
    # rollouts run thousands of steps, so the steady-state number is the
    # honest one; docs/roofline.md has the phase-level breakdown.
    # compact dealias-truncated matmul-DFT (MXU path) at bf16 'default'
    # matmul precision: ~10.5 Gcups steady-state at 1024^2 (vs ~2.4 at
    # bf16x3 'high'; the XLA-FFT path is ~8x slower — RESULTS.md engine
    # table). Documented fidelity: 'default' ~5e-3
    # relative on the vorticity field, 'high' ~3e-5 (RESULTS.md fidelity
    # table); divergence-free-ness is exact in all modes (streamfunction
    # form), so the speed/precision trade never violates incompressibility.
    cfg = sp.SpectralPeriodicConfig(nt=nt, nx=nx, ny=nx, dt=5e-4, nu=1e-4,
                                    dtype="float32", transform="matmul",
                                    matmul_precision="default",
                                    compact_spectrum=True)
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0, k_peak=30.0)
    carry0 = sp.init_from_vorticity_compact(cfg, w0)

    from ns_tpu.utils import to_host
    from ns_tpu.utils.host import sync

    roll = jax.jit(lambda c: sp.rollout_final_compact(cfg, c))
    # Warm-up MUST be a hard sync (host readback): through the axon tunnel,
    # block_until_ready on the first post-compile invocation can return
    # immediately (async remote compile), so timing loops started right
    # after it measure dispatch latency (~50 us), not the rollout.
    sync(roll(carry0))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = roll(carry0)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    # plausibility gate scaled with nt: even at a generous 100 Gcups the
    # rollout needs nt*nx^2/1e11 seconds, so anything faster means the
    # async dispatch returned before the work ran (not synced)
    if best < nt * nx * nx / 1e11:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = sync(roll(carry0))  # hard sync (adds ~25 ms readback)
            best = min(best, time.perf_counter() - t0)
    elapsed = best

    # sanity: finite output (to_host launders around the axon complex-
    # executable readback limitation)
    w_hat, _ = out
    finite = to_host(jnp.isfinite(jnp.abs(w_hat)).all().astype(jnp.float32))
    assert finite == 1.0, "rollout produced non-finite state"

    cell_updates = nt * nx * nx / elapsed
    return dict(elapsed=elapsed, steps_per_sec=nt / elapsed,
                cell_updates_per_sec=cell_updates)


if __name__ == "__main__":
    r = bench_spectral()
    print(json.dumps({
        "metric": "spectral_periodic_cell_updates_per_sec_1024sq",
        "value": r["cell_updates_per_sec"],
        "unit": "cell-updates/s/chip",
        "vs_baseline": r["cell_updates_per_sec"] / NORTH_STAR,
    }))
