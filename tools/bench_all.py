"""Comprehensive benchmark sweep -> RESULTS.md.

Measures every solver family on the real TPU at the BASELINE.json configs
(and the reference defaults), with warm timings (compile excluded). The
driver's one-line bench stays in bench.py; this is the full table.

Usage: python tools/bench_all.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def timeit(fn, n=8):
    """Best-of-n with a HARD host-readback sync on every rep.

    Two axon-tunnel lessons baked in: (1) block_until_ready can return
    before the remote work is done right after compile, so the warm-up
    and every timed rep sync via host readback; (2) the per-dispatch
    latency is base + one-sided positive jitter that some nights reaches
    tens of ms — best-of-3 kept enough jitter to make slope differences
    negative (observed: "1e12 steps/s" rows), while the MIN of 8 reps
    converges to the base latency on both slope endpoints so the
    difference is trustworthy."""
    from ns_tpu.utils.host import sync

    sync(fn())  # warm-up (compile)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def slope_timeit(make_roll, n1, n2, reps=8):
    """Marginal seconds/step by slope: time an n1-step and an n2-step
    rollout of the same workload and return (t2-t1)/(n2-n1). The fixed
    per-execution dispatch + readback cost (~1-30 ms through the axon
    tunnel — CLAUDE.md hazards) cancels, so sub-100-ms workloads report
    their true per-step cost instead of mostly the transport. Same
    protocol as the RESULTS.md parity/roofline tables
    (tools/profile_spectral_step.py). A non-positive slope (jitter
    exceeded the workload delta even at best-of-reps) reports inf-rate
    1e-12 — treat any such row as a re-run signal, never publish it."""
    t1 = timeit(make_roll(n1), n=reps)
    t2 = timeit(make_roll(n2), n=reps)
    return max((t2 - t1) / (n2 - n1), 1e-12)


def main():
    import jax
    import jax.numpy as jnp

    from ns_tpu.core.bc import dirichlet, neumann
    from ns_tpu.ops import cheb
    from ns_tpu.solvers import (chorin_fd, chorin_spectral, direct_fd,
                                spectral_periodic as sp)

    rows = []
    dev = jax.devices()[0]

    def cavity(nx):
        dx = dy = 2.0 / (nx - 1)
        u_bc = [dirichlet(0, "left"), dirichlet(1, "right"),
                dirichlet(0, "top"), dirichlet(0, "bottom")]
        v_bc = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
        p_bc = [dirichlet(0, "top"), neumann(0, "bottom", dx, dy),
                neumann(0, "left", dx, dy), neumann(0, "right", dx, dy)]
        return u_bc, v_bc, p_bc

    # --- spectral periodic ------------------------------------------------
    for nx in (256, 512, 1024):
        for transform, prec in (("fft", "high"), ("matmul", "high"),
                                ("matmul", "default")):
            def mk(nt, nx=nx, transform=transform, prec=prec):
                cfg = sp.SpectralPeriodicConfig(
                    nt=nt, nx=nx, ny=nx, dt=5e-4, nu=1e-4, dtype="float32",
                    transform=transform, matmul_precision=prec)
                w0 = sp.decaying_turbulence_vorticity(cfg, seed=0,
                                                      k_peak=nx / 30)
                c0 = sp.init_from_vorticity(cfg, w0)
                roll = jax.jit(lambda c, cfg=cfg: sp.rollout_final(cfg, c))
                return lambda: roll(c0)
            per = slope_timeit(mk, 50, 200)
            tag = transform if transform == "fft" else f"matmul/{prec}"
            rows.append((f"spectral_periodic {nx}^2 ({tag})",
                         f"{1/per:.0f} steps/s",
                         f"{nx*nx/per/1e9:.2f}e9 cell-updates/s"))

    # --- compact-spectrum carry (the bench.py flagship path) --------------
    for prec, rg in (("high", False), ("default", False),
                     ("high", True), ("default", True)):
        def mk(nt, prec=prec, rg=rg):
            cfg = sp.SpectralPeriodicConfig(
                nt=nt, nx=1024, ny=1024, dt=5e-4, nu=1e-4, dtype="float32",
                transform="matmul", matmul_precision=prec,
                compact_spectrum=True, real_gemm=rg)
            w0 = sp.decaying_turbulence_vorticity(cfg, seed=0, k_peak=30.0)
            c0 = sp.init_from_vorticity(cfg, w0)
            roll = jax.jit(lambda c, cfg=cfg: sp.rollout_final(cfg, c))
            return lambda: roll(c0)
        per = slope_timeit(mk, 50, 200)
        tag = ("real-GEMM engine" if rg else "compact matmul") + f"/{prec}"
        rows.append((f"spectral_periodic 1024^2 ({tag})",
                     f"{1/per:.0f} steps/s",
                     f"{1024*1024/per/1e9:.2f}e9 cell-updates/s"))

    # --- ensemble: batch-64 trajectories at 1024^2 (north-star scale-out
    # config, here saturating ONE chip; on a v4-32 mesh the batch axis
    # shards 8-way with zero hot-loop collectives) -----------------------
    cfg = sp.SpectralPeriodicConfig(nt=20, nx=1024, ny=1024, dt=5e-4,
                                    nu=1e-4, dtype="float32",
                                    transform="matmul")
    B = 64
    w0 = jnp.stack([sp.decaying_turbulence_vorticity(cfg, seed=i, k_peak=30.0)
                    for i in range(B)])
    ops = sp.make_ops(cfg)
    tr = sp.make_transforms(cfg)

    @jax.jit
    def init_b(w0):
        h = tr[0](w0)
        return h, sp.nonlinear_term(h, ops, cfg, tr)

    carry = init_b(w0)
    step, _ = sp.make_step(cfg)  # batch-polymorphic

    def mk_ens(nt):
        @jax.jit
        def roll_b(c):
            def body(c, _):
                nc, _ = step(c)
                return nc, None
            c, _ = jax.lax.scan(body, c, None, length=nt)
            return c
        return lambda: roll_b(carry)

    per = slope_timeit(mk_ens, 5, 20, reps=2)
    rows.append((f"spectral_periodic ensemble B=64 @1024^2 (matmul)",
                 f"{1/per:.1f} ensemble-steps/s",
                 f"{B*cfg.nx*cfg.ny/per/1e9:.2f}e9 cell-updates/s"))

    # --- direct_fd ---------------------------------------------------------
    for nx, nit, nu in ((50, 50, 0.1), (64, 50, 0.02)):
        u_bc, v_bc, p_bc = cavity(nx)
        z = np.zeros((nx, nx))

        def mk(nt, nx=nx, nit=nit, nu=nu, bcs=(u_bc, v_bc, p_bc), z=z):
            s = direct_fd.NavierStokesSystem(z, z, z, *bcs, nt=nt,
                                             nit=nit, nx=nx, ny=nx, dt=5e-4,
                                             rho=1, nu=nu)
            return lambda: s.simulate()
        per = slope_timeit(mk, 50, 200)
        rows.append((f"direct_fd {nx}^2 cavity (nit={nit})",
                     f"{1/per:.0f} steps/s",
                     f"{nx*nx/per/1e6:.1f}e6 cell-updates/s"))

    # --- chorin_fd ----------------------------------------------------------
    for nx, nu, pallas, pmode in ((51, 0.1, False, "redblack"),
                                  (51, 0.1, True, "redblack"),
                                  (51, 0.1, False, "dst"),
                                  (128, 0.005, False, "redblack"),
                                  (128, 0.005, False, "dst")):
        u_bc, v_bc, p_bc = cavity(nx)
        z = np.zeros((nx, nx))

        def mk(nt, nx=nx, nu=nu, pallas=pallas, pmode=pmode,
               bcs=(u_bc, v_bc, p_bc), z=z):
            s = chorin_fd.NavierStokesSystem(
                z, z, z, *bcs, nt=nt, nit=200, nx=nx, ny=nx,
                dt=5e-4, rho=1, nu=nu, beta=1.25, method="semi_implicit",
                use_pallas=pallas, pressure_mode=pmode)
            return lambda: s.simulate()
        per = slope_timeit(mk, 50, 200)
        tag = " (pallas SOR)" if pallas else (
            " (dst direct pressure)" if pmode == "dst" else "")
        rows.append((f"chorin_fd {nx}^2 semi-implicit{tag}",
                     f"{1/per:.0f} steps/s",
                     f"{nx*nx/per/1e6:.1f}e6 cell-updates/s"))

    # --- chorin_spectral (corrected, stable; the parity-split half-flop
    # engine auto-enables at the measured crossover —
    # chorin_spectral._PARITY_MIN_INTERIOR) ----------------------------------
    from ns_tpu.solvers.chorin_spectral import _PARITY_MIN_INTERIOR
    for nx in (128, 256, 512, 1024):
        bc0 = [dirichlet(0, s) for s in ("left", "right", "top", "bottom")]
        x = cheb.gauss_lobatto(nx)
        X, Y = np.meshgrid(x, x, indexing="ij")
        u0 = 2 * (1 - X**2) ** 2 * (1 - Y**2) * (-2 * Y)
        v0 = -2 * (1 - X**2) * (-2 * X) * (1 - Y**2) ** 2

        def mk(nt, nx=nx, u0=u0, v0=v0, bc0=bc0):
            s = chorin_spectral.NavierStokesSystem(
                u0, v0, np.zeros((nx, nx)), bc0, bc0, nt=nt, nx=nx, ny=nx,
                dt=2e-4, rho=1, nu=0.1, dtype=jnp.float32,
                quirk_compat=False)
            return lambda: s.simulate()
        per = slope_timeit(mk, 50, 200, reps=2)
        tag = ", parity-split" if nx - 2 >= _PARITY_MIN_INTERIOR else ""
        rows.append((f"chorin_spectral(corrected{tag}) {nx}^2",
                     f"{1/per:.0f} steps/s",
                     f"{nx*nx/per/1e9:.2f}e9 cell-updates/s"))

    # --- 3D spectral family (matmul engine; fft rows in the RESULTS 3D
    # engine table — tools/bench_3d.py) --------------------------------------
    from ns_tpu.solvers import spectral3d as s3
    for n in (128, 256):
        def mk(nt, n=n):
            cfg3 = s3.Spectral3DConfig(nt=nt, nx=n, ny=n, nz=n, dt=5e-4,
                                       nu=6.25e-4, dtype="float32",
                                       transform="matmul",
                                       matmul_precision="default")
            c0 = s3.init_from_velocity(cfg3, s3.taylor_green_velocity(cfg3))
            roll3 = jax.jit(lambda c, cfg3=cfg3: s3.rollout_final(cfg3, c))
            return lambda: roll3(c0)
        per = slope_timeit(mk, 50, 200, reps=2)
        rows.append((f"spectral3d {n}^3 TGV (matmul/default)",
                     f"{1/per:.0f} steps/s",
                     f"{n**3/per/1e9:.2f}e9 cell-updates/s"))

    # --- publish gate: refuse to write files from a jitter-corrupted run.
    # A clamped slope formats as 1e12 steps/s, and no single-chip workload
    # here can exceed ~15e9 cell-updates/s (the 1024^2 compact-matmul
    # flagship at the HBM roofline, docs/roofline.md); any row past 50e9
    # means the tunnel's dispatch jitter exceeded the slope delta and the
    # WHOLE run is suspect (observed 2026-08-21: the same row swinging
    # 5-40x between runs). Print for diagnosis, write nothing.
    def _gcups(r):
        t = r[2]
        return (float(t.split("e9")[0]) if "e9 cell" in t
                else float(t.split("e6")[0]) / 1e3)
    bad = [r for r in rows if _gcups(r) > 50.0 or "1000000000000" in r[1]]
    if bad:
        for r in bad:
            print("IMPLAUSIBLE: | " + " | ".join(r) + " |")
        raise SystemExit(
            f"{len(bad)}/{len(rows)} rows implausible (slope jitter) — "
            "RESULTS.md/BASELINE.md NOT written; re-run when the tunnel "
            "is calm")

    out = ["# RESULTS — measured on " + str(dev), "",
           "Slope-timed marginal per-step rates (a 50-step and a 200-step",
           "warm rollout of the same workload; the fixed ~1-30 ms",
           "per-dispatch tunnel latency cancels in the slope — same",
           "protocol as the roofline/parity tables). Reference CPU oracle",
           "rates for comparison are in BASELINE.md (e.g. chorin_fd",
           "semi-implicit: ~1 step/s on CPU).", "",
           "| workload | steps/s | throughput |", "|---|---|---|"]
    for r in rows:
        out.append("| " + " | ".join(r) + " |")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "RESULTS.md")
    # preserve every hand-written '## ' analysis section below the table
    tail = ""
    if os.path.exists(path):
        prev = open(path).read()
        idx = prev.find("\n## ")
        if idx != -1:
            tail = prev[idx:]
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n" + tail)
    print("\n".join(out))

    # --- keep BASELINE.md's measured section in lockstep -------------------
    # BASELINE.md is the driver-facing oracle/summary file; its "Measured
    # ns_tpu rows" section is OWNED by this script (VERDICT r3 weak #4:
    # hand-maintained copies drifted 4x behind bench.py). The markers
    # bracket the generated region; everything outside is hand-written.
    bpath = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         "BASELINE.md")
    begin = "<!-- BEGIN MEASURED (generated by tools/bench_all.py) -->"
    end = "<!-- END MEASURED -->"
    gen = [begin,
           f"**Measured ns_tpu rows** ({dev}, float32; regenerated by "
           "`python tools/bench_all.py` — identical to RESULTS.md's "
           "table, quoted here so the driver-facing summary cannot "
           "drift):", "",
           "| workload | steps/s | throughput |", "|---|---|---|"]
    gen += ["| " + " | ".join(r) + " |" for r in rows]
    gen.append(end)
    btxt = open(bpath).read()
    i, j = btxt.find(begin), btxt.find(end)
    if i == -1 or j == -1:
        raise SystemExit(f"BASELINE.md is missing the {begin!r} / {end!r} "
                         "markers; restore them before regenerating")
    open(bpath, "w").write(btxt[:i] + "\n".join(gen) + btxt[j + len(end):])
    print(f"(BASELINE.md measured section regenerated: {len(rows)} rows)")


if __name__ == "__main__":
    main()
