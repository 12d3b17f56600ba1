"""Parity-split vs dense Chebyshev engine: TPU speed + f32 drift check.

Measures per-step time (warm, slope-timed: the difference of a long and a
short scanned rollout inside one jit, divided by the step-count gap —
dispatch latency cancels) and the n-step f32 field drift between the two
engines at 256^2/512^2/1024^2. Source of the RESULTS.md
"Parity-split Chebyshev engine" table.

Usage: python tools/verify_parity_cheb.py [--form auto|both]
  auto (default): dense vs the solver's auto-gated parity engine
  both: dense vs composed vs quadrant eigen-solve schedules (the
        measurement behind the ChorinSpectralConfig.parity_eig_form gate)
"""

import argparse
import os
import sys
import time

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import jax.numpy as jnp
from ns_tpu.core.bc import dirichlet
from ns_tpu.solvers import chorin_spectral as cs
from ns_tpu.utils.host import to_host, sync

ap = argparse.ArgumentParser()
ap.add_argument("--form", default="auto", choices=["auto", "both"])
args = ap.parse_args()

for nx in (256, 512, 1024):
    ny = nx
    dx = dy = 2.0 / nx
    u_bc = [dirichlet(0.0, "left", dx, dy), dirichlet(0.0, "right", dx, dy),
            dirichlet(0.0, "bottom", dx, dy), dirichlet(1.0, "top", dx, dy)]
    v_bc = [dirichlet(0.0, s, dx, dy) for s in ("left", "right", "bottom", "top")]
    z = np.zeros((nx, ny), np.float32)

    variants = [("dense", dict(parity_split=False)),
                ("parity", dict(parity_split=True))]
    if args.form == "both":
        variants = [("dense", dict(parity_split=False)),
                    ("composed", dict(parity_split=True,
                                      parity_eig_form="composed")),
                    ("quadrant", dict(parity_split=True,
                                      parity_eig_form="quadrant"))]

    res = {}
    for name, kw in variants:
        cfg = cs.ChorinSpectralConfig(nt=200, nx=nx, ny=ny, dt=1e-4, nu=0.1,
                                      quirk_compat=False,
                                      deflate_pressure_nullspace=True,
                                      matmul_precision="highest", **kw)
        state0 = cs.init_state(cfg, z, z, z, u_bc, v_bc, dtype=jnp.float32)
        step = cs.make_step(cfg, u_bc, v_bc, dtype=jnp.float32)

        def roll_n(n):
            @jax.jit
            def roll(s):
                # rollout path: AB-derivative cache threaded through the
                # scan (bitwise-identical to the plain step — cached_step)
                def body(c, _):
                    return step.cached(*c), None
                (s, _), _ = jax.lax.scan(body, (s, step.seed(s)), None,
                                         length=n)
                return s.u, s.v, s.p
            return roll

        n_hi = 512 if nx <= 512 else 128
        n_lo = 64 if nx <= 512 else 16
        r_hi, r_lo = roll_n(n_hi), roll_n(n_lo)
        u, v, p = (to_host(a) for a in r_lo(state0))
        assert np.isfinite(u).all() and np.isfinite(v).all(), \
            f"nonfinite {name}"
        res[name] = dict(u=u, v=v, p=p)
        sync(r_hi(state0)[0]); sync(r_lo(state0)[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); sync(r_hi(state0)[0]); t_hi = time.perf_counter() - t0
            t0 = time.perf_counter(); sync(r_lo(state0)[0]); t_lo = time.perf_counter() - t0
            best = min(best, (t_hi - t_lo) / (n_hi - n_lo))
        gcups = nx * ny / best / 1e9
        res[name]["gcups"] = gcups
        print(f"{nx}^2 {name}: per-step {best*1e6:.1f} us, "
              f"{gcups:.2f} Gcups", flush=True)

    for name in res:
        if name == "dense":
            continue
        du = np.abs(res["dense"]["u"] - res[name]["u"]).max()
        scale = np.abs(res["dense"]["u"]).max()
        print(f"{nx}^2 {name}: "
              f"{res[name]['gcups']/res['dense']['gcups']:.2f}x vs dense, "
              f"{n_lo}-step f32 max|du|={du:.3e} (u scale {scale:.3f})",
              flush=True)
