"""Twin-trajectory chaos floor for the surrogate protocols -> markdown rows.

RESULTS.md's surrogate tables score closed-loop rollouts pointwise
(relative L2) and spectrally, and the 3D section claims "pointwise rel
err ~1.0 at 20 time units is the chaotic decorrelation floor". This tool
measures that floor instead of asserting it: evolve the exact protocol
initial condition AND a twin perturbed by a relative-1e-6 solenoidal
field with the SAME solver (tools/bench_surrogates{,3d}.py configs), and
report their pointwise relative L2 per saved frame. Past the frame where
the twins decorrelate, NO pointwise-faithful predictor — including a
bit-exact copy of the solver fed an imperceptibly different IC — can
hold rel err below that curve; only statistical metrics (the spectrum
column) remain meaningful. Two fully decorrelated equal-energy fields
sit at rel err ~sqrt(2).

Usage: python tools/chaos_floor.py [--dims 2 3] [--nx 64] [--nt 200]
       [--frame-stride 100] [--eps 1e-6] [--cpu]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def _rel_per_frame(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Relative L2 between stacked-field rollouts, per frame."""
    axes = tuple(range(1, a.ndim))
    num = np.sqrt(np.sum((a - b) ** 2, axis=axes))
    den = np.sqrt(np.sum(b**2, axis=axes))
    return num / den


def _report(name: str, rel: np.ndarray) -> None:
    nt = rel.shape[0]
    probes = [i for i in (25, 50, 100, nt - 1) if i < nt]
    cells = " | ".join(
        f"{rel[i]:.3f}" if rel[i] >= 5e-4 else f"{rel[i]:.1e}"
        for i in probes)

    def first_above(th):
        idx = np.argmax(rel > th)
        return str(int(idx)) if rel[idx] > th else "never"

    print(f"| {name} | {cells} | {first_above(0.5)} | {first_above(1.0)} |",
          flush=True)


def floor_2d(args) -> None:
    import jax
    from functools import partial

    from ns_tpu.solvers import spectral_periodic as sp
    from ns_tpu.utils.host import to_host

    n, stride = args.nx, args.frame_stride
    cfg = sp.SpectralPeriodicConfig(nt=args.nt * stride, nx=n, ny=n,
                                    dt=1e-3, nu=1e-3, dtype="float32")
    w0 = sp.decaying_turbulence_vorticity(cfg, seed=0,
                                          k_peak=max(4.0, n / 12))
    dw = sp.decaying_turbulence_vorticity(cfg, seed=1,
                                          k_peak=max(4.0, n / 12))
    w0 = np.asarray(w0)
    dw = np.asarray(dw)
    w0b = w0 + args.eps * (np.linalg.norm(w0) / np.linalg.norm(dw)) * dw

    roll = jax.jit(partial(sp.simulate_strided, cfg),
                   static_argnames=("n_frames", "stride"))
    t0 = time.perf_counter()
    a = np.stack([np.asarray(x) for x in
                  to_host(roll(w0, n_frames=args.nt, stride=stride))],
                 axis=1)
    b = np.stack([np.asarray(x) for x in
                  to_host(roll(w0b, n_frames=args.nt, stride=stride))],
                 axis=1)
    el = time.perf_counter() - t0
    _report(f"2D {n}^2 nu=1e-3 stride {stride} (uvp)", _rel_per_frame(b, a))
    print(f"  ({el:.0f} s for both trajectories)", flush=True)


def floor_3d(args) -> None:
    import jax
    from functools import partial

    from ns_tpu.solvers import spectral3d as s3
    from ns_tpu.utils.host import to_host

    n, stride = args.nx, args.frame_stride
    cfg = s3.Spectral3DConfig(nt=args.nt * stride, nx=n, ny=n, nz=n,
                              dt=1e-3, nu=args.nu3d, dtype="float32",
                              transform="auto")
    u0 = np.asarray(s3.random_solenoidal_velocity(
        cfg, seed=0, k_peak=max(3.0, n / 16)))
    du = np.asarray(s3.random_solenoidal_velocity(
        cfg, seed=1, k_peak=max(3.0, n / 16)))
    u0b = u0 + args.eps * (np.linalg.norm(u0) / np.linalg.norm(du)) * du

    roll = jax.jit(partial(s3.simulate_strided, cfg),
                   static_argnames=("n_frames", "stride"))
    t0 = time.perf_counter()
    a = np.stack([np.asarray(x) for x in
                  to_host(roll(u0, n_frames=args.nt, stride=stride))],
                 axis=1)
    b = np.stack([np.asarray(x) for x in
                  to_host(roll(u0b, n_frames=args.nt, stride=stride))],
                 axis=1)
    el = time.perf_counter() - t0
    _report(f"3D {n}^3 nu={args.nu3d:g} stride {stride} (uvwp)",
            _rel_per_frame(b, a))
    print(f"  ({el:.0f} s for both trajectories)", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=int, nargs="*", default=[2, 3])
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--nt", type=int, default=200)
    ap.add_argument("--frame-stride", type=int, default=100)
    ap.add_argument("--nu3d", type=float, default=6.25e-4,
                    help="3D viscosity (bench_surrogates3d default)")
    ap.add_argument("--eps", type=float, default=1e-6,
                    help="relative IC perturbation amplitude")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    nt = args.nt
    probes = [i for i in (25, 50, 100, nt - 1) if i < nt]
    head = " | ".join(f"rel@f{i}" for i in probes)
    print(f"| twin-solver protocol (IC perturbed {args.eps:g} relative) "
          f"| {head} | first>0.5 | first>1.0 |", flush=True)
    print("|---|" + "---|" * (len(probes) + 2), flush=True)
    if 2 in args.dims:
        floor_2d(args)
    if 3 in args.dims:
        floor_3d(args)


if __name__ == "__main__":
    main()
