"""Surrogate extrapolation-quality sweep -> printed markdown rows.

Reproduces the RESULTS.md surrogate table protocol at a chosen resolution:
generate a decaying-turbulence rollout with the periodic spectral solver,
train each surrogate on the FIRST 100 frames (the reference's
teacher-forced protocol, spectral_ode.py:158-167), then run the
full-horizon autoregressive extrapolation and report relative L2 errors on
the train horizon and the full horizon.

The `--frame-stride` knob sets how many solver steps separate saved
frames. At stride 1 (the raw reference protocol) the 200-frame horizon
spans only 0.2 time units and the flow barely evolves: the PERSISTENCE
baseline (predict frame 0 forever) scores rel err 0.015 — every
surrogate must be read against that. The default stride 100 makes the
200-frame horizon span 20 time units (~6 eddy turnovers at the
initial w_rms ~0.29; measured persistence 0.62 train / 1.06 full at
64^2) — a task where beating the baseline means modeling dynamics, not
reproducing a near-identity map. The persistence row is always printed
first.

Usage: python tools/bench_surrogates.py [--nx 64] [--n-iters 400]
       [--frame-stride 100]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--nt", type=int, default=200)
    ap.add_argument("--n-iters", type=int, default=400)
    ap.add_argument("--n-coeffs", type=int, default=10)
    ap.add_argument("--frame-stride", type=int, default=100,
                    help="solver steps per saved frame (1 = the raw "
                         "near-static protocol)")
    ap.add_argument("--fno-width", type=int, default=32,
                    help="channel width applied to every fno job")
    ap.add_argument("--fno-remat", action="store_true",
                    help="remat the k-step unroll (large-grid rollouts)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filter on job names (default: all)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests / no TPU)")
    ap.add_argument("--forcing", default="none",
                    choices=["none", "kolmogorov", "fno"],
                    help="body forcing: benchmark on statistically-"
                         "STATIONARY turbulence (train/test distributions "
                         "match — the standard FNO-paper setting) instead "
                         "of the decaying task")
    ap.add_argument("--forcing-k", type=int, default=4)
    ap.add_argument("--forcing-amp", type=float, default=0.1)
    ap.add_argument("--spinup", type=int, default=None,
                    help="solver steps discarded before the first saved "
                         "frame (default when forced: one viscous "
                         "equilibration time 1/(nu*k^2*dt) steps, so "
                         "training data is statistically stationary, "
                         "not spin-up transient; else 0)")
    ap.add_argument("--n-traj", type=int, default=1,
                    help="> 1: train the operator families on N "
                         "independently-seeded trajectories and ALSO "
                         "score each model on a held-out trajectory "
                         "(seed N) — generalization to an unseen initial "
                         "condition; single-trajectory families are "
                         "skipped")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from ns_tpu.io.npz import save_rollout
    from ns_tpu.solvers import spectral_periodic as sp
    from ns_tpu.train.trainer import TrainConfig, Trainer

    stride = args.frame_stride
    nsteps = args.nt * stride
    if args.spinup is not None:
        spinup = args.spinup
    elif args.forcing != "none":
        spinup = int(round(1.0 / (1e-3 * args.forcing_k**2 * 1e-3)))
        print(f"(spinup: {spinup} steps = one viscous equilibration "
              f"time)", flush=True)
    else:
        spinup = 0
    cfg = sp.SpectralPeriodicConfig(nt=nsteps, nx=args.nx, ny=args.nx,
                                    dt=1e-3, nu=1e-3, dtype="float32",
                                    forcing=args.forcing,
                                    forcing_k=args.forcing_k,
                                    forcing_amp=args.forcing_amp)

    # strided rollout that materializes ONLY the saved frames (a full
    # simulate() stack of nt*stride frames OOMs the chip past 64^2) —
    # the solver's simulate_strided, jitted once and reused across seeds
    from functools import partial

    strided_rollout = jax.jit(partial(sp.simulate_strided, cfg),
                              static_argnames=("n_frames", "stride",
                                               "spinup"))

    from ns_tpu.utils.host import to_host

    def gen(seed):
        w0 = sp.decaying_turbulence_vorticity(cfg, seed=seed,
                                              k_peak=max(4.0, args.nx / 12))
        # to_host: the rollout executable contains complex spectral ops
        return tuple(np.asarray(a) for a in to_host(
            strided_rollout(w0, n_frames=args.nt, stride=stride,
                            spinup=spinup)))

    tmp = tempfile.mkdtemp()
    npz = os.path.join(tmp, "data.npz")
    if args.n_traj > 1:
        # N training trajectories (seeds 0..N-1) + one HELD-OUT (seed N):
        # generalization to an unseen initial condition, the axis the
        # reference's single-rollout protocol cannot measure
        trajs = [gen(s) for s in range(args.n_traj + 1)]
        save_rollout(npz, *(np.stack([t[i] for t in trajs[:-1]])
                            for i in range(3)))
        u, v, p = trajs[0]
        holdout_npz = os.path.join(tmp, "holdout.npz")
        save_rollout(holdout_npz, *trajs[-1])
        ho_full = np.stack(trajs[-1], axis=1)   # (nt, 3, nx, ny)
    else:
        u, v, p = gen(0)
        save_rollout(npz, u, v, p)
        holdout_npz = ho_full = None
    obs_full = np.stack([u, v, p], axis=1)  # (nt, 3, nx, ny), traj 0

    def rel(pred, target):
        return float(np.linalg.norm(pred - target) / np.linalg.norm(target))

    # the do-nothing calibration every row must beat to mean anything
    persist = np.repeat(obs_full[:1], obs_full.shape[0], axis=0)
    print(f"| persistence (predict frame 0) | "
          f"{rel(persist[:100], obs_full[:100]):.2f} | "
          f"{rel(persist, obs_full):.2f} | 0 s |", flush=True)

    rows = []
    modes = max(12, args.nx // 5)
    # full dealiased band: the surrogate can represent every mode the
    # solver keeps (|k| < nx/3)
    full_modes = args.nx // 3 + 1
    jobs = [("fno (next-step)", dict(model="fno", fno_modes=modes)),
            ("fno (4-step rollout training)",
             dict(model="fno", fno_rollout_steps=4, fno_modes=modes)),
            ("fno (4-step + rollout projection)",
             dict(model="fno", fno_rollout_steps=4, fno_modes=modes,
                  fno_project=True)),
            ("fno_w (vorticity, next-step)",
             dict(model="fno_w", fno_modes=full_modes)),
            ("fno_w (vorticity, 4-step)",
             dict(model="fno_w", fno_rollout_steps=4,
                  fno_modes=full_modes)),
            ("fno_w (vorticity, 8-step)",
             dict(model="fno_w", fno_rollout_steps=8,
                  fno_modes=full_modes)),
            ("fno_psi (streamfunction head, next-step)",
             dict(model="fno_psi", fno_modes=modes)),
            ("fno_psi (streamfunction head, 4-step)",
             dict(model="fno_psi", fno_rollout_steps=4, fno_modes=modes)),
            ("fno (4-step + noise 0.02)",
             dict(model="fno", fno_rollout_steps=4, fno_modes=modes,
                  input_noise=0.02)),
            ("fno_w (vorticity, next-step + noise 0.02)",
             dict(model="fno_w", fno_modes=full_modes, input_noise=0.02)),
            ("fno_w (8-member vmapped ensemble, mean)",
             dict(model="fno_w", fno_modes=full_modes, n_models=8)),
            ("basis_ode", dict(model="basis_ode"))]
    if args.only:
        jobs = [(n, kw) for n, kw in jobs
                if any(s in n for s in args.only)]
    if args.n_traj > 1:
        skipped = [n for n, kw in jobs
                   if kw.get("model", "") not in ("fno", "fno_w", "fno_psi", "rnn")]
        if skipped:
            print(f"(--n-traj: skipping single-trajectory families: "
                  f"{skipped})", flush=True)
        jobs = [(n, kw) for n, kw in jobs
                if kw.get("model", "") in ("fno", "fno_w", "fno_psi",
                                           "rnn")]
    for name, kw in jobs:
        kw = dict(kw)
        n_models = kw.pop("n_models", 1)
        if kw.get("model", "").startswith("fno"):
            kw.setdefault("fno_width", args.fno_width)
            kw.setdefault("fno_remat", args.fno_remat)
        tc = TrainConfig(npz_path=npz, out_dir=os.path.join(tmp, name),
                         n_iters=args.n_iters, n_coeffs=args.n_coeffs,
                         n_frames=100, ckpt_every=50, **kw)
        t0 = time.perf_counter()
        if n_models > 1:
            from ns_tpu.train.ensemble import EnsembleTrainer
            tr = EnsembleTrainer(tc, n_models)
            tr.train(progress=False)
            train_s = time.perf_counter() - t0
            ex = tr.extrapolate().mean(axis=0)  # ensemble-mean rollout
        else:
            tr = Trainer(tc)
            tr.train(progress=False)
            train_s = time.perf_counter() - t0
            ex = tr.extrapolate()
        row = [name, rel(ex[:100], obs_full[:100]), rel(ex, obs_full),
               train_s]
        line = (f"| {name} | {row[1]:.2f} | {row[2]:.2f} "
                f"| {train_s:.0f} s |")
        if holdout_npz is not None:
            # closed-loop rollout from the HELD-OUT trajectory's frame 0
            # (ensembles score their member-mean rollout)
            ho = tr.extrapolate(npz_path=holdout_npz)
            if n_models > 1:
                ho = ho.mean(axis=0)
            row.append(rel(ho, ho_full))
            line += f" heldout {row[-1]:.2f} |"
        rows.append(tuple(row))
        print(line, flush=True)

    print(f"\n# {args.nx}^2, {args.n_iters} iters, n_traj={args.n_traj} "
          f"(| model | train rel | full rel | train time "
          f"{'| heldout rel ' if holdout_npz else ''}|)")


if __name__ == "__main__":
    main()
