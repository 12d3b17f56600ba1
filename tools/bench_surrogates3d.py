"""3D surrogate extrapolation-quality sweep -> printed markdown rows.

The 3D counterpart of tools/bench_surrogates.py (VERDICT r3 next #1):
generate a 3D periodic DNS rollout (decaying isotropic turbulence by
default, Kolmogorov-forced stationary turbulence with --forcing), train
each surrogate family on the FIRST 100 frames, then score the
full-horizon closed-loop autoregressive rollout against the solver:
relative L2 on the train horizon and the full horizon, plus the
time-mean energy-spectrum relative error (the physics metric of
`cli/evaluate.py::physics_metrics3d` — closed-loop rollouts can have
O(1) pointwise error from chaotic decorrelation while still carrying the
right energy distribution; the spectrum column is what separates "wrong
phases" from "wrong physics").

Frame semantics match the 2D protocol: --frame-stride solver steps per
saved frame (default 100 -> the 200-frame horizon spans 20 time units,
where persistence fails), persistence (predict frame 0 forever) printed
first as the calibration row every model must beat.

The jobs compare the raw (u,v,w,p) contract (fno3d) against the
vorticity representation (fno3d_w: predict omega = curl u, recover
velocity by Biot-Savart — exactly divergence-free at every frame,
models/vorticity3d.py), the 2D round-3 lesson ported to 3D.

Usage: python tools/bench_surrogates3d.py [--nx 64] [--n-iters 300]
       [--frame-stride 100] [--forcing kolmogorov]
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
    ap.add_argument("--n-iters", type=int, default=300)
    ap.add_argument("--frame-stride", type=int, default=100,
                    help="solver steps per saved frame")
    ap.add_argument("--nu", type=float, default=6.25e-4)
    ap.add_argument("--fno-width", type=int, default=24)
    ap.add_argument("--fno-modes", type=int, default=None,
                    help="modes per axis (default: nx/4, capped 12 - "
                         "width 24 / modes 12 / batch 4 fits the 16 GB "
                         "chip with the 100-frame 64^3 dataset resident; "
                         "modes 16 / width 32 / batch 8 OOMs)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--lr-schedule", default="constant",
                    choices=["constant", "cosine"],
                    help="cosine + warmup + clip is the long-run recipe: "
                         "constant lr 1e-3 is fine at 300 iters but "
                         "measured DIVERGENT by 1500 (train rel 0.92 and "
                         "a 1e13 rollout)")
    ap.add_argument("--warmup-iters", type=int, default=0)
    ap.add_argument("--grad-clip", type=float, default=0.0)
    ap.add_argument("--batch-size", type=int, default=4,
                    help="training windows sampled per step (full-batch "
                         "3D training at 64^3 exceeds HBM; stochastic "
                         "minibatching is the 3D path)")
    ap.add_argument("--data", default=None,
                    help="npz cache path: reuse the solver dataset if it "
                         "exists, else generate and save there (the 64^3 "
                         "stride-100 rollout costs ~20 min)")
    ap.add_argument("--only", nargs="*", default=None,
                    help="substring filter on job names (default: all)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests / no TPU)")
    ap.add_argument("--forcing", default="none",
                    choices=["none", "kolmogorov"],
                    help="'kolmogorov': statistically-stationary forced "
                         "turbulence (train/test distributions match)")
    ap.add_argument("--forcing-k", type=int, default=2)
    ap.add_argument("--forcing-amp", type=float, default=0.1)
    ap.add_argument("--spinup", type=int, default=None,
                    help="solver steps discarded before the first saved "
                         "frame (default when forced: one viscous "
                         "equilibration time; else 0)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ns_tpu.cli.evaluate import physics_metrics3d
    from ns_tpu.solvers import spectral3d as s3
    from ns_tpu.train.trainer import TrainConfig, Trainer
    from ns_tpu.utils.host import to_host

    stride = args.frame_stride
    if args.spinup is not None:
        spinup = args.spinup
    elif args.forcing != "none":
        spinup = int(round(1.0 / (args.nu * args.forcing_k**2 * 1e-3)))
        print(f"(spinup: {spinup} steps = one viscous equilibration time)",
              flush=True)
    else:
        spinup = 0
    n = args.nx
    cfg = s3.Spectral3DConfig(nt=args.nt * stride, nx=n, ny=n, nz=n,
                              dt=1e-3, nu=args.nu, dtype="float32",
                              transform="auto",
                              forcing=args.forcing,
                              forcing_k=args.forcing_k,
                              forcing_amp=args.forcing_amp)

    from functools import partial

    strided = jax.jit(partial(s3.simulate_strided, cfg),
                      static_argnames=("n_frames", "stride", "spinup"))
    if args.data and os.path.exists(args.data):
        d = np.load(args.data)
        u, v, w, p = d["u"], d["v"], d["w"], d["p"]
        print(f"(data: cached {args.data}, {u.shape})", flush=True)
    else:
        u0 = s3.random_solenoidal_velocity(cfg, seed=0,
                                           k_peak=max(3.0, n / 16))
        t0 = time.perf_counter()
        u, v, w, p = (np.asarray(a) for a in to_host(
            strided(u0, n_frames=args.nt, stride=stride, spinup=spinup)))
        print(f"(data: {args.nt} frames at {n}^3, stride {stride}, "
              f"{time.perf_counter() - t0:.0f} s)", flush=True)
    tmp = tempfile.mkdtemp()
    npz = args.data or os.path.join(tmp, "data3d.npz")
    if not os.path.exists(npz):
        np.savez(npz, u=u, v=v, w=w, p=p)
    obs_full = np.stack([u, v, w, p], axis=1)  # (nt, 4, nx, ny, nz)

    def rel(pred, target):
        return float(np.linalg.norm(pred - target) / np.linalg.norm(target))

    def spec_err(pred):
        return physics_metrics3d(pred.astype(np.float32),
                                 obs_full.astype(np.float32))[
            "spectrum_rel_l2"]

    persist = np.repeat(obs_full[:1], obs_full.shape[0], axis=0)
    print(f"| persistence (predict frame 0) | "
          f"{rel(persist[:100], obs_full[:100]):.2f} | "
          f"{rel(persist, obs_full):.2f} | {spec_err(persist):.3f} | 0 s |",
          flush=True)

    modes = args.fno_modes or min(12, n // 4)
    jobs = [("fno3d (uvwp, next-step)", dict(model="fno3d")),
            ("fno3d (uvwp, 4-step + projection)",
             dict(model="fno3d", fno_rollout_steps=4, fno_project=True,
                  fno_remat=True)),
            ("fno3d_w (vorticity, next-step)", dict(model="fno3d_w")),
            ("fno3d_w (vorticity, 4-step)",
             dict(model="fno3d_w", fno_rollout_steps=4, fno_remat=True)),
            ("fno3d_w (vorticity, 4-step + noise 0.02)",
             dict(model="fno3d_w", fno_rollout_steps=4, fno_remat=True,
                  input_noise=0.02)),
            ("fno3d_a (vector potential, next-step)",
             dict(model="fno3d_a")),
            ("fno3d_a (vector potential, 4-step)",
             dict(model="fno3d_a", fno_rollout_steps=4, fno_remat=True)),
            ("fno3d_a (vector potential, 4-step + noise 0.02)",
             dict(model="fno3d_a", fno_rollout_steps=4, fno_remat=True,
                  input_noise=0.02))]
    if args.only:
        jobs = [(nm, kw) for nm, kw in jobs
                if any(s in nm for s in args.only)]
    for name, kw in jobs:
        tc = TrainConfig(npz_path=npz, out_dir=os.path.join(tmp, name),
                         n_iters=args.n_iters, n_frames=100, ckpt_every=50,
                         fno_modes=modes, fno_width=args.fno_width,
                         batch_size=args.batch_size, lr=args.lr,
                         lr_schedule=args.lr_schedule,
                         warmup_iters=args.warmup_iters,
                         grad_clip=args.grad_clip, **kw)
        t0 = time.perf_counter()
        tr = Trainer(tc)
        tr.train(progress=False)
        train_s = time.perf_counter() - t0
        ex = tr.extrapolate()
        print(f"| {name} | {rel(ex[:100], obs_full[:100]):.2f} | "
              f"{rel(ex, obs_full):.2f} | {spec_err(ex):.3f} | "
              f"{train_s:.0f} s |", flush=True)

    print(f"\n# {n}^3, {args.n_iters} iters, stride {stride}, "
          f"forcing={args.forcing} "
          f"(| model | train rel | full rel | spectrum rel | train time |)")


if __name__ == "__main__":
    main()
