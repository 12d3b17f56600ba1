"""Train a surrogate model: one CLI covering the reference's four drivers.

Argument surface mirrors the reference (spectral_ode.py:141-150: --npz-path
--out-dir --n-iters --n-coeffs --gpu-device; out_dir gets the _{n_coeffs}
suffix) plus --model to choose the family and --resume (new capability —
the reference cannot resume). --gpu-device is accepted for drop-in
compatibility and ignored (device selection is JAX's).

Examples:
  python -m ns_tpu.cli.train --model basis_ode --npz-path data_semi_implicit.npz
  python -m ns_tpu.cli.train --model rnn --n-iters 1000
"""

import argparse
import os

import numpy as np

from ns_tpu.train.trainer import MODELS, TrainConfig, Trainer


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", type=str, default="basis_ode", choices=MODELS)
    p.add_argument("--npz-path", type=str, default="./data_semi_implicit.npz")
    p.add_argument("--out-dir", type=str, default=None,
                   help="default: ./checkpoints/<model>")
    p.add_argument("--n-iters", type=int, default=1000)
    p.add_argument("--n-coeffs", type=int, default=10)
    p.add_argument("--n-frames", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--hidden-dim", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt-every", type=int, default=10,
                   help="checkpoint interval; also the per-dispatch train "
                        "chunk size (larger = faster on high-latency links)")
    p.add_argument("--fno-rollout-steps", type=int, default=1,
                   help="fno families: k-step rollout training (pushforward)")
    p.add_argument("--fno-modes", type=int, default=12,
                   help="fno families: spectral modes kept per axis")
    p.add_argument("--fno-width", type=int, default=32,
                   help="fno families: channel width")
    p.add_argument("--fno-transform", default="auto",
                   choices=["auto", "fft", "matmul"],
                   help="fno families: spectral-transform engine (matmul = "
                        "retained-mode DFT GEMMs on the MXU, faster at "
                        "small/medium grids; engines agree to fp "
                        "rounding)")
    p.add_argument("--fno-precision", default=None,
                   choices=["default", "high", "highest"],
                   help="fno families: GEMM precision in the FNO layers "
                        "(default: jnp default — bf16-class on TPU; "
                        "'highest' tightens TPU cross-engine checkpoint "
                        "transfer to CPU-test tolerance)")
    p.add_argument("--input-noise", type=float, default=0.0,
                   help="fno families: train-time Gaussian input noise, as a "
                        "fraction of the data std (autoregressive "
                        "stabilizer); 0 disables")
    p.add_argument("--fno-remat", action="store_true",
                   help="fno families: rematerialize each k-step unroll step "
                        "(trades ~2x recompute for O(k) less activation "
                        "memory; use when rollout training OOMs)")
    p.add_argument("--fno-project", action="store_true",
                   help="fno/fno3d: compose the exact spectral divergence "
                        "(2D) / Leray (3D) projection into the "
                        "autoregressive rollout")
    p.add_argument("--no-fno-dealias", action="store_true",
                   help="fno_w/fno3d: disable the 2/3-band rollout filter")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--n-models", type=int, default=1,
                   help=">1 trains an ensemble of independently-seeded "
                        "models in one vmapped step, sharded over the "
                        "'ensemble' mesh axis when --mesh allows")
    p.add_argument("--mesh", type=str, default="auto",
                   choices=["auto", "none"],
                   help="ensemble mesh: 'auto' (largest usable device "
                        "count), 'none' (single device), only with "
                        "--n-models > 1")
    p.add_argument("--batch-size", type=int, default=0,
                   help="fno families: sample this many training windows "
                        "per step (with replacement) instead of the "
                        "reference's full-batch objective — the path that "
                        "scales to large multi-trajectory datasets; 0 = "
                        "full batch")
    p.add_argument("--lr-schedule", default="constant",
                   choices=["constant", "cosine"],
                   help="learning-rate schedule over n_iters (resume "
                        "continues mid-schedule — the step count rides "
                        "opt_state)")
    p.add_argument("--warmup-iters", type=int, default=0,
                   help="linear 0 -> lr warmup iterations (composes with "
                        "either schedule)")
    p.add_argument("--schedule-horizon", type=int, default=None,
                   help="total iterations the schedule decays over "
                        "(default: this run's --n-iters). Pass the planned "
                        "total when training in stop/resume segments")
    p.add_argument("--grad-clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 disables); the usual "
                        "guard for k-step pushforward training")
    p.add_argument("--dp", type=int, default=1,
                   help="data-parallel devices for single-model training "
                        "(fno families shard the training-window axis, rnn "
                        "the trajectory axis; params replicated, grads "
                        "all-reduced). Composes with --dist for "
                        "multi-host meshes; not with --n-models > 1 "
                        "(ensembles already shard their own axis)")
    p.add_argument("--dist", action="store_true",
                   help="bootstrap jax.distributed from NS_TPU_* env "
                        "(python -m ns_tpu.launch sets them) before "
                        "building the data mesh")
    p.add_argument("--gpu-device", type=int, default=0,
                   help="accepted for reference-CLI compatibility; ignored")
    args = p.parse_args(argv)
    if args.dist:
        from ns_tpu.parallel import distributed
        distributed.initialize()
    if args.dp > 1 and args.n_models > 1:
        p.error("--dp shards single-model training; --n-models > 1 "
                "ensembles shard the 'ensemble' axis instead (use --mesh)")

    out_dir = args.out_dir or f"./checkpoints/{args.model}"
    out_dir = f"{out_dir}_{args.n_coeffs}"  # ref spectral_ode.py:150

    cfg = TrainConfig(model=args.model, npz_path=args.npz_path,
                      out_dir=out_dir, n_iters=args.n_iters,
                      n_coeffs=args.n_coeffs, lr=args.lr,
                      hidden_dim=args.hidden_dim, n_frames=args.n_frames,
                      seed=args.seed, ckpt_every=args.ckpt_every,
                      fno_rollout_steps=args.fno_rollout_steps,
                      fno_transform=args.fno_transform,
                      fno_precision=args.fno_precision,
                      fno_modes=args.fno_modes, fno_width=args.fno_width,
                      fno_project=args.fno_project,
                      input_noise=args.input_noise,
                      fno_remat=args.fno_remat,
                      fno_dealias=not args.no_fno_dealias,
                      resume=args.resume, dp=args.dp,
                      lr_schedule=args.lr_schedule,
                      warmup_iters=args.warmup_iters,
                      schedule_horizon=args.schedule_horizon,
                      grad_clip=args.grad_clip,
                      batch_size=args.batch_size)
    if args.n_models > 1:
        from ns_tpu.train.ensemble import EnsembleTrainer
        mesh = "auto" if args.mesh == "auto" else None
        tr = EnsembleTrainer(cfg, args.n_models, mesh=mesh)
    else:
        tr = Trainer(cfg)
    tr.train()
    import jax
    if jax.process_index() == 0:
        # multi-controller: train state is replicated, so the coordinator's
        # rollout is the whole answer — one writer, no same-file races
        # (the rollout itself is collective-free, safe to skip elsewhere)
        extrap = tr.extrapolate()
        out = os.path.join(out_dir, "extrapolation.npy")
        np.save(out, extrap)
        print(f"saved {out} shape={extrap.shape}")


if __name__ == "__main__":
    main()
