"""Serve a trained surrogate checkpoint over HTTP.

    python -m ns_tpu.cli.serve --ckpt checkpoints/fno_w_10 [--port 8765]

The production counterpart the reference lacks entirely: its trained
models can only be exercised by re-running the training script's eval
tail (ref neural_spectral/spectral_ode.py:208-224). Here a long-lived
process loads the checkpoint, compiles the rollout once (per request
shape), and answers any-horizon extrapolation requests; see
ns_tpu/serve/server.py for the wire protocol.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt",
                     help="surrogate checkpoint.npz path or its directory")
    src.add_argument("--solver", action="store_true",
                     help="serve the classical periodic spectral solver "
                          "instead of a surrogate — the ORACLE behind the "
                          "same request contract, for on-demand ground "
                          "truth / A-B against a surrogate endpoint")
    p.add_argument("--dims", type=int, default=2, choices=[2, 3],
                   help="solver mode: 2 serves the periodic spectral "
                        "solver ((3, nx, nx) u/v/p frames); 3 serves the "
                        "3D family ((4, nx, nx, nx) u/v/w/p frames, nu "
                        "default 1/1600)")
    p.add_argument("--nx", type=int, default=64,
                   help="solver mode: grid size")
    p.add_argument("--dt", type=float, default=1e-3,
                   help="solver mode: time step")
    p.add_argument("--nu", type=float, default=None,
                   help="solver mode: viscosity (default 1e-3 for "
                        "--dims 2, 1/1600 for --dims 3)")
    p.add_argument("--stride", type=int, default=1,
                   help="solver mode: solver steps per served frame "
                        "(match a surrogate trained on strided frames)")
    p.add_argument("--forcing", default="none",
                   choices=["none", "kolmogorov", "fno"],
                   help="solver mode: body forcing (sustained turbulence)")
    p.add_argument("--forcing-k", type=int, default=4,
                   help="solver mode: forcing wavenumber")
    p.add_argument("--forcing-amp", type=float, default=0.1,
                   help="solver mode: forcing amplitude")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--chunk", type=int, default=64,
                   help="fno rollout chunk length: one compiled scan of "
                        "this many steps is looped host-side to reach any "
                        "horizon")
    p.add_argument("--warmup-steps", type=int, default=0,
                   help="compile + run this many rollout steps before "
                        "accepting requests (pays the first-compile cost "
                        "at startup, not on the first request)")
    p.add_argument("--coalesce", type=int, default=0,
                   help="> 0: coalesce up to N concurrent same-shape "
                        "single-state requests into one batched device "
                        "program (single-model surrogate engines only; "
                        "docs/serving.md)")
    p.add_argument("--quiet", action="store_true",
                   help="suppress per-request access logs")
    args = p.parse_args(argv)
    if args.forcing != "none" and not args.solver:
        p.error("--forcing applies to --solver mode only (a surrogate's "
                "dynamics are whatever it was trained on)")
    if args.dims == 3:
        if not args.solver:
            p.error("--dims 3 applies to --solver mode (surrogate "
                    "checkpoints carry their own dimensionality)")
        if args.forcing == "fno":
            p.error("the 3D solver supports --forcing kolmogorov only")

    from ns_tpu.serve.server import serve

    if args.solver and args.dims == 3:
        from ns_tpu.serve.solver import SolverEngine3D
        engine = SolverEngine3D(args.nx, args.nx, args.nx, dt=args.dt,
                                nu=(args.nu if args.nu is not None
                                    else 6.25e-4),
                                stride=args.stride, chunk=args.chunk,
                                forcing=args.forcing,
                                forcing_k=args.forcing_k,
                                forcing_amp=args.forcing_amp)
    elif args.solver:
        from ns_tpu.serve.solver import SolverEngine
        engine = SolverEngine(args.nx, args.nx, dt=args.dt,
                              nu=(args.nu if args.nu is not None
                                  else 1e-3),
                              stride=args.stride, chunk=args.chunk,
                              forcing=args.forcing,
                              forcing_k=args.forcing_k,
                              forcing_amp=args.forcing_amp)
    else:
        from ns_tpu.serve.engine import InferenceEngine
        engine = InferenceEngine.from_checkpoint(args.ckpt,
                                                 chunk=args.chunk)
    if args.warmup_steps:
        print(f"warmup: compiling {args.warmup_steps}-step rollout ...",
              flush=True)
        engine.warmup(args.warmup_steps)
    serve(engine, host=args.host, port=args.port, quiet=args.quiet,
          coalesce=args.coalesce)


if __name__ == "__main__":
    main()
