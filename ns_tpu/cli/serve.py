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
    p.add_argument("--ckpt", required=True,
                   help="checkpoint.npz path or its directory")
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
    p.add_argument("--quiet", action="store_true",
                   help="suppress per-request access logs")
    args = p.parse_args(argv)

    from ns_tpu.serve.engine import InferenceEngine
    from ns_tpu.serve.server import serve

    engine = InferenceEngine.from_checkpoint(args.ckpt, chunk=args.chunk)
    if args.warmup_steps:
        print(f"warmup: compiling {args.warmup_steps}-step rollout ...",
              flush=True)
        engine.warmup(args.warmup_steps)
    serve(engine, host=args.host, port=args.port, quiet=args.quiet)


if __name__ == "__main__":
    main()
