"""Multi-process launcher: `python -m ns_tpu.launch`.

Spawns N copies of a worker command with the NS_TPU_* bootstrap env vars
set (coordinator address on a free local port, process ids, platform,
local device count); each worker calls
`ns_tpu.parallel.distributed.initialize_from_env()` as its first jax
action and then sees the union of all processes' devices via
`jax.devices()`. This is the single-host form (CI, CPU validation, one
TPU host); on a multi-host pod slice, run one copy of your script per
host under your pod launcher and call
`ns_tpu.parallel.distributed.initialize()` with no args — JAX
auto-detects the TPU topology (docs/scaling.md "Multi-process runtime").

Usage:
  # 4 processes x 2 fake CPU devices each = 8 global devices
  python -m ns_tpu.launch --nprocs 4 --devices-per-proc 2 -- \
      python my_worker.py --args...

  # built-in end-to-end validation (distributed FFT, halos, psum,
  # per-host sharded output):
  python -m ns_tpu.launch --nprocs 2 --devices-per-proc 2 --selftest

Child stdout/stderr are streamed with a `[p{i}]` prefix; the launcher
exits with the first nonzero child return code (remaining children are
terminated).
"""

from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys
import threading
import time


def _free_port() -> int:
    # NOTE: the port is only *probably* free — the probe socket closes
    # before worker 0 binds the coordinator to it (the OS offers no
    # cross-process handoff here). SO_REUSEADDR narrows, not closes, the
    # race; concurrent launches on one host can still collide, in which
    # case the gang fails fast and the caller retries.
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _pump(stream, prefix: str, out):
    """Drain a child's stdout (children block on a full pipe otherwise);
    out=None discards lines — quiet mode holds no fd open per worker."""
    for line in iter(stream.readline, ""):
        if out is not None:
            out.write(f"{prefix} {line}")
            out.flush()
    stream.close()


def launch(cmd: list[str], nprocs: int, devices_per_proc: int | None = None,
           platform: str | None = None, coordinator: str | None = None,
           env_extra: dict | None = None, quiet: bool = False,
           timeout: float | None = None) -> int:
    """Run `cmd` nprocs times with bootstrap env; return max child rc."""
    coordinator = coordinator or f"127.0.0.1:{_free_port()}"
    procs = []
    threads = []
    rc = 0
    deadline = (time.monotonic() + timeout) if timeout else None
    try:
        # spawn INSIDE the try: a failed Popen for a later worker must not
        # leak earlier children (they block in jax.distributed.initialize
        # waiting for the full gang)
        for pid in range(nprocs):
            env = dict(os.environ)
            env.update({
                "NS_TPU_COORDINATOR": coordinator,
                "NS_TPU_NUM_PROCESSES": str(nprocs),
                "NS_TPU_PROCESS_ID": str(pid),
            })
            if platform:
                env["NS_TPU_PLATFORM"] = platform
            if devices_per_proc is not None:
                env["NS_TPU_LOCAL_DEVICES"] = str(devices_per_proc)
            if env_extra:
                env.update(env_extra)
            p = subprocess.Popen(cmd, env=env, text=True,
                                 stdout=subprocess.PIPE,
                                 stderr=subprocess.STDOUT)
            procs.append(p)
            t = threading.Thread(
                target=_pump, args=(p.stdout, f"[p{pid}]",
                                    None if quiet else sys.stdout),
                daemon=True)
            t.start()
            threads.append(t)

        # poll ALL children round-robin (never block on one in pid order:
        # a later worker crashing at startup while an earlier one waits in
        # a collective would hang a pid-ordered wait forever)
        live = list(procs)
        while live and rc == 0:
            for p in list(live):
                ret = p.poll()
                if ret is None:
                    continue
                live.remove(p)
                if ret != 0:
                    # signal deaths are negative returncodes — any nonzero
                    # (either sign) is a failed gang
                    rc = ret
                    break
            if deadline and time.monotonic() > deadline:
                rc = 124
                break
            if live and rc == 0:
                time.sleep(0.05)
    finally:
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            try:
                p.wait(timeout=10)
            except subprocess.TimeoutExpired:
                p.kill()
    for t in threads:
        t.join(timeout=5)
    return rc


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m ns_tpu.launch", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--nprocs", type=int, required=True,
                    help="number of worker processes to spawn")
    ap.add_argument("--devices-per-proc", type=int, default=None,
                    help="fake CPU devices per process (CPU platform only; "
                         "on TPU each process uses its local chips)")
    ap.add_argument("--platform", default=None,
                    choices=[None, "cpu", "tpu"],
                    help="force the jax platform in workers (CPU runs on "
                         "this harness MUST pass cpu: the platform is "
                         "applied via jax.config in the worker, env vars "
                         "alone cannot override it)")
    ap.add_argument("--selftest", action="store_true",
                    help="run the built-in multi-process validation "
                         "worker instead of a user command")
    ap.add_argument("--timeout", type=float, default=None,
                    help="per-process wall-clock limit in seconds")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="worker command (prefix with --)")
    args = ap.parse_args(argv)

    if args.selftest:
        cmd = [sys.executable, "-m", "ns_tpu.cli.dist_selftest"]
        if args.platform is None:
            args.platform = "cpu"
        if args.devices_per_proc is None:
            args.devices_per_proc = 2
    else:
        cmd = args.cmd
        if cmd and cmd[0] == "--":
            cmd = cmd[1:]
        if not cmd:
            ap.error("no worker command given (and --selftest not set)")

    rc = launch(cmd, args.nprocs, devices_per_proc=args.devices_per_proc,
                platform=args.platform, timeout=args.timeout)
    if rc == 0:
        print(f"launch: all {args.nprocs} processes exited cleanly")
    else:
        print(f"launch: FAILED (rc={rc})", file=sys.stderr)
    return rc


if __name__ == "__main__":
    sys.exit(main())
