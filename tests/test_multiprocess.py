"""True multi-process distribution tests (VERDICT r2 top item).

The fake-device tests elsewhere validate SPMD math inside ONE process;
these spawn real separate Python processes via `python -m ns_tpu.launch`
and check cross-process collectives (Gloo on CPU), global-array feeding,
and per-host sharded output. On a TPU pod the same code paths run over
ICI with `jax.distributed.initialize()` auto-detection.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# every test here spawns real worker processes (seconds to a minute
# each) — excluded from the fast profile (CLAUDE.md "Test profiles")
pytestmark = pytest.mark.slow


def test_launch_selftest_two_processes(tmp_path):
    """2 processes x 2 devices: halo exchange, distributed matmul-DFT
    rollout vs local oracle, psum, per-host shard IO — all across a real
    process boundary."""
    env = dict(os.environ)
    env["NS_TPU_SELFTEST_DIR"] = str(tmp_path)
    r = subprocess.run(
        [sys.executable, "-m", "ns_tpu.launch", "--nprocs", "2",
         "--devices-per-proc", "2", "--selftest"],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "SELFTEST OK p0" in r.stdout
    assert "SELFTEST OK p1" in r.stdout
    # both processes wrote their own shard file
    files = sorted(p.name for p in tmp_path.glob("w_final.proc*.npz"))
    assert files == ["w_final.proc0000.npz", "w_final.proc0001.npz"]


def test_distributed_run_solver_cli(tmp_path):
    """The documented production path: launcher -> run_solver --dist ->
    per-host shard files -> coordinator-assembled reference-format npz."""
    out = str(tmp_path / "turb.npz")
    r = subprocess.run(
        [sys.executable, "-m", "ns_tpu.launch", "--nprocs", "2",
         "--devices-per-proc", "2", "--platform", "cpu", "--",
         sys.executable, "-m", "ns_tpu.cli.run_solver",
         "decaying_turbulence", "--dist", "--nx", "32", "--nt", "5",
         "--compact", "--transform", "matmul", "--dtype", "float64",
         "--out", out],
        capture_output=True, text=True, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stdout + r.stderr
    # per-host shards: 2 processes x 3 fields
    shards = sorted(p.name for p in (tmp_path / "turb.npz.shards").iterdir())
    assert len(shards) == 6, shards
    d = np.load(out)
    assert d["u"].shape == (5, 32, 32)
    # physics sanity: fields finite, nontrivial
    assert np.isfinite(d["u"]).all() and np.abs(d["u"]).max() > 0


def test_launch_propagates_worker_failure():
    r = subprocess.run(
        [sys.executable, "-m", "ns_tpu.launch", "--nprocs", "2",
         "--platform", "cpu", "--",
         sys.executable, "-c", "import sys; sys.exit(3)"],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert r.returncode != 0
    assert "FAILED" in r.stderr


def test_distributed_training_matches_single_process(tmp_path):
    """Multi-process TRAINING end-to-end (VERDICT r3 next #3): launcher ->
    `cli.train --dp 4 --dist` on 2 processes x 2 devices must reproduce
    the single-process dp=4 loss trajectory to fp tolerance, and only the
    coordinator writes checkpoints/metrics/extrapolation."""
    import json

    from ns_tpu.cli.run_solver import main as run_main

    npz = str(tmp_path / "turb.npz")
    run_main(["decaying_turbulence", "--nx", "16", "--nt", "8",
              "--transform", "matmul", "--out", npz])

    def train(nprocs, devs_per_proc, out):
        r = subprocess.run(
            [sys.executable, "-m", "ns_tpu.launch", "--nprocs", str(nprocs),
             "--devices-per-proc", str(devs_per_proc), "--platform", "cpu",
             "--", sys.executable, "-m", "ns_tpu.cli.train",
             "--model", "fno", "--dist", "--dp", "4",
             "--npz-path", npz, "--out-dir", str(tmp_path / out),
             "--n-iters", "12", "--n-frames", "8", "--ckpt-every", "6",
             "--fno-modes", "4", "--fno-width", "8",
             "--fno-transform", "matmul", "--fno-precision", "highest"],
            capture_output=True, text=True, timeout=600, cwd=REPO)
        assert r.returncode == 0, r.stdout + r.stderr
        d = tmp_path / (out + "_10")  # ref out-dir suffix convention
        with open(d / "checkpoint.npz.meta.json") as f:
            return d, json.load(f)["losses"]

    d1, losses1 = train(1, 4, "single")
    d2, losses2 = train(2, 2, "multi")
    assert len(losses1) == len(losses2) == 12
    # same global batch, same 4-device mesh, replicated params: the loss
    # trajectories agree to cross-process-collective fp reassociation
    np.testing.assert_allclose(losses1, losses2, rtol=1e-4, atol=1e-6)

    # single writer: the coordinator owns checkpoint + canonical metrics +
    # extrapolation; the non-coordinator emits only its own metrics stream
    names = sorted(p.name for p in d2.iterdir())
    assert "checkpoint.npz" in names and "extrapolation.npy" in names
    assert "metrics.jsonl" in names
    assert "metrics.proc0001.jsonl" in names
    assert not [n for n in names if n.startswith("checkpoint.proc")]


# ---------------------------------------------------------------------------
# In-process unit coverage of the distributed helpers (process_count == 1)
# ---------------------------------------------------------------------------

def test_shard_io_roundtrip_single_process(tmp_path):
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ns_tpu.parallel import distributed as dist
    from ns_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"x": 4}, devices=jax.devices()[:4])
    arr = np.arange(64, dtype=np.float64).reshape(8, 8)
    g = jax.device_put(arr, NamedSharding(mesh, P("x", None)))
    dist.save_array_shards(str(tmp_path), "field", g)
    files = list(tmp_path.glob("field.proc*.npz"))
    assert len(files) == 1  # one process
    back = dist.assemble_shards(str(tmp_path), "field")
    np.testing.assert_array_equal(back, arr)


def test_assemble_shards_detects_holes(tmp_path):
    import json
    from ns_tpu.parallel import distributed as dist
    manifest = {"name": "x", "process": 0, "num_processes": 1,
                "global_shape": [4, 4], "dtype": "float64",
                "shards": [{"key": "shard0", "index": [[0, 2], [0, 4]]}]}
    np.savez(tmp_path / "x.proc0000.npz",
             __manifest__=np.frombuffer(json.dumps(manifest).encode(),
                                        dtype=np.uint8),
             shard0=np.ones((2, 4)))
    with pytest.raises(ValueError, match="do not cover"):
        dist.assemble_shards(str(tmp_path), "x")


def test_process_local_rows_contiguous():
    import jax
    from ns_tpu.parallel import distributed as dist
    from ns_tpu.parallel.mesh import make_mesh

    # 2D mesh: the P('x') row sharding replicates over 'ensemble'; the
    # dedupe logic must not flag that as non-contiguous
    mesh = make_mesh({"ensemble": 2, "x": 4})
    lo, hi = dist.process_local_rows(32, mesh, "x")
    assert (lo, hi) == (0, 32)  # single process owns everything


def test_global_array_matches_device_put():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from ns_tpu.parallel import distributed as dist
    from ns_tpu.parallel.mesh import make_mesh

    mesh = make_mesh({"x": 8})
    arr = np.random.default_rng(0).normal(size=(16, 5))
    sharding = NamedSharding(mesh, P("x", None))
    a = dist.global_array(sharding, arr)  # single-process: local == global
    b = jax.device_put(arr, sharding)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_launch_reports_signal_killed_worker():
    """A worker killed by a signal (negative returncode) must fail the
    launch — max(0, -9) == 0 previously masked it as success."""
    r = subprocess.run(
        [sys.executable, "-m", "ns_tpu.launch", "--nprocs", "2",
         "--platform", "cpu", "--",
         sys.executable, "-c",
         "import os, signal; os.kill(os.getpid(), signal.SIGKILL)"],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert r.returncode != 0
    assert "FAILED" in r.stderr


def test_launch_detects_late_worker_crash_while_early_worker_blocks():
    """The launcher polls ALL children: a pid-ordered wait would hang on
    worker 0 (sleeping) and never see worker 1's startup crash."""
    import time as _time
    prog = ("import os, sys, time\n"
            "pid = int(os.environ['NS_TPU_PROCESS_ID'])\n"
            "if pid == 1:\n"
            "    sys.exit(5)\n"
            "time.sleep(60)\n")
    t0 = _time.monotonic()
    r = subprocess.run(
        [sys.executable, "-m", "ns_tpu.launch", "--nprocs", "2",
         "--platform", "cpu", "--", sys.executable, "-c", prog],
        capture_output=True, text=True, timeout=120, cwd=REPO)
    assert r.returncode != 0
    # must return as soon as worker 1 dies, not after worker 0's 60 s
    assert _time.monotonic() - t0 < 45


def test_assemble_shards_rejects_stale_process_count(tmp_path):
    """Shard files left by an earlier higher-process-count run must be
    rejected, not silently merged over fresh data."""
    import json
    from ns_tpu.parallel import distributed as dist

    def write(pid, num_processes, rows, value):
        manifest = {"name": "x", "process": pid,
                    "num_processes": num_processes,
                    "global_shape": [4, 4], "dtype": "float64",
                    "shards": [{"key": "shard0",
                                "index": [[rows[0], rows[1]], [0, 4]]}]}
        np.savez(tmp_path / f"x.proc{pid:04d}.npz",
                 __manifest__=np.frombuffer(
                     json.dumps(manifest).encode(), dtype=np.uint8),
                 shard0=np.full((rows[1] - rows[0], 4), value))

    # stale 4-process run left procs 2-3; fresh 2-process run wrote 0-1
    write(0, 2, (0, 2), 1.0)
    write(1, 2, (2, 4), 1.0)
    write(2, 4, (2, 3), 99.0)
    write(3, 4, (3, 4), 99.0)
    with pytest.raises(ValueError, match="stale"):
        dist.assemble_shards(str(tmp_path), "x")
