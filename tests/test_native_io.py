"""Async .npy writer (io/native_writer.py + runtime/native) tests.

Every backend must produce byte-identical, np.load-compatible files; the
native backend is the C++ ring writer (lazily g++-built), 'thread' the
pure-Python fallback, 'sync' the in-line oracle.
"""

import os

import numpy as np
import pytest

from ns_tpu.io.native_writer import AsyncNpyWriter
from ns_tpu.runtime.native.build import load as load_native

BACKENDS = ["thread", "sync"]
if load_native() is not None:
    BACKENDS.insert(0, "native")


def test_native_library_builds():
    """The C++ backend must actually be available in this image (g++ is
    baked in); if this fails the fallback still works but the native
    path has regressed."""
    assert load_native() is not None


@pytest.mark.parametrize("backend", BACKENDS)
def test_round_trip(tmp_path, backend):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((13, 5, 7)).astype(np.float32)
    path = str(tmp_path / f"{backend}.npy")
    with AsyncNpyWriter(path, data.shape, np.float32, backend=backend) as w:
        # out-of-order, variable-size ranges
        w.write(6, data[6:13])
        w.write(0, data[0:4])
        w.write(4, data[4:6])
    out = np.load(path)
    np.testing.assert_array_equal(out, data)


@pytest.mark.parametrize("backend", BACKENDS)
def test_dtype_cast_and_many_chunks(tmp_path, backend):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((64, 33)).astype(np.float64)
    path = str(tmp_path / "cast.npy")
    with AsyncNpyWriter(path, data.shape, np.float32, backend=backend) as w:
        for t in range(0, 64, 8):
            w.write(t, data[t:t + 8])
    np.testing.assert_array_equal(np.load(path),
                                  data.astype(np.float32))


def test_shape_and_range_validation(tmp_path):
    w = AsyncNpyWriter(str(tmp_path / "v.npy"), (4, 3), backend="sync")
    with pytest.raises(ValueError):
        w.write(0, np.zeros((2, 5), np.float32))
    with pytest.raises(IndexError):
        w.write(3, np.zeros((2, 3), np.float32))
    w.close()
    np.testing.assert_array_equal(np.load(str(tmp_path / "v.npy")),
                                  np.zeros((4, 3), np.float32))


@pytest.mark.parametrize("writer", BACKENDS + ["memmap"])
def test_stream_rollout_writer_parity(tmp_path, writer):
    """stream_rollout output is writer-independent (async paths match
    the synchronous memmap oracle bit-for-bit)."""
    import jax.numpy as jnp

    from ns_tpu.io.streaming import stream_rollout

    def step(s):
        return {"x": s["x"] * 1.5 + 1.0}

    def extract(s):
        return {"u": s["x"], "usq": s["x"] ** 2}

    state0 = {"x": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    paths = stream_rollout(step, state0, nt=11, extract=extract,
                           out_dir=str(tmp_path / writer), chunk=4,
                           writer=writer)
    ref = stream_rollout(step, state0, nt=11, extract=extract,
                         out_dir=str(tmp_path / "ref"), chunk=4,
                         writer="memmap")
    for name in ("u", "usq"):
        np.testing.assert_array_equal(np.load(paths[name]),
                                      np.load(ref[name]))


@pytest.mark.parametrize("backend", BACKENDS)
def test_write_after_close_raises(tmp_path, backend):
    """write() on a closed writer must raise, never segfault (native: a
    NULL handle into the C library) or silently drop data (thread: a
    queue whose worker already exited)."""
    w = AsyncNpyWriter(str(tmp_path / "wac.npy"), (4, 3), backend=backend)
    w.write(0, np.zeros((4, 3), np.float32))
    w.close()
    with pytest.raises(ValueError, match="closed"):
        w.write(1, np.zeros((1, 3), np.float32))
    w.close()  # idempotent


def test_thread_backend_error_surfaces_before_close(tmp_path):
    """A failed disk must stop the rollout on the NEXT write, not hours
    later at close() (the native backend's submit already does this)."""
    import time

    w = AsyncNpyWriter(str(tmp_path / "err.npy"), (128, 4),
                       backend="thread")
    os.close(w._fd)                      # simulate the disk going away
    frame = np.zeros((1, 4), np.float32)
    raised = False
    for i in range(200):                 # poll: the worker fails async
        try:
            w.write(i % 128, frame)
        except OSError:
            raised = True
            break
        time.sleep(0.005)
    assert raised, "write-path never surfaced the worker's OSError"
    with pytest.raises(OSError):
        w.close()


def test_stream_rollout_compile_cache_is_bounded(tmp_path):
    """Fresh step/extract closures per call (run_solver's pattern) must
    evict old compiled chunk programs, not grow a module-level jit cache
    (and its captured device constants) forever."""
    import jax.numpy as jnp

    from ns_tpu.io import streaming

    for i in range(streaming._CHUNK_RUNNERS_MAX + 4):
        def step(s):
            return s + 1.0

        def extract(s):
            return {"x": s}

        streaming.stream_rollout(step, jnp.zeros((2, 2)), nt=3,
                                 extract=extract,
                                 out_dir=str(tmp_path / f"d{i}"),
                                 chunk=2, writer="sync")
    assert len(streaming._CHUNK_RUNNERS) <= streaming._CHUNK_RUNNERS_MAX


def test_large_backpressure(tmp_path):
    """Submitting far more than the ring bound must block-and-drain, not
    fail or reorder."""
    if load_native() is None:
        pytest.skip("native backend unavailable")
    data = np.arange(32 * 1024, dtype=np.float32).reshape(32, 1024)
    path = str(tmp_path / "bp.npy")
    with AsyncNpyWriter(path, data.shape, np.float32, backend="native",
                        max_buffer_bytes=8 * 1024) as w:
        for t in range(32):
            w.write(t, data[t:t + 1])
    np.testing.assert_array_equal(np.load(path), data)


def test_thread_backend_byte_backpressure(tmp_path):
    """The pure-Python worker bounds BYTES in flight like the C++ ring:
    many chunks far over a tiny bound must block-and-drain correctly."""
    data = np.arange(64 * 256, dtype=np.float32).reshape(64, 256)
    path = str(tmp_path / "tbp.npy")
    with AsyncNpyWriter(path, data.shape, np.float32, backend="thread",
                        max_buffer_bytes=2048) as w:
        for t in range(0, 64, 4):
            w.write(t, data[t:t + 4])   # 4 KB per submit > 2 KB bound
    np.testing.assert_array_equal(np.load(path), data)


def test_load_with_missing_source_returns_prebuilt(tmp_path, monkeypatch):
    """A shipped .so without stream_writer.cpp must load, not raise
    (deployments strip sources); contract: None only when no native path
    exists."""
    from ns_tpu.runtime.native import build

    if load_native() is None:
        pytest.skip("native backend unavailable")
    monkeypatch.setattr(build, "_SRC", str(tmp_path / "gone.cpp"))
    monkeypatch.setattr(build, "_lib", None)
    monkeypatch.setattr(build, "_tried", False)
    assert build.load() is not None
