"""Streaming rollout writer: time horizons larger than device memory.

The reference materializes whole (nt, nx, ny) rollouts in memory before one
np.savez at the end (direct_fd/simulate.py:129-144,194). On TPU the stacked
rollout is the HBM limit long before compute is: 200 frames of u/v/p at
1024^2 f32 is already 2.4 GB. This writer runs the rollout in fixed-size
scan chunks — each chunk is ONE device program — and streams the stacked
frames into memmapped .npy files between chunks, so the device never holds
more than `chunk` frames and the host never holds more than one chunk.

Output files are standard .npy (np.load-compatible); the npz-compatible
path (ns_tpu/io/npz.py) remains for reference-format interchange.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.utils import to_host

Array = jnp.ndarray


# Bounded LRU of jitted chunk runners keyed on (step_fn, extract):
# callers that pass the same step/extract objects across stream_rollout
# calls (benchmark rows, repeated serving requests) reuse the compiled
# programs, while callers that build fresh closures per call (run_solver)
# evict old entries instead of growing a module-level jit cache — each
# retired entry releases its executables AND the closure's captured
# device constants (tens of MB of transform matrices at 1024^2), which
# matters in long-lived serving processes.
from collections import OrderedDict

_CHUNK_RUNNERS: OrderedDict = OrderedDict()
_CHUNK_RUNNERS_MAX = 8


def _chunk_runner(step_fn: Callable, extract: Callable):
    key = (step_fn, extract)
    run = _CHUNK_RUNNERS.pop(key, None)
    if run is None:
        @partial(jax.jit, static_argnames="n")
        def run(state, *, n):
            def body(s, _):
                s = step_fn(s)
                return s, extract(s)

            return jax.lax.scan(body, state, None, length=n)

    _CHUNK_RUNNERS[key] = run            # most-recently-used last
    while len(_CHUNK_RUNNERS) > _CHUNK_RUNNERS_MAX:
        _CHUNK_RUNNERS.popitem(last=False)
    return run


def stream_rollout(step_fn: Callable, state0, nt: int,
                   extract: Callable, out_dir: str,
                   chunk: int = 64, dtype=np.float32,
                   writer: str = "auto") -> Dict[str, str]:
    """Roll `state0` forward nt steps with `step_fn`, streaming the
    per-step outputs of `extract(state) -> {name: array}` into
    `out_dir/<name>.npy` files of shape (nt, *array.shape).

    Returns {name: path}. The rollout runs in ceil(nt/chunk) jitted scan
    chunks (two compiled programs at most: full chunk + remainder).

    `writer` selects the host IO path: 'auto'/'native'/'thread'/'sync'
    use the async frame writer (io/native_writer.py — file IO overlaps
    the next chunk's device compute; 'auto' prefers the C++ backend),
    'memmap' keeps the synchronous np memmap store.
    """
    # shapes only — jax.eval_shape keeps the (complex) extract math out of
    # eager dispatch (CLAUDE.md: eager complex dispatch flakes on axon)
    probe = jax.eval_shape(extract, state0)
    os.makedirs(out_dir, exist_ok=True)
    if writer == "memmap":
        outs = {
            name: np.lib.format.open_memmap(
                os.path.join(out_dir, f"{name}.npy"), mode="w+",
                dtype=dtype, shape=(nt,) + tuple(a.shape))
            for name, a in probe.items()
        }
    else:
        from ns_tpu.io.native_writer import AsyncNpyWriter
        outs = {
            name: AsyncNpyWriter(os.path.join(out_dir, f"{name}.npy"),
                                 (nt,) + tuple(a.shape), dtype=dtype,
                                 backend=writer)
            for name, a in probe.items()
        }

    state = state0
    run_chunk = _chunk_runner(step_fn, extract)
    # try/finally: a mid-rollout failure (device error, bad step_fn) must
    # not leak the writers' fds/worker threads/native ring buffers —
    # stream_rollout also runs inside long-lived serving processes
    closed = False
    try:
        t = 0
        while t < nt:
            n = min(chunk, nt - t)
            state, frames = run_chunk(state, n=n)
            # one bulk transfer per chunk, laundered through to_host: the
            # scan executable contains complex FFT/DFT ops, whose outputs
            # the axon tunnel cannot read back directly (utils/host.py)
            host = to_host(frames)
            for name, arr in host.items():
                if writer == "memmap":
                    outs[name][t:t + n] = np.asarray(arr, dtype=dtype)
                else:
                    # returns immediately; the disk write overlaps the
                    # next chunk's device compute
                    outs[name].write(t, np.asarray(arr))
            t += n
        closed = True
        for m in outs.values():
            m.flush() if writer == "memmap" else m.close()
    finally:
        if not closed and writer != "memmap":
            for m in outs.values():
                try:
                    m.close()
                except Exception:
                    pass  # the original error propagates
    return {name: os.path.join(out_dir, f"{name}.npy") for name in outs}
