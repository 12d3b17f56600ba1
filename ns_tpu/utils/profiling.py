"""Tracing / profiling hooks.

The reference's only observability is tqdm progress bars (SURVEY.md §5).
Here: jax.profiler traces for TPU timeline capture, named scopes around the
solver phases (predictor / pressure / correction show up as annotations in
the trace), and a simple wall-clock timer for steps/sec accounting that
respects async dispatch.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax

named_scope = jax.named_scope  # re-export: with named_scope("pressure"): ...


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """(mean_seconds, last_result) of fn, blocking on the result each call
    so async dispatch cannot fake the numbers."""
    from ns_tpu.utils.host import sync

    result = None
    for _ in range(warmup):
        # hard sync: on axon, block_until_ready on the first post-compile
        # call can return before the remote compile finishes (see host.sync)
        result = sync(fn(*args, **kwargs))
    t0 = time.perf_counter()
    for _ in range(iters):
        result = jax.block_until_ready(fn(*args, **kwargs))
    return (time.perf_counter() - t0) / iters, result
