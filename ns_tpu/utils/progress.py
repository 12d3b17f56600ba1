"""Per-chunk progress reporting for long rollouts.

The reference tqdm-wraps every solver's python time loop
(direct_fd/simulate.py:134, chorin_fd/simulate.py:258,
chorin_spectral/simulate.py:553). ns_tpu rollouts are single fused
`lax.scan` programs — the fast path has no per-step host control to hang a
bar on — so the progress-reporting form runs the SAME jitted step in
scan chunks and updates a tqdm bar per chunk (documented deviation: the
bar ticks every `chunk` steps, not every step; the chunking costs one
dispatch round trip per chunk, which `chunk`'s default keeps under ~1% of
useful work at reference sizes).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import numpy as np

from ns_tpu.utils.host import to_host


def chunked_simulate(step_fn: Callable, state0, nt: int,
                     extract: Callable, chunk: int = 25,
                     progress: bool = True, desc: str = "rollout"):
    """Roll `state0` forward nt steps, collecting `extract(state) ->
    {name: array}` per step into host-stacked (nt, ...) arrays, with a
    tqdm bar updated per jitted chunk.

    Compiles at most two programs (full chunk + remainder), like
    io/streaming.py::stream_rollout — this is its collect-in-RAM sibling
    with the bar attached. Returns ({name: np.ndarray}, final_state).
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk} (<= 0 would "
                         "spin forever dispatching empty programs)")
    probe = jax.eval_shape(extract, state0)
    outs = {name: np.empty((nt,) + tuple(a.shape),
                           dtype=np.dtype(a.dtype))
            for name, a in probe.items()}

    def make_chunk(n):
        @jax.jit
        def run(state):
            def body(state, _):
                state = step_fn(state)
                return state, extract(state)
            return jax.lax.scan(body, state, None, length=n)
        return run

    run_full = make_chunk(chunk)
    bar = None
    if progress:
        try:
            from tqdm import tqdm
            bar = tqdm(total=nt, desc=desc, unit="step")
        except ImportError:
            bar = None
    state = state0
    t = 0
    try:
        while t < nt:
            n = min(chunk, nt - t)
            run = run_full if n == chunk else make_chunk(n)
            state, frames = run(state)
            host = to_host(frames)
            for name, arr in host.items():
                outs[name][t:t + n] = np.asarray(arr)
            t += n
            if bar is not None:
                bar.update(n)
            elif progress:
                print(f"{desc}: step {t}/{nt}")
    finally:
        if bar is not None:
            bar.close()
    return outs, state
