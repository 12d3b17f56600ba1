"""Deployment runtime: ahead-of-time compiled rollout engines.

Production-serving path the reference has no analogue for: a solver rollout
is traced ONCE, lowered, and either (a) kept as a cached compiled
executable (`RolloutEngine` — repeated serving calls skip tracing and
python dispatch overhead), or (b) serialized to a portable StableHLO
artifact with `jax.export` (`export_rollout` / `load_rollout_artifact`) so
a serving process can run the solver without the model-building code or
retracing — the TPU-native equivalent of shipping a compiled graph.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax import export as jax_export

from ns_tpu.solvers import spectral_periodic as sp


class RolloutEngine:
    """AOT-compiled spectral rollout: build once, serve many.

    engine = RolloutEngine(cfg)          # traces + compiles here
    w_final = engine(w0)                 # executable call, no retracing
    """

    def __init__(self, cfg: sp.SpectralPeriodicConfig):
        self.cfg = cfg
        shape = jax.ShapeDtypeStruct((cfg.nx, cfg.ny), cfg.real_dtype)
        self._compiled = jax.jit(_rollout_fn(cfg)).lower(shape).compile()

    def __call__(self, w0):
        return self._compiled(jnp.asarray(w0, self.cfg.real_dtype))

    @property
    def cost_analysis(self):
        return self._compiled.cost_analysis()


def _rollout_fn(cfg: sp.SpectralPeriodicConfig) -> Callable:
    """physical w0 -> physical w after cfg.nt steps, on whichever engine
    the config selects (fft / matmul / compact / real_gemm)."""

    def run(w0):
        carry = sp.carry_from_vorticity(cfg, w0)
        final_carry = sp.rollout_final(cfg, carry)
        return sp.physical_from_carry(cfg, final_carry[0])

    return run


def export_rollout(cfg: sp.SpectralPeriodicConfig, path: str) -> str:
    """Serialize the nt-step rollout as a StableHLO artifact."""
    shape = jax.ShapeDtypeStruct((cfg.nx, cfg.ny), cfg.real_dtype)
    exported = jax_export.export(jax.jit(_rollout_fn(cfg)))(shape)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return path


def load_rollout_artifact(path: str) -> Callable:
    """Load a serialized rollout; returns a callable that runs it under jit
    with no access to the original model-building code."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return lambda w0: exported.call(w0)
