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


def _write_artifact(exported, path: str) -> str:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(exported.serialize())
    return path


def _load_artifact(path: str):
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def export_rollout(cfg: sp.SpectralPeriodicConfig, path: str) -> str:
    """Serialize the nt-step rollout as a StableHLO artifact."""
    shape = jax.ShapeDtypeStruct((cfg.nx, cfg.ny), cfg.real_dtype)
    exported = jax_export.export(jax.jit(_rollout_fn(cfg)))(shape)
    return _write_artifact(exported, path)


def load_rollout_artifact(path: str) -> Callable:
    """Load a serialized rollout; returns a callable that runs it under jit
    with no access to the original model-building code."""
    exported = _load_artifact(path)
    return lambda w0: exported.call(w0)


# --- FD-family engines ------------------------------------------------------


def _fd_rollout_fn(family: str, cfg, u_bc, v_bc, p_bc, dtype) -> Callable:
    """(u0, v0, p0) physical ICs -> final (u, v, p) after cfg.nt steps of
    the chosen FD family (chorin_fd incl. dst/helmholtz modes, direct_fd
    incl. the exact mixed-BC pressure). The whole rollout traces into ONE
    program. Init semantics follow each family's NavierStokesSystem:
    chorin_fd applies BCs to the ICs (and seeds the AB2 history);
    direct_fd deliberately does NOT — its reference applies BCs only
    after the first momentum update (ref direct_fd/simulate.py)."""
    if family == "chorin_fd":
        from ns_tpu.solvers import chorin_fd as m

        step = m.make_step(cfg, u_bc, v_bc, p_bc, dtype=dtype)

        def run(u0, v0, p0):
            s = m.init_state(cfg, u0, v0, p0, u_bc, v_bc, p_bc, dtype=dtype)

            def body(s, _):
                return step(s), None

            s, _ = jax.lax.scan(body, s, None, length=cfg.nt)
            return s.u, s.v, s.p

        return run
    if family == "direct_fd":
        from ns_tpu.core.state import FlowState
        from ns_tpu.solvers import direct_fd as m

        step = m.make_step(cfg, u_bc, v_bc, p_bc)

        def run(u0, v0, p0):
            s = FlowState(u=u0.astype(dtype), v=v0.astype(dtype),
                          p=p0.astype(dtype))

            def body(s, _):
                return step(s), None

            s, _ = jax.lax.scan(body, s, None, length=cfg.nt)
            return s.u, s.v, s.p

        return run
    raise ValueError(f"family must be chorin_fd|direct_fd, got {family!r}")


class FDRolloutEngine:
    """AOT-compiled FD cavity rollout: build once, serve many (the FD
    counterpart of RolloutEngine)."""

    def __init__(self, family: str, cfg, u_bc, v_bc, p_bc,
                 dtype=jnp.float32):
        self.dtype = dtype
        shape = jax.ShapeDtypeStruct((cfg.nx, cfg.ny), dtype)
        fn = _fd_rollout_fn(family, cfg, u_bc, v_bc, p_bc, dtype)
        self._compiled = jax.jit(fn).lower(shape, shape, shape).compile()

    def __call__(self, u0, v0, p0):
        a = lambda x: jnp.asarray(x, self.dtype)
        return self._compiled(a(u0), a(v0), a(p0))

    @property
    def cost_analysis(self):
        return self._compiled.cost_analysis()


def export_fd_rollout(family: str, cfg, u_bc, v_bc, p_bc, path: str,
                      dtype=jnp.float32) -> str:
    """Serialize an FD-family nt-step rollout as a StableHLO artifact.

    Pallas configs are rejected: Mosaic kernels lower to TPU custom
    calls, which jax.export refuses as non-portable — export the pure-
    XLA twin instead (every kernel has one; drop the use_pallas* flags).
    """
    if getattr(cfg, "use_pallas", False) or getattr(
            cfg, "use_pallas_momentum", False):
        raise ValueError(
            "StableHLO export cannot serialize Pallas (Mosaic custom-"
            "call) kernels; rebuild the config with use_pallas="
            "use_pallas_momentum=False (the pure-XLA twin computes the "
            "same rollout)")
    shape = jax.ShapeDtypeStruct((cfg.nx, cfg.ny), dtype)
    fn = _fd_rollout_fn(family, cfg, u_bc, v_bc, p_bc, dtype)
    exported = jax_export.export(jax.jit(fn))(shape, shape, shape)
    return _write_artifact(exported, path)


def load_fd_rollout_artifact(path: str) -> Callable:
    exported = _load_artifact(path)
    return lambda u0, v0, p0: exported.call(u0, v0, p0)


# --- 3D spectral engine -----------------------------------------------------


def _rollout3d_fn(cfg) -> Callable:
    """physical (3, nx, ny, nz) u0 -> physical velocity after cfg.nt
    steps of the 3D family (solvers/spectral3d.py), either engine."""
    from ns_tpu.solvers import spectral3d as s3

    def run(u0):
        carry = s3.carry_from_velocity(cfg, u0)
        final = s3.rollout_final(cfg, carry)
        return s3.fields_from_hat(cfg, final[0])

    return run


class Rollout3DEngine:
    """AOT-compiled 3D spectral rollout: build once, serve many (the 3D
    counterpart of RolloutEngine)."""

    def __init__(self, cfg):
        self.cfg = cfg
        shape = jax.ShapeDtypeStruct((3, cfg.nx, cfg.ny, cfg.nz),
                                     cfg.real_dtype)
        self._compiled = jax.jit(_rollout3d_fn(cfg)).lower(shape).compile()

    def __call__(self, u0):
        return self._compiled(jnp.asarray(u0, self.cfg.real_dtype))

    @property
    def cost_analysis(self):
        return self._compiled.cost_analysis()


def export_rollout3d(cfg, path: str) -> str:
    """Serialize the nt-step 3D rollout as a StableHLO artifact."""
    shape = jax.ShapeDtypeStruct((3, cfg.nx, cfg.ny, cfg.nz),
                                 cfg.real_dtype)
    exported = jax_export.export(jax.jit(_rollout3d_fn(cfg)))(shape)
    return _write_artifact(exported, path)


def load_rollout3d_artifact(path: str) -> Callable:
    """Load a serialized 3D rollout (no model-building code needed)."""
    exported = _load_artifact(path)
    return lambda u0: exported.call(u0)
