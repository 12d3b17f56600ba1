"""Simulation-as-a-service: the classical solver behind the SAME request
contract as the surrogate engine.

A SolverEngine serves the periodic spectral solver (the TPU showcase
family, solvers/spectral_periodic.py) through the identical
predict(frame0, n_steps) -> (n_steps+1, 3, nx, ny) surface and HTTP
protocol as serve.engine.InferenceEngine. Because the contracts match, a
client can point the same code at a surrogate endpoint or at the oracle
endpoint — on-demand ground truth for A/B evaluation, or physics serving
where model error is unacceptable. `stride` (solver steps per served
frame) aligns the solver's cadence with a surrogate trained on strided
frames (tools/bench_surrogates.py --frame-stride).

Rollouts are chunked scans compiled once per pow2-bucketed tail length,
exactly like the surrogate path; the (u, v, p) recovery from the
spectral state runs inside the chunk program.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.serve.engine import ServingBase, _next_pow2
from ns_tpu.utils.host import to_host


class SolverEngine(ServingBase):
    """Serve spectral-solver rollouts from physical (u, v, p) states.

    predict(frame0, n_steps) -> frames:
      frame0  (3, nx, ny) float32 — (u, v, p); vorticity is derived
              exactly and p is recomputed from it, so only the velocity
              carries information (as in the physics). An arbitrary
              input is implicitly projected onto the solenoidal,
              zero-mean, 2/3-dealiased manifold the solver evolves (a
              uniform mean flow is vorticity-free and therefore dropped
              — models/vorticity.py docstring; solver- or surrogate-
              produced frames already live on the manifold and
              round-trip exactly — tests/test_serve.py).
      frames  (n_steps + 1, 3, nx, ny); frames[0] echoes the (projected)
              input state, frames[i] is the state after i * stride
              solver steps.
    """

    model_name = "solver:spectral_periodic"
    n_models = 1

    def __init__(self, nx: int, ny: int, dt: float = 1e-3,
                 nu: float = 1e-3, stride: int = 1, chunk: int = 64,
                 dtype: str = "float32", forcing: str = "none",
                 forcing_k: int = 4, forcing_amp: float = 0.1):
        from ns_tpu.solvers import spectral_periodic as sp
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        self.nx, self.ny, self.stride, self.chunk = nx, ny, stride, chunk
        self._sp = sp
        self.cfg = sp.SpectralPeriodicConfig(nt=1, nx=nx, ny=ny, dt=dt,
                                             nu=nu, dtype=dtype,
                                             forcing=forcing,
                                             forcing_k=forcing_k,
                                             forcing_amp=forcing_amp)
        self._step, _ = sp.make_step(self.cfg)
        self._init_serving()

    # -- compiled programs ---------------------------------------------------

    def _emit(self, carry):
        sp, cfg = self._sp, self.cfg
        u, v, _w = sp.fields_from_hat(cfg, carry[0])
        return jnp.stack([u, v, sp.pressure_from_hat(cfg, carry[0])])

    def _init_program(self):
        sp, cfg = self._sp, self.cfg

        def build():
            @jax.jit
            def init(frame0):                    # (3, nx, ny) -> carry+echo
                from ns_tpu.models.vorticity import vorticity_from_uv
                w0 = vorticity_from_uv(frame0[0], frame0[1],
                                       dtype=cfg.dtype)
                carry = sp.init_from_vorticity(cfg, w0)
                return carry, self._emit(carry)

            return init

        return self._program(("init",), build)

    def _chunk_program(self, length: int):
        def build():
            @jax.jit
            def run(carry):
                def advance(c, n):
                    c, _ = jax.lax.scan(
                        lambda cc, _: (self._step(cc)[0], None), c, None,
                        length=n)
                    return c

                def body(c, _):
                    c = advance(c, self.stride)
                    return c, self._emit(c)

                carry, frames = jax.lax.scan(body, carry, None,
                                             length=length)
                return frames, carry             # (length, 3, nx, ny)

            return run

        return self._program(("chunk", length), build)

    # -- public API ----------------------------------------------------------

    def predict(self, frame0: np.ndarray, n_steps: int) -> np.ndarray:
        frame0 = np.asarray(frame0, dtype=np.float32)
        if frame0.shape != (3, self.nx, self.ny):
            raise ValueError(
                f"frame0 must be (3, {self.nx}, {self.ny}); got "
                f"{frame0.shape} (solver serving is single-state)")
        if n_steps < 0:
            raise ValueError(f"n_steps must be >= 0, got {n_steps}")
        t0 = time.perf_counter()
        # to_host, not np.asarray: these programs contain complex (spectral)
        # ops, and the axon TPU transfer layer cannot read their real
        # outputs back directly (utils/host.py).
        carry, echo = self._init_program()(jnp.asarray(frame0))
        pieces = [to_host(echo)[None]]
        done = 0
        while done < n_steps:
            length = min(self.chunk, _next_pow2(n_steps - done))
            frames, carry = self._chunk_program(length)(carry)
            take = min(length, n_steps - done)
            pieces.append(to_host(frames)[:take])
            done += take
        out = np.concatenate(pieces)             # (n_steps+1, 3, nx, ny)
        self._record(time.perf_counter() - t0, n_steps)
        return out

    def warmup(self, n_steps: int = 1) -> None:
        self.predict(np.zeros((3, self.nx, self.ny), np.float32), n_steps)

    def stats(self) -> dict:
        return {"model": self.model_name, "stride": self.stride,
                **self._stats_base()}


class SolverEngine3D(ServingBase):
    """The 3D family (solvers/spectral3d.py) behind the same serving
    contract — on-demand 3D DNS ground truth.

    predict(frame0, n_steps) -> frames:
      frame0  (4, nx, ny, nz) float32 — (u, v, w, p); only the velocity
              carries information (p is recomputed from it). Arbitrary
              inputs are implicitly Leray-projected onto the solenoidal
              2/3-dealiased manifold; solver-produced frames round-trip
              exactly.
      frames  (n_steps + 1, 4, nx, ny, nz); frames[0] echoes the
              (projected) input, frames[i] the state after i * stride
              solver steps.
    """

    model_name = "solver:spectral3d"
    n_models = 1

    def __init__(self, nx: int, ny: int, nz: int, dt: float = 1e-3,
                 nu: float = 6.25e-4, stride: int = 1, chunk: int = 16,
                 dtype: str = "float32", transform: str = "auto",
                 forcing: str = "none", forcing_k: int = 4,
                 forcing_amp: float = 0.1):
        from ns_tpu.solvers import spectral3d as s3
        if stride < 1:
            raise ValueError(f"stride must be >= 1, got {stride}")
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        self.nx, self.ny, self.nz = nx, ny, nz
        self.stride, self.chunk = stride, chunk
        self._s3 = s3
        self.cfg = s3.Spectral3DConfig(nt=1, nx=nx, ny=ny, nz=nz, dt=dt,
                                       nu=nu, dtype=dtype,
                                       transform=transform,
                                       forcing=forcing, forcing_k=forcing_k,
                                       forcing_amp=forcing_amp)
        self._step, _ = s3.make_step(self.cfg)
        self._init_serving()

    # -- compiled programs ----------------------------------------------

    def _emit(self, carry):
        s3, cfg = self._s3, self.cfg
        vel = s3.fields_from_hat(cfg, carry[0])          # (3, nx, ny, nz)
        p = s3.pressure_from_hat(cfg, carry[0])
        return jnp.concatenate([vel, p[None]])           # (4, ...)

    def _init_program(self):
        s3, cfg = self._s3, self.cfg

        def build():
            @jax.jit
            def init(frame0):            # (4, nx, ny, nz) -> carry + echo
                carry = s3.carry_from_velocity(cfg, frame0[:3])
                return carry, self._emit(carry)

            return init

        return self._program(("init",), build)

    def _chunk_program(self, length: int):
        def build():
            @jax.jit
            def run(carry):
                def advance(c, n):
                    c, _ = jax.lax.scan(
                        lambda cc, _: (self._step(cc)[0], None), c, None,
                        length=n)
                    return c

                def body(c, _):
                    c = advance(c, self.stride)
                    return c, self._emit(c)

                carry, frames = jax.lax.scan(body, carry, None,
                                             length=length)
                return frames, carry      # (length, 4, nx, ny, nz)

            return run

        return self._program(("chunk", length), build)

    # -- public API -------------------------------------------------------

    def predict(self, frame0: np.ndarray, n_steps: int) -> np.ndarray:
        frame0 = np.asarray(frame0, dtype=np.float32)
        if frame0.shape != (4, self.nx, self.ny, self.nz):
            raise ValueError(
                f"frame0 must be (4, {self.nx}, {self.ny}, {self.nz}); "
                f"got {frame0.shape} (solver serving is single-state)")
        if n_steps < 0:
            raise ValueError(f"n_steps must be >= 0, got {n_steps}")
        t0 = time.perf_counter()
        carry, echo = self._init_program()(jnp.asarray(frame0))
        pieces = [to_host(echo)[None]]
        done = 0
        while done < n_steps:
            length = min(self.chunk, _next_pow2(n_steps - done))
            frames, carry = self._chunk_program(length)(carry)
            take = min(length, n_steps - done)
            pieces.append(to_host(frames)[:take])
            done += take
        out = np.concatenate(pieces)      # (n_steps+1, 4, nx, ny, nz)
        self._record(time.perf_counter() - t0, n_steps)
        return out

    def warmup(self, n_steps: int = 1) -> None:
        self.predict(np.zeros((4, self.nx, self.ny, self.nz), np.float32),
                     n_steps)

    def stats(self) -> dict:
        return {"model": self.model_name, "stride": self.stride,
                **self._stats_base()}
