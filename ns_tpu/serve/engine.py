"""In-process inference engine: checkpoint dir -> compiled rollout calls.

Rebuilds any trained surrogate family (rnn / basis_* / fno / fno_w) from a
`train.checkpoint` directory alone — the checkpoint's meta json carries the
full TrainConfig and grid shape — and serves `predict(frame0, n_steps)`
with jit caching tuned per family:

- fno / fno_w roll out autoregressively, so the engine compiles a
  fixed-size chunk (`lax.scan`) and loops it host-side; tails use
  power-of-two-bucketed shorter scans, so any horizon runs off at most
  log2(chunk) programs per batch bucket and a short request never pays
  for a full chunk.
- The basis/ODE families discretize t in [0, 1] into nt steps
  (models/node.py; ref anode/time_stepper.py:24-45), so the horizon IS
  the time grid — chunking would change the ODE solution. Programs are
  cached per requested horizon instead (the solve is one scan; compiles
  are the cost of the family's semantics, not the engine).
- Batched requests are padded up to the next power-of-two bucket so the
  number of distinct compiled programs stays O(log max_batch).

The device is driven from whatever thread calls predict(); the HTTP
server (serve/server.py) serializes access with a lock.
"""

from __future__ import annotations

import dataclasses
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

from ns_tpu.train.checkpoint import load_meta
from ns_tpu.train.trainer import TrainConfig
# to_host, not np.asarray, for rollout readbacks: the fno_w adapters and
# the fft transform engine put complex ops in the compiled programs, and
# the axon TPU transfer layer cannot read such executables' outputs back
# directly (utils/host.py).
from ns_tpu.utils.host import to_host


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _build_model(cfg: TrainConfig, nx: int, ny: int,
                 nz: int = None):
    """Model construction mirroring train.trainer.Trainer.__init__ (the
    single source of family -> constructor truth; kept in lockstep by
    tests/test_serve.py round-trips)."""
    if cfg.model == "basis_ode":
        from ns_tpu.models.basis import BasisODE
        return BasisODE(cfg.n_coeffs, nx, ny)
    if cfg.model == "basis_ode2":
        from ns_tpu.models.basis import BasisODE2
        return BasisODE2(cfg.n_coeffs, nx, ny)
    if cfg.model == "basis_gru":
        from ns_tpu.models.basis import BasisGRU
        return BasisGRU(cfg.n_coeffs, nx, ny)
    if cfg.model == "basis_ode_conv":
        from ns_tpu.models.basis import BasisODEConv
        return BasisODEConv(cfg.n_coeffs, nx, ny)
    if cfg.model in ("fno", "fno_w"):
        from ns_tpu.models.fno import FNO2D
        channels = 1 if cfg.model == "fno_w" else 3
        return FNO2D(nx, ny, width=cfg.fno_width, modes=cfg.fno_modes,
                     channels=channels, transform=cfg.fno_transform,
                     precision=cfg.fno_precision)
    if cfg.model == "fno_psi":
        from ns_tpu.models.streamfunction import FNOPsi
        return FNOPsi(nx, ny, width=cfg.fno_width, modes=cfg.fno_modes,
                      transform=cfg.fno_transform,
                      precision=cfg.fno_precision)
    if cfg.model in ("fno3d", "fno3d_w", "fno3d_a"):
        from ns_tpu.models.fno3d import FNO3D
        return FNO3D(nx, ny, nz, width=cfg.fno_width, modes=cfg.fno_modes,
                     channels=4 if cfg.model == "fno3d" else 3,
                     transform=cfg.fno_transform,
                     precision=cfg.fno_precision)
    if cfg.model == "rnn":
        from ns_tpu.models.gru import FullFieldGRU
        return FullFieldGRU(3 * nx * ny, cfg.hidden_dim)
    raise ValueError(f"unknown model family {cfg.model!r}")


class ServingBase:
    """Shared plumbing for the serving engines (surrogate InferenceEngine
    here, oracle serve.solver.SolverEngine): compiled-program cache and
    thread-safe request/latency stats."""

    def _init_serving(self):
        self._programs: dict = {}
        self._stats_lock = threading.Lock()
        self._latencies: list[float] = []
        self._requests = 0
        self._steps_served = 0

    def _program(self, key, build):
        if key not in self._programs:
            self._programs[key] = build()
        return self._programs[key]

    def _record(self, dt: float, n_steps: int) -> None:
        with self._stats_lock:
            self._requests += 1
            self._steps_served += n_steps
            self._latencies.append(dt)
            if len(self._latencies) > 4096:
                del self._latencies[:2048]

    def _stats_base(self) -> dict:
        with self._stats_lock:
            lat = sorted(self._latencies)
            n = len(lat)
            pct = (lambda q: lat[min(n - 1, int(q * n))]) if n else (
                lambda q: None)
            return {
                "grid": [self.nx, self.ny],
                "chunk": self.chunk,
                "requests": self._requests,
                "steps_served": self._steps_served,
                "compiled_programs": len(self._programs),
                "latency_s": {"p50": pct(0.50), "p90": pct(0.90),
                              "p99": pct(0.99),
                              "max": lat[-1] if n else None},
            }


class InferenceEngine(ServingBase):
    """Serve full-state extrapolation from a trained surrogate.

    predict(frame0, n_steps) -> frames:
      frame0  (3, nx, ny) or (B, 3, nx, ny) float32 (u, v, p)
      frames  (n_steps + 1, 3, nx, ny) / (B, n_steps + 1, 3, nx, ny);
              frames[..., 0, :, :, :] is the input frame, so
              frames[t] approximates the state t surrogate-frames later
              (frame-aligned like train.trainer.Trainer.extrapolate).
              For an EnsembleTrainer checkpoint (n_models M > 1) a
              leading member axis is prepended: (M, [B,] n_steps + 1, 3,
              nx, ny) — reduce over it for the ensemble mean / spread.
    """

    def __init__(self, cfg: TrainConfig, params, nx: int, ny: int,
                 chunk: int = 64, n_models: int = 1, nz: int = None):
        if chunk < 1:
            raise ValueError(f"chunk must be >= 1, got {chunk}")
        self.cfg, self.nx, self.ny, self.chunk = cfg, nx, ny, chunk
        self.nz = nz  # set for the 3D operator family (fno3d)
        self.n_models = n_models
        self.model = _build_model(cfg, nx, ny, nz)
        # resident on device once: host-numpy params would be re-uploaded
        # on EVERY request (tens of MB through a ~20 MB/s device tunnel
        # dominated serving latency before this)
        self.params = jax.device_put(params)
        self._init_serving()

    # -- construction -------------------------------------------------------

    @classmethod
    def from_checkpoint(cls, ckpt: str, chunk: int = 64) -> "InferenceEngine":
        """ckpt: a checkpoint.npz path or a directory containing one."""
        if os.path.isdir(ckpt):
            ckpt = os.path.join(ckpt, "checkpoint.npz")
        meta = load_meta(ckpt)
        if "config" not in meta:
            raise ValueError(f"{ckpt} has no embedded config; pass a "
                             "checkpoint written by train.trainer.Trainer")
        fields = {f.name for f in dataclasses.fields(TrainConfig)}
        cfg = TrainConfig(**{k: v for k, v in meta["config"].items()
                             if k in fields})
        if "grid" in meta:
            grid = [int(v) for v in meta["grid"]]  # [nx, ny(, nz)]
        else:
            # pre-grid checkpoints: recover the grid from the data file the
            # model was trained on (same path resolution as training)
            from ns_tpu.train.trainer import load_obs
            obs = load_obs(cfg.npz_path, 1)
            grid = list(obs.shape[3:])
        nx, ny = grid[0], grid[1]
        nz = grid[2] if len(grid) == 3 else None
        model = _build_model(cfg, nx, ny, nz)
        n_models = int(meta.get("n_models", 1))
        if n_models > 1:  # EnsembleTrainer checkpoint: leading member axis
            from ns_tpu.train.ensemble import init_ensemble
            template = init_ensemble(model, n_models, seed=cfg.seed)
        else:
            template = model.init(jax.random.PRNGKey(cfg.seed))
        # restore only the params subtree: serving has no optimizer
        params = load_checkpoint_params(ckpt, template)
        return cls(cfg, params, nx, ny, chunk=chunk, n_models=n_models,
                   nz=nz)

    # -- per-family compiled programs ---------------------------------------

    def _fno_post(self):
        from ns_tpu.train.trainer import rollout_post
        return rollout_post(self.cfg)

    def _fno_chunk(self, length: int):
        """jitted (params, x) -> (frames, last_state) where frames is
        (length, ..., 3, nx, ny) ALREADY in (u, v, p) space (for fno_w
        the exact w -> uvp recovery runs inside the program: reading w
        back, re-uploading, and converting in a second program would pay
        the ~20 MB/s device tunnel twice more) and last_state feeds the
        next chunk. For an M-member ensemble both outputs gain a leading
        M axis. `length` is power-of-two-bucketed by the caller, so at
        most log2(chunk) distinct programs exist."""
        post = self._fno_post()
        is_w = self.cfg.model == "fno_w"
        is_w3 = self.cfg.model in ("fno3d_w", "fno3d_a")
        if is_w:
            from ns_tpu.models.vorticity import uvp_from_w
        if is_w3:
            from ns_tpu.models.vorticity3d import repr3d_fns
            _, uvwp_from_repr = repr3d_fns(self.cfg.model)

        def build():
            def run1(params, x):
                xs = self.model.rollout(params, x, length, post=post)
                if is_w:
                    w_flat = xs.reshape(-1, self.nx, self.ny)
                    u, v, p = jax.vmap(uvp_from_w)(w_flat)
                    frames = jnp.stack([u, v, p], axis=1).reshape(
                        xs.shape[:-3] + (3, self.nx, self.ny))
                elif is_w3:
                    om_flat = xs.reshape(-1, 3, self.nx, self.ny, self.nz)
                    frames = jax.vmap(uvwp_from_repr)(om_flat).reshape(
                        xs.shape[:-4] + (4, self.nx, self.ny, self.nz))
                else:
                    frames = xs
                return frames, xs[-1]

            run = (jax.vmap(run1) if self.n_models > 1 else run1)
            return jax.jit(run)

        return self._program(("fno_chunk", length), build)

    def _echo_uvp(self):
        """jitted state echo in (u, v, p) space: ([M,] B, C, nx, ny) ->
        ([M,] B, 3, nx, ny) — frame 0 of every reply."""
        is_w = self.cfg.model == "fno_w"
        is_w3 = self.cfg.model in ("fno3d_w", "fno3d_a")
        if is_w:
            from ns_tpu.models.vorticity import uvp_from_w
        if is_w3:
            from ns_tpu.models.vorticity3d import repr3d_fns
            _, uvwp_from_repr = repr3d_fns(self.cfg.model)

        def build():
            @jax.jit
            def echo(state):
                if is_w:
                    w_flat = state.reshape(-1, self.nx, self.ny)
                    u, v, p = jax.vmap(uvp_from_w)(w_flat)
                    return jnp.stack([u, v, p], axis=1).reshape(
                        state.shape[:-3] + (3, self.nx, self.ny))
                if is_w3:
                    om = state.reshape(-1, 3, self.nx, self.ny, self.nz)
                    return jax.vmap(uvwp_from_repr)(om).reshape(
                        state.shape[:-4] + (4, self.nx, self.ny, self.nz))
                return state

            return echo

        return self._program(("echo",), build)

    def _predict_fno(self, frame0: np.ndarray, n_steps: int) -> np.ndarray:
        cfg = self.cfg
        # single-state rank: 3 for 2D (C, nx, ny), 4 for fno3d
        batched = frame0.ndim == (5 if self.nz else 4)
        x = jnp.asarray(frame0 if batched else frame0[None])  # (B, C, ...)
        b = x.shape[0]
        bucket = _next_pow2(b)    # bound compiles at O(log max_batch)
        if bucket != b:
            x = jnp.concatenate(
                [x, jnp.zeros((bucket - b,) + x.shape[1:], x.dtype)])
        if cfg.model == "fno_w":
            from ns_tpu.models.vorticity import vorticity_from_uv

            def build_w():
                # jitted: spectral derivatives must not dispatch eagerly
                # over the device tunnel (complex intermediate hazards)
                @jax.jit
                def to_w(uv):
                    return jax.vmap(vorticity_from_uv)(
                        uv[:, 0], uv[:, 1])[:, None]

                return to_w

            state = self._program(("w",), build_w)(x)          # (B, 1, nx, ny)
        elif cfg.model in ("fno3d_w", "fno3d_a"):
            from ns_tpu.models.vorticity3d import repr3d_fns
            to_repr, _ = repr3d_fns(cfg.model)

            def build_w3():
                @jax.jit
                def to_w3(uvwp):
                    return to_repr(uvwp[:, :3])

                return to_w3

            state = self._program(("w3", cfg.model),
                                  build_w3)(x)  # (B, 3, nx, ny, nz)
        else:
            state = x                                          # (B, 3, nx, ny)
        m = self.n_models
        if m > 1:  # every member starts from the same request state
            state = jnp.broadcast_to(state[None], (m,) + state.shape)
        # frame 0 is the input state echoed in (u, v, p) space; pieces
        # entries are (take, [M,] B, 3, nx, ny), time leading
        pieces = [to_host(self._echo_uvp()(state))[None]]
        done = 0
        while done < n_steps:
            # short tails run a smaller pow2-bucketed scan instead of a
            # full chunk (a 20-step request must not pay for 64 steps)
            length = min(self.chunk, _next_pow2(n_steps - done))
            run = self._fno_chunk(length)
            # frames already uvp; last feeds the next chunk in model space
            frames, last = run(self.params, state)
            take = min(length, n_steps - done)
            fr = to_host(frames)           # ([M,] length, B, 3, nx, ny)
            piece = (np.moveaxis(fr[:, :take], 1, 0) if m > 1
                     else fr[:take])       # (take, [M,] B, 3, nx, ny)
            pieces.append(piece)
            state = last  # only read again when the full length was taken
            done += take
        seq = np.concatenate(pieces)       # (n_steps+1, [M,] B, 3, nx, ny)
        # time axis to its contract position: (…members, batch, time, …),
        # bucket-padding rows sliced off
        out = (np.moveaxis(seq, 0, 2)[:, :b] if m > 1
               else np.moveaxis(seq, 0, 1)[:b])
        if not batched:
            out = out[:, 0] if m > 1 else out[0]
        return out

    def _predict_basis(self, frame0: np.ndarray, n_steps: int) -> np.ndarray:
        batched = frame0.ndim == 4
        x = jnp.asarray(frame0 if batched else frame0[None])   # (B, 3, nx, ny)
        b = x.shape[0]
        bucket = _next_pow2(b)
        if bucket != b:
            x = jnp.concatenate(
                [x, jnp.zeros((bucket - b,) + x.shape[1:], x.dtype)])
        nt = n_steps + 1  # the solve includes the t=0 state
        m = self.n_models

        def build():
            def run1(params, grid0):
                return self.model.apply(params, grid0, nt)

            run = (jax.vmap(run1, in_axes=(0, None)) if m > 1 else run1)
            return jax.jit(run)

        run = self._program(("basis", nt, bucket), build)
        pred = to_host(run(self.params, x))      # ([M,] nt, B, 3, nx, ny)
        if m > 1:
            out = np.moveaxis(pred, 1, 2)[:, :b]   # (M, B, nt, 3, nx, ny)
            return out if batched else out[:, 0]
        out = np.moveaxis(pred, 0, 1)[:b]        # (B, nt, 3, nx, ny)
        return out if batched else out[0]

    def _predict_rnn(self, frame0: np.ndarray, n_steps: int) -> np.ndarray:
        batched = frame0.ndim == 4
        x = np.asarray(frame0 if batched else frame0[None], np.float32)
        b = x.shape[0]
        flat = jnp.asarray(x.reshape(b, -1))
        bucket = _next_pow2(b)
        if bucket != b:
            flat = jnp.concatenate(
                [flat, jnp.zeros((bucket - b, flat.shape[1]), flat.dtype)])

        m = self.n_models

        def build():
            def run1(params, obs0):
                return self.model.extrapolate(params, obs0, n_steps)

            run = (jax.vmap(run1, in_axes=(0, None)) if m > 1 else run1)
            return jax.jit(run)

        run = self._program(("rnn", n_steps, bucket), build)
        pred = to_host(run(self.params, flat))      # ([M,] B, n, D)
        if m > 1:
            pred = pred[:, :b].reshape(m, b, n_steps, 3, self.nx, self.ny)
            out = np.concatenate(
                [np.broadcast_to(x[None, :, None], pred[:, :, :1].shape),
                 pred], axis=2)                     # (M, B, n+1, 3, nx, ny)
            return out if batched else out[:, 0]
        pred = pred[:b].reshape(b, n_steps, 3, self.nx, self.ny)
        out = np.concatenate([x[:, None], pred], axis=1)
        return out if batched else out[0]

    # -- public API ---------------------------------------------------------

    def predict(self, frame0: np.ndarray, n_steps: int) -> np.ndarray:
        frame0 = np.asarray(frame0, dtype=np.float32)
        state_shape = ((4, self.nx, self.ny, self.nz) if self.nz
                       else (3, self.nx, self.ny))
        r = len(state_shape)
        if (frame0.ndim not in (r, r + 1)
                or frame0.shape[-r:] != state_shape):
            raise ValueError(
                f"frame0 must be {state_shape} or (B,) + {state_shape}; "
                f"got {frame0.shape}")
        if n_steps < 0:
            raise ValueError(f"n_steps must be >= 0, got {n_steps}")
        t0 = time.perf_counter()
        if self.cfg.model in ("fno", "fno_w", "fno_psi", "fno3d",
                              "fno3d_w", "fno3d_a"):
            out = self._predict_fno(frame0, n_steps)
        elif self.cfg.model == "rnn":
            out = self._predict_rnn(frame0, n_steps)
        else:
            out = self._predict_basis(frame0, n_steps)
        nb = frame0.shape[0] if frame0.ndim == r + 1 else 1
        self._record(time.perf_counter() - t0, n_steps * nb)
        return out

    def warmup(self, n_steps: int = 1, batch: int = 1) -> None:
        """Pay the compile cost up front for the given request shape."""
        shape = ((4, self.nx, self.ny, self.nz) if self.nz
                 else (3, self.nx, self.ny))
        if batch > 1:
            shape = (batch,) + shape
        self.predict(np.zeros(shape, np.float32), n_steps)

    def stats(self) -> dict:
        return {"model": self.cfg.model, **self._stats_base()}


def load_checkpoint_params(ckpt: str, params_template):
    """Restore just the params subtree of a Trainer checkpoint (serving
    carries no optimizer state): leaf-by-leaf key-path load with shape
    checks, ignoring the checkpoint's opt_state/* leaves."""
    data = np.load(ckpt)
    from ns_tpu.train.checkpoint import _path_key

    flat = jax.tree_util.tree_flatten_with_path(params_template)[0]
    treedef = jax.tree_util.tree_structure(params_template)
    missing = [f"params/{_path_key(p)}" for p, _ in flat
               if f"params/{_path_key(p)}" not in data.files]
    if missing:
        raise ValueError(f"checkpoint {ckpt} is missing params leaves "
                         f"{missing} (wrong model config for this "
                         "checkpoint?)")
    leaves = []
    for pth, leaf in flat:
        key = f"params/{_path_key(pth)}"
        arr = data[key]
        want = np.shape(leaf)
        if tuple(arr.shape) != tuple(want):
            raise ValueError(
                f"checkpoint {ckpt} leaf {key!r} has shape "
                f"{tuple(arr.shape)}; this config expects {tuple(want)} "
                "(wrong model config for this checkpoint?)")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)
