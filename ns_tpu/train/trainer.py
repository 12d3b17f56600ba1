"""One trainer for all four surrogate families.

The reference duplicates ~80% of its training boilerplate across four
drivers (rnn.py:61-134, spectral_rnn.py:100-184, spectral_ode.py:140-224,
spectral_ode2.py:128-204 — SURVEY.md §2 duplication note). This trainer
factors that into one loop with the same training protocol:

  - data: load the npz rollout, stack (u, v, p) to (nt, 1, 3, nx, ny),
    train on the FIRST `n_frames` (default 100) frames (ref
    spectral_ode.py:158-167)
  - Adam lr=1e-3 (ref :171), loss = global L2 norm ||pred - obs||
    (ref :182), diversity penalty logged but NOT in the loss (ref :184-186)
  - checkpoint every `ckpt_every` (default 10) iterations (ref :195-202)
  - final full-horizon extrapolation saved to extrapolation.npy
    (ref :208-224)

plus what the reference lacks: RESUME from checkpoint (SURVEY.md §5), a
jitted train step fusing rollout + loss + grad + update into one XLA
program, and optional NaN guards (jax_debug_nans is the debug-mode switch).
"""

from __future__ import annotations

import dataclasses
import os
import time
import warnings
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ns_tpu.models.basis import BasisODE, BasisODE2, BasisGRU, BasisODEConv
from ns_tpu.models.fno import FNO2D
from ns_tpu.models.gru import FullFieldGRU
from ns_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from ns_tpu.train.metrics import AverageMeter, l2_loss

MODELS = ("basis_ode", "basis_ode2", "basis_gru", "basis_ode_conv",
          "rnn", "fno", "fno_w", "fno_psi", "fno3d", "fno3d_w",
          "fno3d_a")

# the operator families: next-step maps whose training objective batches
# trajectories and supports pushforward/noise (build_forward fno branch)
FNO_FAMILIES = ("fno", "fno_w", "fno_psi", "fno3d", "fno3d_w",
                "fno3d_a")

# the vorticity-representation members: train on the curl of the velocity
# data (exactly derived), recover the full field contract at eval — the
# representation makes every prediction exactly divergence-free
# (models/vorticity.py 2D, models/vorticity3d.py 3D)
W_FAMILIES = ("fno_w", "fno3d_w", "fno3d_a")


@dataclasses.dataclass
class TrainConfig:
    """CLI-parameter parity with ref spectral_ode.py:141-150 (+ model
    selection; `gpu_device` has no TPU meaning and is accepted/ignored
    by the CLI)."""

    model: str = "basis_ode"
    npz_path: str = "./data_semi_implicit.npz"
    out_dir: str = "./checkpoints/basis_ode"
    n_iters: int = 1000
    n_coeffs: int = 10
    lr: float = 1e-3
    hidden_dim: int = 512  # rnn baseline hidden size (ref rnn.py:89)
    n_frames: int = 100
    ckpt_every: int = 10
    seed: int = 0
    resume: Optional[str] = None  # path to checkpoint.npz
    # fno only: train on k-step autoregressive rollouts instead of single
    # next-step prediction (the pushforward trick) — reduces the
    # teacher-forcing/extrapolation mismatch at k x the training cost
    fno_rollout_steps: int = 1
    # fno capacity: spectral modes kept per axis and channel width — raise
    # modes toward nx/3 for higher-wavenumber flows
    fno_modes: int = 12
    fno_width: int = 32
    # fno (uvp) only: compose the training-free spectral divergence
    # projection (models/projection.py) into the autoregressive rollout —
    # every fed-back prediction is exactly incompressible
    fno_project: bool = False
    # fno/fno_w only: train-time Gaussian noise injected into the input
    # frames (std = input_noise * std(data)) — the standard stabilizer for
    # autoregressive surrogates (makes the operator robust to its own
    # prediction-error distribution at rollout time; composes with
    # fno_rollout_steps). 0 disables.
    input_noise: float = 0.0
    # fno/fno_w only: rematerialize each unroll step of the k-step rollout
    # objective (jax.checkpoint) — activation memory drops from O(k *
    # layer internals) to O(k * field), the standard trade for deep
    # unrolls that OOM (e.g. 8-step at 128^2); ~2x forward recompute
    fno_remat: bool = False
    # fno_w/fno3d: dealias-filter each fed-back prediction onto the 2/3
    # band the training data lives on (rollout stability filter; for
    # fno3d it shares one spectral round trip with fno_project)
    fno_dealias: bool = True
    # fno/fno_w: spectral-transform engine for the FNO layers — 'matmul'
    # computes only the retained mode block as MXU GEMMs (faster at small
    # /medium grids where XLA's TPU FFT runs off the roofline), 'fft' is
    # the classic path, 'auto' picks by grid size. Engines agree to fp
    # rounding, so checkpoints transfer between them.
    fno_transform: str = "auto"
    # fno/fno_w: GEMM precision inside the FNO layers. None = jnp default
    # (bf16-class on TPU at f32 — what every RESULTS.md fno number ran
    # at); 'highest' makes TPU cross-engine checkpoint transfer as tight
    # as the CPU tests (models/fno.py::resolve_precision).
    fno_precision: Optional[str] = None
    # fno families: stochastic minibatch training — every step samples
    # batch_size (window, trajectory-stack) starts uniformly WITH
    # replacement from the nt-k training windows instead of the
    # reference's full-batch objective (spectral_ode.py:182 fits all
    # frames every step). 0 keeps full-batch. This is what scales to
    # large multi-trajectory datasets (step cost independent of nt) and
    # it composes with dp (the sampled batch is what shards). Sampling
    # rides the same PRNG stream as input_noise, so RESUME continues the
    # exact sample sequence.
    batch_size: int = 0
    # learning-rate schedule: 'constant' (the reference's fixed Adam lr,
    # spectral_ode.py:171) or 'cosine' (decay to 0 over n_iters). Either
    # composes with warmup_iters > 0 (linear 0 -> lr ramp — the standard
    # stabilizer for operator training at larger lr/batch). The schedule
    # step count lives in opt_state, so RESUME continues the schedule
    # exactly where the checkpoint left it.
    lr_schedule: str = "constant"
    warmup_iters: int = 0
    # total iterations the schedule decays over (None = this run's
    # n_iters). Set it when training in SEGMENTS (stop early, resume
    # later): every segment passes the same planned total so the decay
    # curve is identical across segments, and the restored opt_state
    # count lands each resume at the right point on it.
    schedule_horizon: Optional[int] = None
    # global-norm gradient clipping (0 disables) — the usual guard for
    # the k-step pushforward objective, whose early-training gradients
    # can spike when fed-back predictions leave the data manifold
    grad_clip: float = 0.0
    # data-parallel training over a {'data': dp} device mesh (1 = single
    # device). The operator families (fno/fno_w/fno3d) shard the
    # training-window (frame) batch axis; rnn shards the trajectory batch
    # axis. Params stay replicated; the loss is a global reduction, so jit
    # lowers the gradient sync to ONE scalar-tree all-reduce — the
    # standard DP recipe, with no optimizer/step code changes. The basis
    # families have no batch axis to shard (single learned coefficient
    # trajectory — reference semantics) and reject dp > 1.
    dp: int = 1

    def __post_init__(self):
        if self.model not in MODELS:
            raise ValueError(f"model must be one of {MODELS}, got {self.model!r}")
        if self.fno_transform not in ("auto", "fft", "matmul"):
            raise ValueError(f"fno_transform must be auto|fft|matmul, "
                             f"got {self.fno_transform!r}")
        if self.fno_precision not in (None, "default", "high", "highest"):
            raise ValueError(f"fno_precision must be None|default|high|"
                             f"highest, got {self.fno_precision!r}")
        if self.n_iters < 0:
            raise ValueError(f"n_iters must be >= 0, got {self.n_iters}")
        if self.ckpt_every < 1:
            # 0 divides the chunk arithmetic, negatives loop forever
            raise ValueError(
                f"ckpt_every must be >= 1, got {self.ckpt_every}")
        if self.dp < 1:
            raise ValueError(f"dp must be >= 1, got {self.dp}")
        if self.lr_schedule not in ("constant", "cosine"):
            raise ValueError(f"lr_schedule must be constant|cosine, "
                             f"got {self.lr_schedule!r}")
        if self.warmup_iters < 0:
            raise ValueError(
                f"warmup_iters must be >= 0, got {self.warmup_iters}")
        if self.schedule_horizon is not None and self.schedule_horizon < 1:
            raise ValueError(f"schedule_horizon must be >= 1, "
                             f"got {self.schedule_horizon}")
        if self.grad_clip < 0:
            raise ValueError(
                f"grad_clip must be >= 0 (0 disables), got {self.grad_clip}")
        if self.batch_size < 0:
            raise ValueError(f"batch_size must be >= 0 (0 = full batch), "
                             f"got {self.batch_size}")
        if self.batch_size > 0 and self.model not in FNO_FAMILIES:
            raise ValueError(
                f"batch_size samples next-step training windows, which "
                f"only the operator families (fno/fno_w/fno3d) have; "
                f"{self.model!r} trains on the whole trajectory")
        if self.model == "fno3d_w":
            # not an error (the family is kept as a measured negative
            # result) but every benchmark run of it diverged — steer
            # users to the working representations
            warnings.warn(
                "fno3d_w (raw 3-component vorticity representation) "
                "reproducibly diverges to inf on this repo's own 3D "
                "benchmarks at every tried capacity/noise setting "
                "(RESULTS.md '3D surrogate quality' table). Use "
                "fno3d_a (vector-potential representation, exactly "
                "divergence-free) or fno3d (raw uvwp) instead.",
                stacklevel=2)


def load_obs(npz_path: str, n_frames: Optional[int]):
    """npz rollout -> obs (nt, M, C, *spatial) float32 (ref :158-166).

    2D rollouts (u, v, p keys) -> (nt, M, 3, nx, ny); 3D rollouts (the
    run_solver *_3d presets carry a w key) -> (nt, M, 4, nx, ny, nz).
    M > 1 for multi-trajectory datasets (run_solver --n-traj)."""
    data = np.load(npz_path)
    if "w" in data:  # 3D rollout: (nt, nx, ny, nz) or (M, nt, ...)
        fields = [data[k] for k in ("u", "v", "w", "p")]
        if fields[0].ndim == 5:  # multi-trajectory
            if n_frames is not None:
                fields = [f[:, :n_frames] for f in fields]
            obs = np.stack(fields, axis=2).astype(np.float32)
            return jnp.asarray(np.swapaxes(obs, 0, 1))
        if n_frames is not None:
            fields = [f[:n_frames] for f in fields]
        obs = np.stack(fields, axis=1).astype(np.float32)
        return jnp.asarray(obs[:, None])  # (nt, 1, 4, nx, ny, nz)
    u, v, p = data["u"], data["v"], data["p"]
    if u.ndim == 4:
        # multi-trajectory dataset (M, nt, nx, ny) — e.g. run_solver
        # --n-traj: the trajectory axis becomes the obs batch axis
        if n_frames is not None:
            u, v, p = u[:, :n_frames], v[:, :n_frames], p[:, :n_frames]
        obs = np.stack([u, v, p], axis=2).astype(np.float32)
        return jnp.asarray(np.swapaxes(obs, 0, 1))  # (nt, M, 3, nx, ny)
    if n_frames is not None:
        u, v, p = u[:n_frames], v[:n_frames], p[:n_frames]
    obs = np.stack([u, v, p], axis=1).astype(np.float32)  # (nt, 3, nx, ny)
    return jnp.asarray(obs[:, None])  # (nt, 1, 3, nx, ny)


def make_optimizer(cfg: TrainConfig):
    """Adam under the configured lr schedule + optional global-norm clip.
    The reference's protocol is plain Adam(lr) (spectral_ode.py:171) —
    that stays the default; the schedule/clip knobs are the production
    additions. Schedule progress rides opt_state (optax counts), so
    checkpoints resume mid-schedule."""
    horizon = (cfg.schedule_horizon if cfg.schedule_horizon is not None
               else cfg.n_iters)
    if cfg.lr_schedule == "cosine":
        decay = max(horizon - cfg.warmup_iters, 1)
        if cfg.warmup_iters > 0:
            sched = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=cfg.lr,
                warmup_steps=cfg.warmup_iters,
                decay_steps=cfg.warmup_iters + decay)
        else:
            sched = optax.cosine_decay_schedule(cfg.lr, decay_steps=decay)
    elif cfg.warmup_iters > 0:
        sched = optax.linear_schedule(0.0, cfg.lr, cfg.warmup_iters)
    else:
        sched = cfg.lr
    tx = optax.adam(sched)
    if cfg.grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def rollout_post(cfg):
    """The per-step constraint map composed into fno-family autoregression
    (None when the config enables none): 2/3-band dealias for fno_w,
    exact divergence projection for fno. ONE definition feeds training
    feedback (build_forward), eval (Trainer/EnsembleTrainer.extrapolate),
    and serving (serve/engine.py) so the three rollouts stay in lockstep.
    """
    if cfg.model == "fno_w" and cfg.fno_dealias:
        from ns_tpu.models.vorticity import dealias_field
        return lambda x: dealias_field(x)
    if cfg.model == "fno_psi" and cfg.fno_dealias:
        # divergence-freedom is the head's algebraic property
        # (models/streamfunction.py); the rollout filter only needs the
        # 2/3-band stabilizer, applied channelwise (a spectral mask
        # commutes with the spectral derivatives, so it preserves the
        # solenoidal property exactly)
        from ns_tpu.models.vorticity import dealias_field
        return lambda x: dealias_field(x)
    if cfg.model == "fno" and getattr(cfg, "fno_project", False):
        from ns_tpu.models.projection import project_periodic

        def post(x):
            u_p, v_p = project_periodic(x[..., 0, :, :], x[..., 1, :, :])
            return jnp.stack([u_p, v_p, x[..., 2, :, :]], axis=-3)

        return post
    if cfg.model == "fno3d" and (getattr(cfg, "fno_project", False)
                                 or cfg.fno_dealias):
        from functools import partial

        from ns_tpu.models.projection import rollout_filter3d
        # one spectral round trip does both: 2/3-band dealias of every
        # channel (high-k prediction noise compounds autoregressively —
        # the 2D fno_w lesson) and the exact Leray projection of (u,v,w)
        return partial(rollout_filter3d,
                       project=getattr(cfg, "fno_project", False),
                       dealias=cfg.fno_dealias)
    if cfg.model in ("fno3d_w", "fno3d_a") and cfg.fno_dealias:
        # the omega channels need only the band filter: divergence-freedom
        # comes from the representation itself (Biot-Savart recovery —
        # models/vorticity3d.py), not a projection step
        from ns_tpu.models.vorticity3d import dealias_field3d
        return lambda x: dealias_field3d(x)
    return None


def build_forward(cfg, model, obs, w_frames=None, data_scale=1.0,
                  mesh=None):
    """forward(params, key=None) -> (pred, target): the per-family training
    objective on a fixed observation tensor. The single definition shared
    by Trainer (one model) and EnsembleTrainer (vmapped over a leading
    model axis — the objective itself is per-model identical).

    obs is (nt, M, 3, nx, ny) — M trajectories share the operator (M=1
    for the reference's single-rollout protocol); w_frames (w families)
    is the derived training tensor; data_scale sets the absolute std of
    cfg.input_noise's perturbation. The basis families are
    single-trajectory by design (one learned coefficient trajectory —
    reference semantics); Trainer rejects M > 1 for them.

    The returned forward accepts the training tensor as an OPTIONAL
    runtime argument: forward(params, key, frames). Passing it (what
    Trainer/EnsembleTrainer do) keeps the data out of the traced
    closure — a closure-captured device array is embedded into the
    lowered HLO as a literal, which at 3D scale (100 x 3 x 64^3 f32 =
    315 MB) overflows the axon remote-compile request (HTTP 413) and is
    pure waste everywhere else. frames=None falls back to the build-time
    tensor (small-model convenience paths).
    """
    nt = obs.shape[0]

    if mesh is None:
        shard_batch = lambda t: t  # noqa: E731 — single-device identity
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp_sharding = NamedSharding(mesh, P("data"))

        def shard_batch(t):
            # lay the BATCH axis of the objective over the 'data' mesh
            # axis (with_sharding_constraint, not device_put: GSPMD's
            # internal padding makes any batch size legal, so nt need not
            # divide dp). obs itself stays replicated — it is the derived
            # window/trajectory batch that parallelizes.
            return jax.lax.with_sharding_constraint(t, dp_sharding)

    def forward(params, key=None, frames=None):
        if frames is None:
            frames = (w_frames if cfg.model in W_FAMILIES else obs)
        if cfg.model == "rnn":
            # teacher-forced next-frame prediction (ref rnn.py:86-99);
            # trajectories ride the GRU batch axis
            m = frames.shape[1]
            obs_flat = shard_batch(
                jnp.swapaxes(frames, 0, 1).reshape(m, nt, -1))
            pred = model.apply(params, obs_flat[:, :-1])
            return pred, obs_flat[:, 1:]
        if cfg.model in FNO_FAMILIES:
            # (nt, M, C, *spatial): the trajectory axis is a batch axis of
            # the next-step operator (M=1 for reference-protocol data)
            k = max(cfg.fno_rollout_steps, 1)
            sigma = cfg.input_noise
            n_win = nt - k
            idx = None
            if cfg.batch_size > 0 and key is not None:
                # stochastic minibatch: sample window starts uniformly
                # with replacement (split first so the noise draw below
                # stays on its own stream; batch_size=0 leaves `key`
                # untouched, keeping pre-minibatch runs bitwise)
                key, ks = jax.random.split(key)
                idx = jax.random.randint(ks, (cfg.batch_size,), 0, n_win)

            def window(j):
                # frame-(start+j) of every training window: all n_win
                # starts for the full-batch objective, the sampled ones
                # for minibatch
                return frames[j:n_win + j] if idx is None else frames[idx + j]

            if k == 1:
                # teacher-forced next-step operator on field frames
                x = shard_batch(window(0))
                if sigma > 0 and key is not None:
                    x = x + sigma * data_scale * jax.random.normal(
                        key, x.shape, x.dtype)
                pred = model.apply(params, x)
                return pred, shard_batch(window(1))
            # k-step autoregressive training: predict frames j..j+k from
            # frame j, batched over the window starts; noise perturbs only
            # the initial input — later steps already see the model's own
            # (imperfect) outputs, which is the perturbation that matters
            x = shard_batch(window(0))
            if sigma > 0 and key is not None:
                x = x + sigma * data_scale * jax.random.normal(
                    key, x.shape, x.dtype)
            apply = (jax.checkpoint(model.apply) if cfg.fno_remat
                     else model.apply)
            # feed back through the SAME constraint map the eval/serving
            # rollouts apply (dealias/projection): the pushforward must
            # see the deployed prediction-error distribution, and the
            # config docs promise fed-back predictions stay on the
            # manifold. Loss stays on the raw predictions.
            post = rollout_post(cfg)
            preds, targets = [], []
            for j in range(1, k + 1):
                pred = apply(params, x)
                preds.append(pred)
                targets.append(shard_batch(window(j)))
                x = post(pred) if post is not None else pred
            return jnp.stack(preds), jnp.stack(targets)
        pred = model.apply(params, frames[0], nt)
        return pred, frames

    return forward


class Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        obs = load_obs(cfg.npz_path, cfg.n_frames)
        self.obs = obs
        self.nt, n_traj = obs.shape[0], obs.shape[1]
        spatial = obs.shape[3:]
        self.nx, self.ny = spatial[0], spatial[1]
        self.nz = spatial[2] if len(spatial) == 3 else None
        wants_3d = cfg.model in ("fno3d", "fno3d_w", "fno3d_a")
        if (self.nz is not None) != wants_3d:
            raise ValueError(
                f"{cfg.model!r} expects "
                f"{'3D (u,v,w,p)' if wants_3d else '2D (u,v,p)'}"
                f" data; {cfg.npz_path} has spatial shape {spatial}")
        if n_traj > 1 and cfg.model not in FNO_FAMILIES + ("rnn",):
            raise ValueError(
                f"multi-trajectory data (M={n_traj}) needs an operator "
                f"family {FNO_FAMILIES} or rnn; {cfg.model!r} learns a "
                "single coefficient trajectory by design (reference "
                "semantics)")
        self.mesh = None
        if cfg.dp > 1:
            self.mesh = self._make_dp_mesh(cfg)
            obs = self._place_obs(obs)
            self.obs = obs
        self.obs0 = obs[0]  # (1, 3, nx, ny)

        if cfg.model == "basis_ode":
            self.model = BasisODE(cfg.n_coeffs, self.nx, self.ny)
        elif cfg.model == "basis_ode2":
            self.model = BasisODE2(cfg.n_coeffs, self.nx, self.ny)
        elif cfg.model == "basis_gru":
            self.model = BasisGRU(cfg.n_coeffs, self.nx, self.ny)
        elif cfg.model == "basis_ode_conv":
            self.model = BasisODEConv(cfg.n_coeffs, self.nx, self.ny)
        elif cfg.model in FNO_FAMILIES:
            if not 1 <= cfg.fno_rollout_steps < self.nt:
                raise ValueError(
                    f"fno_rollout_steps must be in [1, n_frames={self.nt}); "
                    f"got {cfg.fno_rollout_steps} (a k >= n_frames leaves no "
                    "training windows and the loss is identically 0)")
            if cfg.input_noise < 0:
                raise ValueError(
                    f"input_noise must be >= 0; got {cfg.input_noise}")
            if cfg.model in ("fno3d", "fno3d_w", "fno3d_a"):
                from ns_tpu.models.fno3d import FNO3D
                channels = 4 if cfg.model == "fno3d" else 3
                self.model = FNO3D(self.nx, self.ny, self.nz,
                                   width=cfg.fno_width,
                                   modes=cfg.fno_modes, channels=channels,
                                   transform=cfg.fno_transform,
                                   precision=cfg.fno_precision)
            elif cfg.model == "fno_psi":
                # uvp-contract family with a divergence-free velocity
                # head: trains on (u,v,p) directly, the increment is an
                # exact curl (models/streamfunction.py)
                from ns_tpu.models.streamfunction import FNOPsi
                self.model = FNOPsi(self.nx, self.ny, width=cfg.fno_width,
                                    modes=cfg.fno_modes,
                                    transform=cfg.fno_transform,
                                    precision=cfg.fno_precision)
            else:
                channels = 1 if cfg.model == "fno_w" else 3
                self.model = FNO2D(self.nx, self.ny, width=cfg.fno_width,
                                   modes=cfg.fno_modes, channels=channels,
                                   transform=cfg.fno_transform,
                                   precision=cfg.fno_precision)
            if cfg.model == "fno_w":
                # vorticity-space surrogate: train on the scalar w derived
                # exactly from (u, v); (u, v, p) recovered exactly at eval
                # (models/vorticity.py — periodic data only)
                from ns_tpu.models.vorticity import vorticity_from_uv
                # jitted: the spectral curl must not dispatch its complex
                # ops eagerly over the TPU tunnel (utils/host.py hazards);
                # leading (nt, M) dims broadcast through the transforms
                self.w_frames = jax.jit(
                    lambda a, b: vorticity_from_uv(a, b))(
                        self.obs[:, :, 0],
                        self.obs[:, :, 1])[:, :, None]  # (nt, M, 1, nx, ny)
            elif cfg.model in ("fno3d_w", "fno3d_a"):
                # 3D divergence-free representations: omega = curl(u)
                # (fno3d_w, Biot-Savart recovery) or the Coulomb-gauge
                # vector potential A (fno3d_a, curl recovery) derived
                # exactly; (u,v,w,p) recovered at eval — every prediction
                # exactly divergence-free (models/vorticity3d.py)
                from ns_tpu.models.vorticity3d import repr3d_fns
                to_repr, _ = repr3d_fns(cfg.model)
                self.w_frames = jax.jit(to_repr)(
                    self.obs[:, :, :3])        # (nt, M, 3, nx, ny, nz)
            # noise std is relative to the data scale so one input_noise
            # value transfers across resolutions/field spaces
            self._data_scale = float(jnp.std(
                self.w_frames if cfg.model in W_FAMILIES else self.obs))
        else:
            self.model = FullFieldGRU(3 * self.nx * self.ny, cfg.hidden_dim)

        key = jax.random.PRNGKey(cfg.seed)
        self.params = self.model.init(key)
        # independent stream for train-time input noise (model init above
        # consumes `key` itself, so fold rather than split to keep params
        # bitwise-identical to pre-noise checkpoints)
        self._noise_key = jax.random.fold_in(key, 0x6E5E)
        self.tx = make_optimizer(cfg)
        self.opt_state = self.tx.init(self.params)
        self.losses: list = []
        self.penalties: list = []
        self.start_iter = 1

        if cfg.resume:
            state = {"params": self.params, "opt_state": self.opt_state}
            state = load_checkpoint(cfg.resume, state)
            self.params = state["params"]
            self.opt_state = state["opt_state"]
            from ns_tpu.train.checkpoint import load_meta
            meta = load_meta(cfg.resume)
            self.losses = list(meta.get("losses", []))
            self.penalties = list(meta.get("penalties", []))
            self.start_iter = int(meta.get("iter", 0)) + 1
            if meta.get("noise_key") is not None:
                # restore the advanced noise stream — re-deriving from the
                # seed would replay the exact perturbations the run before
                # the checkpoint already consumed
                self._noise_key = jnp.asarray(meta["noise_key"],
                                              jnp.uint32)

        if self.mesh is not None:
            # replicate the learnable state across the data mesh (grads
            # come out of jit all-reduced because the loss is a global
            # reduction over the sharded batch)
            self.params = self._replicate(self.params)
            self.opt_state = self._replicate(self.opt_state)

        self._chunk_cache: dict = {}

    # -- data parallelism ---------------------------------------------------

    @staticmethod
    def _make_dp_mesh(cfg: TrainConfig):
        """{'data': dp} mesh. obs stays replicated; build_forward lays the
        objective's BATCH axis over it with a sharding constraint (fno:
        next-step training windows, rnn: trajectories) — GSPMD pads, so no
        divisibility requirement on n_frames or M."""
        from ns_tpu.parallel.mesh import make_mesh
        if cfg.model not in FNO_FAMILIES + ("rnn",):
            raise ValueError(
                f"dp={cfg.dp} needs a batched objective (fno/fno_w/fno3d "
                f"shard training windows, rnn shards trajectories); "
                f"{cfg.model!r} learns one coefficient trajectory with no "
                "batch axis (reference semantics)")
        ndev = len(jax.devices())
        if cfg.dp > ndev:
            raise ValueError(f"dp={cfg.dp} > {ndev} available devices")
        return make_mesh({"data": cfg.dp}, devices=jax.devices()[:cfg.dp])

    def _place_obs(self, obs):
        """Replicate obs across the data mesh (the sharded quantity is the
        derived window batch, not the frame stack). Multi-controller runs
        build the global replicated array from every process's host copy;
        single-process is a plain device_put."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        sharding = NamedSharding(self.mesh, P())
        if jax.process_count() > 1:
            host = np.asarray(obs)
            return jax.make_array_from_callback(
                host.shape, sharding, lambda idx: host[idx])
        return jax.device_put(obs, sharding)

    def _replicate(self, tree):
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(self.mesh, P())
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), tree)

    # -- loss ---------------------------------------------------------------

    def _make_train_step(self):
        fwd = build_forward(self.cfg, self.model, self.obs,
                            getattr(self, "w_frames", None),
                            getattr(self, "_data_scale", 1.0),
                            mesh=self.mesh)

        def loss_fn(params, key, frames):
            pred, target = fwd(params, key, frames)
            return l2_loss(pred, target)

        def step(params, opt_state, key, frames):
            loss, grads = jax.value_and_grad(loss_fn)(params, key, frames)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    @property
    def _train_frames(self):
        """The training tensor the jitted chunk receives at RUNTIME (the
        derived w-frames for the w families, obs otherwise) — an argument,
        never a traced closure: closure-captured device arrays embed into
        the lowered HLO as literals, which at 3D scale overflows the axon
        remote-compile request (build_forward docstring)."""
        if self.cfg.model in W_FAMILIES:
            return self.w_frames
        return self.obs

    def _train_chunk(self, n: int):
        """n train steps fused into ONE dispatch (lax.scan over the step) —
        the per-call tunnel latency and per-iter host sync otherwise
        dominate small-model training (measured 4.3x at the reference
        workload). Cached per chunk length."""
        if n not in self._chunk_cache:
            raw = self._make_train_step()

            @jax.jit
            def chunk(params, opt_state, key, frames):
                def body(carry, _):
                    params, opt_state, key = carry
                    key, sub = jax.random.split(key)
                    params, opt_state, loss = raw(params, opt_state, sub,
                                                  frames)
                    return (params, opt_state, key), loss

                (params, opt_state, key), losses = jax.lax.scan(
                    body, (params, opt_state, key), None, length=n)
                return params, opt_state, key, losses

            self._chunk_cache[n] = chunk
        return self._chunk_cache[n]

    # -- loop ---------------------------------------------------------------

    def train(self, log_every: int = 50, progress: bool = True):
        cfg = self.cfg
        os.makedirs(cfg.out_dir, exist_ok=True)
        from ns_tpu.utils.jsonl import JSONLLogger
        loss_meter = AverageMeter()
        t0 = time.perf_counter()
        # multi-controller: every process trains the identical replicated
        # state; only the coordinator owns the canonical metrics stream
        mname = ("metrics.jsonl" if jax.process_index() == 0
                 else f"metrics.proc{jax.process_index():04d}.jsonl")
        with JSONLLogger(os.path.join(cfg.out_dir, mname)) as jlog:
            it = self.start_iter - 1  # completed iterations
            while it < cfg.n_iters:
                n = min(cfg.ckpt_every - it % cfg.ckpt_every, cfg.n_iters - it)
                step_chunk = self._train_chunk(n)
                self.params, self.opt_state, self._noise_key, losses = (
                    step_chunk(self.params, self.opt_state, self._noise_key,
                               self._train_frames))
                # one bulk device->host transfer (per-scalar reads cost a
                # full tunnel round trip each); to_host because the fno
                # fft engine puts complex ops in the train executable
                from ns_tpu.utils.host import to_host
                vals = [float(x) for x in to_host(losses)]
                for v in vals:
                    loss_meter.update(v)
                self.losses.extend(vals)
                it += n
                if hasattr(self.model, "diversity_penalty"):
                    # logged, not optimized; the logged quantity is the
                    # penalty itself, 1/sum||W_i - W_j||, matching the
                    # reference (spectral_ode.py:184-186); sampled once per
                    # chunk to avoid per-iter host syncs
                    pen = float(self.model.diversity_penalty(self.params))
                    self.penalties.extend([pen] * n)
                if it % cfg.ckpt_every == 0 or it == cfg.n_iters:
                    self.save(it)
                    jlog.log({"loss": vals[-1], "loss_avg": loss_meter.avg},
                             iter=it)
                if progress and (it % log_every < n or it == cfg.n_iters):
                    rate = (it - self.start_iter + 1) / (time.perf_counter() - t0)
                    print(f"[{it}/{cfg.n_iters}] loss {loss_meter.avg:.4f} "
                          f"({rate:.1f} it/s)", flush=True)
        return self.losses

    def save(self, it: int, is_best: bool = False):
        from ns_tpu.utils.host import to_host
        if jax.process_count() > 1 and jax.process_index() != 0:
            # multi-controller DP: params/opt_state are replicated, so the
            # coordinator's copy is the whole state — one writer, no races
            # on shared filesystems
            return None
        state = {"params": self.params, "opt_state": self.opt_state}
        meta = {"iter": it, "losses": self.losses,
                "penalties": self.penalties,
                # lets serve/ rebuild the model ([nx, ny] or [nx, ny, nz])
                "grid": ([self.nx, self.ny] if self.nz is None
                         else [self.nx, self.ny, self.nz]),
                # the advanced input-noise stream, so resume continues it
                # (to_host: the chunk executable may contain complex ops)
                "noise_key": [int(x) for x in
                              to_host(self._noise_key).ravel()],
                "config": dataclasses.asdict(self.cfg)}
        return save_checkpoint(state, self.cfg.out_dir, is_best=is_best,
                               meta=meta)

    # -- eval ---------------------------------------------------------------

    def extrapolate(self, npz_path: Optional[str] = None) -> np.ndarray:
        """Full-horizon rollout -> (nt, 3, nx, ny), written to
        extrapolation.npy by the CLI (ref spectral_ode.py:208-224,
        rnn.py:116-134).

        Alignment: out[t] corresponds to obs[t]. The ODE/basis families
        return the solve from t=0 (initial state included); the fno
        families emit the exact initial frame followed by nt-1
        autoregressive steps. The rnn family keeps the reference's own
        convention (nt predictions from obs[0], i.e. out[t] ~ obs[t+1])
        for parity with rnn.py:116-134."""
        obs_full = load_obs(npz_path or self.cfg.npz_path, None)
        nt_full = obs_full.shape[0]
        # the fno paths run as ONE jitted program with a to_host readback:
        # their executables contain complex (spectral) ops, which the axon
        # TPU tunnel can neither dispatch eagerly nor read back directly
        # (utils/host.py)
        from ns_tpu.utils.host import to_host
        if self.cfg.model == "fno_w":
            from ns_tpu.models.vorticity import (uvp_from_w,
                                                 vorticity_from_uv)
            post = rollout_post(self.cfg)

            @jax.jit
            def run_w(params, uv0):
                w0 = vorticity_from_uv(uv0[0], uv0[1])[None]  # (1, nx, ny)
                # frame-aligned output (out[t] ~ obs[t], like the ODE
                # families whose solve includes the initial state): frame
                # 0 is the exact initial condition, then nt-1 rollout steps
                w_seq = self.model.rollout(params, w0, nt_full - 1,
                                           post=post)
                w_seq = jnp.concatenate([w0[None], w_seq], axis=0)
                u, v, p = jax.vmap(uvp_from_w)(w_seq[:, 0])
                return jnp.stack([u, v, p], axis=1)

            return to_host(run_w(self.params, obs_full[0, 0]))
        if self.cfg.model in ("fno3d_w", "fno3d_a"):
            from ns_tpu.models.vorticity3d import repr3d_fns
            to_repr, to_uvwp = repr3d_fns(self.cfg.model)
            post = rollout_post(self.cfg)

            @jax.jit
            def run_w3(params, uvw0):
                r0 = to_repr(uvw0)                     # (3, nx, ny, nz)
                r_seq = self.model.rollout(params, r0, nt_full - 1,
                                           post=post)
                r_seq = jnp.concatenate([r0[None], r_seq], axis=0)
                # exact (u,v,w,p) recovery per frame: divergence-free by
                # construction, pressure diagnostic
                return jax.vmap(to_uvwp)(r_seq)

            return to_host(run_w3(self.params, obs_full[0, 0, :3]))
        if self.cfg.model in ("fno", "fno_psi", "fno3d"):
            post = rollout_post(self.cfg)

            @jax.jit
            def run_uvp(params, obs0):
                pred = self.model.rollout(params, obs0[0, 0],
                                          nt_full - 1, post=post)
                return jnp.concatenate([obs0[:1, 0], pred], axis=0)

            return to_host(run_uvp(self.params, obs_full[:1]))
        if self.cfg.model == "rnn":
            obs0 = obs_full[0, :1].reshape(1, -1)  # trajectory 0
            pred = self.model.extrapolate(self.params, obs0, nt_full)
            out = np.asarray(pred[0]).reshape(nt_full, 3, self.nx, self.ny)
        else:
            pred = self.model.apply(self.params, obs_full[0], nt_full)
            out = np.asarray(pred[:, 0])
        return out
