"""Ensemble-of-surrogates training: N independently-seeded models trained
in one vmapped+jitted step.

TPU-native capability beyond the reference's single-model drivers: the
model dimension rides the batch axis of every matmul (MXU-friendly), and on
a mesh the ensemble axis shards data-parallel — training 8 surrogates costs
roughly one surrogate's wall clock on 8 chips.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.train.metrics import l2_loss


def init_ensemble(model, n_models: int, seed: int = 0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_models)
    return jax.vmap(model.init)(keys)


def raw_ensemble_step(model, tx, obs, nt: int, forward=None):
    """The unjitted vmapped N-model train step — the single definition
    shared by make_ensemble_train_step and EnsembleTrainer's scan chunks.

    forward(params, key, frames) -> (pred, target) overrides the default
    basis-family objective (trainer.build_forward supplies the fno
    variants). `step` accepts the training tensor as an optional runtime
    argument (trainer.build_forward docstring: a closure-captured tensor
    embeds into the lowered HLO; at 3D scale that overflows the axon
    remote-compile request); frames=None uses the build-time obs."""
    obs0 = obs[0]

    def one_loss(params, frames):
        if forward is not None:
            pred, target = forward(params, None, frames)
            return l2_loss(pred, target)
        pred = model.apply(params, obs0, nt)
        return l2_loss(pred, obs)

    def step(params, opt_state, frames=None):
        losses, grads = jax.vmap(jax.value_and_grad(one_loss),
                                 in_axes=(0, None))(params, frames)
        updates, opt_state = jax.vmap(tx.update)(grads, opt_state)
        params = jax.vmap(optax.apply_updates)(params, updates)
        return params, opt_state, losses

    return step


def make_ensemble_train_step(model, tx, obs, nt: int,
                             mesh: Optional[Mesh] = None,
                             axis: str = "ensemble"):
    """obs (nt, 1, 3, nx, ny) is shared; params/opt_state carry a leading
    n_models axis. Returns (jitted step, shard(params_tree) helper)."""
    step = raw_ensemble_step(model, tx, obs, nt)

    if mesh is None:
        return jax.jit(step), lambda tree: tree

    sharding = NamedSharding(mesh, P(axis))

    def shard_tree(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
            tree)

    return jax.jit(step), shard_tree


def train_ensemble(model, obs, nt: int, n_models: int, n_iters: int,
                   lr: float = 1e-3, seed: int = 0,
                   mesh: Optional[Mesh] = None):
    """Returns (final params with leading n_models axis, per-model loss
    history (n_iters, n_models))."""
    tx = optax.adam(lr)
    params = init_ensemble(model, n_models, seed)
    opt_state = jax.vmap(tx.init)(params)
    step, shard_tree = make_ensemble_train_step(model, tx, obs, nt, mesh)
    params = shard_tree(params)
    opt_state = shard_tree(opt_state)
    history = []
    for _ in range(n_iters):
        params, opt_state, losses = step(params, opt_state)
        history.append(losses)
    return params, jnp.stack(history)


# ---------------------------------------------------------------------------
# Product surface: ensemble trainer (CLI-reachable via train.py --n-models)
# ---------------------------------------------------------------------------

ENSEMBLE_MODELS = ("basis_ode", "basis_ode2", "basis_gru", "basis_ode_conv",
                   "fno", "fno_w", "fno_psi", "fno3d", "fno3d_w",
                   "fno3d_a")


def ensemble_mesh(n_models: int) -> Optional[Mesh]:
    """Largest usable 'ensemble' mesh: k devices with k | n_models (None if
    only one device is usable)."""
    import jax as _jax
    from ns_tpu.parallel.mesh import make_mesh
    k = min(n_models, len(_jax.devices()))
    while k > 1 and n_models % k:
        k -= 1
    if k <= 1:
        return None
    return make_mesh({"ensemble": k}, devices=_jax.devices()[:k])


class EnsembleTrainer:
    """Train N independently-seeded surrogates of one family in lockstep:
    the model axis is vmapped through the jitted train step and (optionally)
    sharded data-parallel over an 'ensemble' mesh axis. Mirrors
    ns_tpu.train.trainer.Trainer's protocol (chunked dispatch, checkpoint
    every ckpt_every with resume, loss history) for the basis AND fno
    families (objective shared via trainer.build_forward) — the
    reference's diversity-ensemble context (spectral_ode.py:90-97)
    generalized from 1 seed to N.
    """

    def __init__(self, cfg, n_models: int, mesh: Optional[Mesh] = "auto"):
        from ns_tpu.models.basis import (BasisGRU, BasisODE, BasisODE2,
                                         BasisODEConv)
        from ns_tpu.train.trainer import load_obs, make_optimizer
        if cfg.model not in ENSEMBLE_MODELS:
            raise ValueError(f"ensemble training supports {ENSEMBLE_MODELS}, "
                             f"got {cfg.model!r}")
        if getattr(cfg, "batch_size", 0):
            # the vmapped ensemble objective is keyless (full-batch by
            # construction); window sampling needs the single-model
            # Trainer's PRNG-threaded step
            raise ValueError("batch_size (minibatch sampling) requires "
                             "the single-model Trainer (--n-models 1)")
        if n_models < 2:
            raise ValueError("n_models must be >= 2 for ensemble training")
        if getattr(cfg, "input_noise", 0.0):
            raise ValueError(
                "input_noise is not supported for ensemble training (the "
                "vmapped step does not thread per-model noise keys); train "
                "single models with noise, or drop the flag")
        self.cfg, self.n_models = cfg, n_models
        obs = load_obs(cfg.npz_path, cfg.n_frames)
        self.obs = obs
        self.nt, n_traj = obs.shape[0], obs.shape[1]
        spatial = obs.shape[3:]
        self.nx, self.ny = spatial[0], spatial[1]
        self.nz = spatial[2] if len(spatial) == 3 else None
        from ns_tpu.train.trainer import FNO_FAMILIES, W_FAMILIES
        wants_3d = cfg.model in ("fno3d", "fno3d_w", "fno3d_a")
        if (self.nz is not None) != wants_3d:
            raise ValueError(
                f"{cfg.model!r} expects "
                f"{'3D (u,v,w,p)' if wants_3d else '2D (u,v,p)'}"
                f" data; {cfg.npz_path} has spatial shape {spatial}")
        if n_traj > 1 and cfg.model not in FNO_FAMILIES:
            raise ValueError(
                f"multi-trajectory data (M={n_traj}) needs an operator "
                f"family {FNO_FAMILIES}; {cfg.model!r} learns a single "
                "coefficient trajectory by design")
        self._forward = None
        if cfg.model in FNO_FAMILIES:
            from ns_tpu.models.fno import FNO2D
            from ns_tpu.train.trainer import build_forward
            if not 1 <= cfg.fno_rollout_steps < self.nt:
                raise ValueError(
                    f"fno_rollout_steps must be in [1, n_frames={self.nt}); "
                    f"got {cfg.fno_rollout_steps}")
            if cfg.model in ("fno3d", "fno3d_w", "fno3d_a"):
                from ns_tpu.models.fno3d import FNO3D
                channels = 4 if cfg.model == "fno3d" else 3
                self.model = FNO3D(self.nx, self.ny, self.nz,
                                   width=cfg.fno_width,
                                   modes=cfg.fno_modes, channels=channels,
                                   transform=cfg.fno_transform,
                                   precision=cfg.fno_precision)
            elif cfg.model == "fno_psi":
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
            self.w_frames = None
            if cfg.model == "fno_w":
                from ns_tpu.models.vorticity import vorticity_from_uv
                # jitted: no eager complex dispatch over the TPU tunnel;
                # leading (nt, M) dims broadcast through the transforms
                self.w_frames = jax.jit(
                    lambda a, b: vorticity_from_uv(a, b))(
                        self.obs[:, :, 0],
                        self.obs[:, :, 1])[:, :, None]  # (nt, M, 1, nx, ny)
            elif cfg.model in ("fno3d_w", "fno3d_a"):
                from ns_tpu.models.vorticity3d import repr3d_fns
                to_repr, _ = repr3d_fns(cfg.model)
                self.w_frames = jax.jit(to_repr)(
                    self.obs[:, :, :3])        # (nt, M, 3, nx, ny, nz)
            self._forward = build_forward(cfg, self.model, self.obs,
                                          self.w_frames)
        else:
            cls = {"basis_ode": BasisODE, "basis_ode2": BasisODE2,
                   "basis_gru": BasisGRU,
                   "basis_ode_conv": BasisODEConv}[cfg.model]
            self.model = cls(cfg.n_coeffs, self.nx, self.ny)
        self.mesh = ensemble_mesh(n_models) if mesh == "auto" else mesh
        self.tx = make_optimizer(cfg)
        self.params = init_ensemble(self.model, n_models, cfg.seed)
        self.opt_state = jax.vmap(self.tx.init)(self.params)
        self.losses: list = []   # one list of per-model loss vectors
        self.start_iter = 1
        if cfg.resume:
            from ns_tpu.train.checkpoint import load_checkpoint, load_meta
            state = {"params": self.params, "opt_state": self.opt_state}
            state = load_checkpoint(cfg.resume, state)
            self.params = state["params"]
            self.opt_state = state["opt_state"]
            meta = load_meta(cfg.resume)
            self.losses = [list(map(float, row))
                           for row in meta.get("losses", [])]
            self.start_iter = int(meta.get("iter", 0)) + 1
        if self.mesh is not None:
            spec = lambda x: NamedSharding(
                self.mesh, P("ensemble", *([None] * (x.ndim - 1))))
            put = lambda x: jax.device_put(x, spec(x))
            self.params = jax.tree_util.tree_map(put, self.params)
            self.opt_state = jax.tree_util.tree_map(put, self.opt_state)
        self._chunk_cache: dict = {}

    def _train_chunk(self, n: int):
        if n not in self._chunk_cache:
            raw = raw_ensemble_step(self.model, self.tx, self.obs, self.nt,
                                    forward=self._forward)

            @jax.jit
            def chunk(params, opt_state, frames):
                def body(carry, _):
                    params, opt_state = carry
                    params, opt_state, losses = raw(params, opt_state,
                                                    frames)
                    return (params, opt_state), losses

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), None, length=n)
                return params, opt_state, losses

            self._chunk_cache[n] = chunk
        return self._chunk_cache[n]

    def train(self, progress: bool = True):
        import os
        import numpy as _np
        cfg = self.cfg
        os.makedirs(cfg.out_dir, exist_ok=True)
        it = self.start_iter - 1
        while it < cfg.n_iters:
            n = min(cfg.ckpt_every - it % cfg.ckpt_every, cfg.n_iters - it)
            chunk = self._train_chunk(n)
            from ns_tpu.train.trainer import W_FAMILIES
            frames = (self.w_frames if self.cfg.model in W_FAMILIES
                      else self.obs)  # w_frames set by the FNO init branch
            self.params, self.opt_state, losses = chunk(
                self.params, self.opt_state, frames)
            # to_host: the fno train executable contains complex ops whose
            # outputs cannot be read back directly over the axon tunnel
            from ns_tpu.utils.host import to_host
            rows = to_host(losses)                 # (n, n_models)
            self.losses.extend([list(map(float, r)) for r in rows])
            it += n
            if it % cfg.ckpt_every == 0 or it == cfg.n_iters:
                self.save(it)
            if progress:
                print(f"[{it}/{cfg.n_iters}] mean loss "
                      f"{rows[-1].mean():.4f}", flush=True)
        return self.losses

    def save(self, it: int):
        import dataclasses as _dc
        from ns_tpu.train.checkpoint import save_checkpoint
        state = {"params": self.params, "opt_state": self.opt_state}
        meta = {"iter": it, "losses": self.losses,
                # lets serve/ rebuild the model ([nx, ny] or [nx, ny, nz])
                "grid": ([self.nx, self.ny] if self.nz is None
                         else [self.nx, self.ny, self.nz]),
                "n_models": self.n_models, "config": _dc.asdict(self.cfg)}
        return save_checkpoint(state, self.cfg.out_dir, meta=meta)

    def extrapolate(self, npz_path: Optional[str] = None):
        """(n_models, nt_full, 3, nx, ny) full-horizon rollouts — closed
        loop from frame 0 only, frame-aligned like Trainer.extrapolate
        (out[:, t] ~ obs[t]). Reduce over axis 0 for the ensemble mean /
        spread."""
        import numpy as _np
        from ns_tpu.train.trainer import load_obs
        from ns_tpu.utils.host import to_host
        obs_full = load_obs(npz_path or self.cfg.npz_path, None)
        nt_full = obs_full.shape[0]

        # fno readbacks go through to_host and derive w INSIDE the jitted
        # program: complex (spectral) ops must neither dispatch eagerly
        # nor have their executables' outputs np.asarray'd on the axon
        # tunnel (utils/host.py)
        if self.cfg.model == "fno_w":
            from ns_tpu.models.vorticity import (uvp_from_w,
                                                 vorticity_from_uv)
            from ns_tpu.train.trainer import rollout_post
            post = rollout_post(self.cfg)

            @jax.jit
            def roll_w(params, uv0):
                w0 = vorticity_from_uv(uv0[0], uv0[1])[None]  # (1, nx, ny)

                def one(p):
                    w_seq = self.model.rollout(p, w0, nt_full - 1, post=post)
                    w_seq = jnp.concatenate([w0[None], w_seq], axis=0)
                    u, v, pr = jax.vmap(uvp_from_w)(w_seq[:, 0])
                    return jnp.stack([u, v, pr], axis=1)

                return jax.vmap(one)(params)

            return to_host(roll_w(self.params, obs_full[0, 0]))

        if self.cfg.model in ("fno3d_w", "fno3d_a"):
            from ns_tpu.models.vorticity3d import repr3d_fns
            from ns_tpu.train.trainer import rollout_post
            to_repr, to_uvwp = repr3d_fns(self.cfg.model)
            post = rollout_post(self.cfg)

            @jax.jit
            def roll_w3(params, uvw0):
                r0 = to_repr(uvw0)                     # (3, nx, ny, nz)

                def one(p):
                    r_seq = self.model.rollout(p, r0, nt_full - 1,
                                               post=post)
                    r_seq = jnp.concatenate([r0[None], r_seq], axis=0)
                    return jax.vmap(to_uvwp)(r_seq)

                return jax.vmap(one)(params)

            return to_host(roll_w3(self.params, obs_full[0, 0, :3]))

        if self.cfg.model in ("fno", "fno_psi", "fno3d"):
            from ns_tpu.train.trainer import rollout_post
            post = rollout_post(self.cfg)

            @jax.jit
            def roll_uvp(params):
                def one(p):
                    pred = self.model.rollout(p, obs_full[0, 0],
                                              nt_full - 1, post=post)
                    return jnp.concatenate([obs_full[:1, 0], pred], axis=0)

                return jax.vmap(one)(params)

            return to_host(roll_uvp(self.params))

        @jax.jit
        def roll(params):
            return jax.vmap(
                lambda p: self.model.apply(p, obs_full[0], nt_full))(params)

        return _np.asarray(roll(self.params)[:, :, 0])
