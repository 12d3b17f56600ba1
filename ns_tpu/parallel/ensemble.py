"""Ensemble (data-parallel) sharding of solver rollouts.

The north-star scale-out config is "batch-64 ensembles @1024^2 sharded over
a v4-32 mesh" (BASELINE.json). The spectral step is batch-polymorphic
(FFTs act on the trailing two axes; spectral constants broadcast), so
ensembles shard with a single NamedSharding constraint on the leading batch
axis — GSPMD splits the batch across the 'ensemble' mesh axis with zero
collectives in the hot loop (each trajectory is independent; ICI is only
touched by diagnostics reductions).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ns_tpu.solvers import spectral_periodic as sp

Array = jnp.ndarray


def ensemble_init(cfg: sp.SpectralPeriodicConfig, w0_batch: Array,
                  mesh: Mesh, axis: str = "ensemble"):
    """(B, nx, ny) physical vorticity batch -> sharded scan carry.

    Delegates to carry_from_vorticity, which builds the right carry for
    EVERY engine (fft / matmul / compact / real_gemm) and is
    batch-polymorphic; rollout_final then dispatches on the same flags."""
    sharding = NamedSharding(mesh, P(axis, None, None))
    w0_batch = jax.device_put(jnp.asarray(w0_batch, cfg.real_dtype), sharding)
    return jax.jit(partial(sp.carry_from_vorticity, cfg))(w0_batch)


def ensemble_rollout_final(cfg: sp.SpectralPeriodicConfig, carry):
    """Batched nt-step rollout returning the final carry; the batch axis
    stays sharded end-to-end."""
    roll = jax.jit(partial(sp.rollout_final, cfg))
    return roll(carry)


def ensemble_energy(cfg: sp.SpectralPeriodicConfig, w_spec_batch: Array):
    """Mean kinetic energy across the ensemble — one psum-style reduction
    over the sharded batch (XLA inserts the collective). Accepts ANY
    engine's carry spectrum (padded rfft2 / compact / real_gemm): the
    carry is first mapped to physical vorticity, then to the padded
    spectrum the velocity recovery expects."""
    ops = sp.make_ops(cfg)

    w = jnp.asarray(sp.hermitian_weights(cfg.ny), cfg.real_dtype)

    @jax.jit
    def energy(w_spec):
        if cfg.compact_spectrum or cfg.real_gemm:
            w_hat = jnp.fft.rfft2(sp.physical_from_carry(cfg, w_spec))
        else:
            w_hat = w_spec  # padded engines: the carry IS the spectrum
        u_hat, v_hat = sp.velocity_from_vorticity_hat(w_hat, ops)
        per = jnp.sum((jnp.abs(u_hat) ** 2 + jnp.abs(v_hat) ** 2) * w,
                      axis=(-2, -1))
        return 0.5 * jnp.mean(per) / (cfg.nx * cfg.ny) ** 2

    return energy(w_spec_batch)


def ensemble_fd_rollout(step_fn, state0_batch, nt: int, mesh: Mesh,
                        axis: str = "ensemble"):
    """Run a BATCH of independent FD solver rollouts in lockstep, sharded
    over the ensemble mesh axis.

    `step_fn` is any single-state pure step (e.g.
    solvers.chorin_fd.make_step(...) — the FD steps are vmappable:
    stencils, BC edge writes, and the dst/multigrid/redblack pressure
    solves are all batch-polymorphic under vmap). `state0_batch` is a
    FlowState whose leaves carry a leading ensemble axis. Zero collectives
    in the hot loop (members are independent); returns the final batched
    FlowState."""
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        return jax.device_put(x, sharding) if x is not None else None

    state0 = jax.tree_util.tree_map(put, state0_batch)
    vstep = jax.vmap(step_fn)

    @jax.jit
    def roll(s):
        def body(s, _):
            return vstep(s), None
        s, _ = jax.lax.scan(body, s, None, length=nt)
        return s

    return roll(state0)
