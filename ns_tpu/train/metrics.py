"""Training metrics and observability helpers.

Parity with the reference's utils (src/utils.py): AverageMeter (:63-78,
also re-defined in every training script — factored once here, SURVEY.md §2
duplication note), mean_squared_error (:90-94), log_normal_pdf (:97-102),
normal_kl (:105-112). Plus the physics observables the north star gates on:
divergence residual and kinetic energy.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class AverageMeter:
    """Running average (ref utils.py:63-78)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


def l2_loss(pred: Array, target: Array) -> Array:
    """Global L2 norm of the residual — torch.norm(pred - target, p=2)
    over all elements, the loss every reference driver uses
    (spectral_ode.py:182, rnn.py:99)."""
    # summed over all axes directly (no ravel): a reshape that merges a
    # mesh-sharded batch axis can force GSPMD to materialize the full
    # residual, while the direct reduction stays per-shard + one scalar
    # all-reduce (the data-parallel Trainer path shards pred/target)
    diff = pred - target
    return jnp.sqrt(jnp.sum(diff * diff))


def mean_squared_error(pred: Array, true: Array) -> Array:
    """Per-sample-mean MSE, averaged over batch (ref utils.py:90-94)."""
    b = pred.shape[0]
    p = pred.reshape(b, -1)
    t = true.reshape(b, -1)
    return jnp.mean(jnp.mean((p - t) ** 2, axis=1))


def log_normal_pdf(x: Array, mean: Array, logvar: Array) -> Array:
    """(ref utils.py:97-102)."""
    const = jnp.log(jnp.asarray(2.0 * np.pi, x.dtype))
    return -0.5 * (const + logvar + (x - mean) ** 2 / jnp.exp(logvar))


def normal_kl(mu1: Array, lv1: Array, mu2: Array, lv2: Array) -> Array:
    """(ref utils.py:105-112)."""
    v1, v2 = jnp.exp(lv1), jnp.exp(lv2)
    lstd1, lstd2 = lv1 / 2.0, lv2 / 2.0
    return lstd2 - lstd1 + (v1 + (mu1 - mu2) ** 2) / (2.0 * v2) - 0.5


def rel_l2(pred, obs) -> float:
    """Global relative L2 error ||pred - obs|| / ||obs|| (host numpy) —
    the evaluation metric of every surrogate study (RESULTS.md,
    tools/head_to_head.py, cli/evaluate.py)."""
    pred = np.asarray(pred)
    obs = np.asarray(obs)
    return float(np.linalg.norm(pred - obs) / np.linalg.norm(obs))


def divergence_residual_fd(u: Array, v: Array, dx: float, dy: float) -> Array:
    """Max |du/dx + dv/dy| on the interior, central differences in the
    reference direct_fd axis convention (x along axis 1)."""
    div = ((u[1:-1, 2:] - u[1:-1, :-2]) / (2 * dx)
           + (v[2:, 1:-1] - v[:-2, 1:-1]) / (2 * dy))
    return jnp.max(jnp.abs(div))


def kinetic_energy(u: Array, v: Array) -> Array:
    return 0.5 * jnp.mean(u * u + v * v)
