"""Device->host export helpers.

The axon TPU transfer layer cannot read back buffers produced by executables
containing complex-typed ops (observed: UNIMPLEMENTED on np.asarray/float()
of FFT-derived arrays, while block_until_ready succeeds). `to_host` launders
such buffers through a fresh real-only jitted copy program, whose outputs
transfer fine, then materializes them as numpy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _copy_real(x):
    return x * jnp.ones((), x.dtype)


def sync(tree):
    """Hard synchronization: force every leaf's producing executable to
    actually finish by reading one element back to the host.

    jax.block_until_ready is NOT sufficient through the axon tunnel: on the
    first post-compile invocation it can return while the remote compile is
    still in flight, so timing loops "warmed" with it alone measure dispatch
    latency instead of real work. Reading any output element requires the
    execution to complete. Returns the tree for chaining."""
    for x in jax.tree_util.tree_leaves(tree):
        if hasattr(x, "dtype"):
            to_host(jnp.ravel(jnp.asarray(x))[:1])
    return tree


@jax.jit
def _copy_tree(xs):
    """One real-only copy program over a whole list of leaves: a single
    dispatch (per-call launch latency through the tunnel is 1-30 ms, so
    per-leaf programs dominate e.g. checkpoint saves of ~100-leaf states).
    Complex leaves split to (re, im) tuples, recombined host-side."""
    out = []
    for x in xs:
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            r = x.real
            out.append((r * jnp.ones((), r.dtype),
                        x.imag * jnp.ones((), r.dtype)))
        else:
            out.append(x * jnp.ones((), x.dtype))
    return out


def to_host(tree):
    """Materialize a pytree of device arrays as numpy, robust to the axon
    complex-executable readback limitation. Complex arrays are split into
    real/imag (real-typed programs), transferred, and recombined. All
    device leaves are laundered through ONE jitted copy program (cached by
    tree structure), then transferred."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    # one copy program per device-placement group: a single jitted call
    # cannot mix arguments committed to different devices (e.g. the
    # per-device shards of a global array in parallel/distributed.py)
    groups: dict = {}
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array):
            key = tuple(sorted(d.id for d in x.devices()))
            groups.setdefault(key, []).append(i)
    for dev_idx in groups.values():
        copied = _copy_tree([leaves[i] for i in dev_idx])
        for i, c in zip(dev_idx, copied):
            if isinstance(c, tuple):
                leaves[i] = np.asarray(c[0]) + 1j * np.asarray(c[1])
            else:
                leaves[i] = np.asarray(c)
    leaves = [x if isinstance(x, np.ndarray) else np.asarray(x)
              for x in leaves]
    return jax.tree_util.tree_unflatten(treedef, leaves)
