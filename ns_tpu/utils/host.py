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


def to_host(tree):
    """Materialize a pytree of device arrays as numpy, robust to the axon
    complex-executable readback limitation. Complex arrays are split into
    real/imag (real-typed programs), transferred, and recombined."""

    def one(x):
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.complexfloating):
            re = np.asarray(_copy_real(x.real))
            im = np.asarray(_copy_real(x.imag))
            return re + 1j * im
        return np.asarray(_copy_real(x))

    return jax.tree_util.tree_map(one, tree)
