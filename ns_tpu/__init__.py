"""ns_tpu: TPU-native 2D incompressible Navier-Stokes framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
mhw32/neural-navier-stokes (reference mounted read-only at /root/reference):

- four solver families: direct_fd, chorin_fd (explicit + semi-implicit ADI),
  chorin_spectral (Chebyshev collocation), spectral_periodic (Fourier,
  TPU showcase; new capability mandated by the north-star config)
- declarative boundary-condition spec (reference: src/boundary.py)
- neural surrogates: full-field GRU, learned-basis GRU, learned-basis
  neural-ODE (joint and per-field), with a remat-based O(1)-memory adjoint
  (reference: src/neural_spectral/*)
- one trainer + checkpoint/restore, metrics, npz data interchange
- scale-out: shard_map over jax.sharding.Mesh with halo exchange for FD
  tiles and ensemble/data sharding; Pallas kernels for the hot stencil ops

Design stance: pure-functional `step(state) -> state` solvers compiled with
`jax.jit`, rollouts under `lax.scan`, pressure iterations under
`lax.fori_loop`/`lax.while_loop`; all shapes static; setup-time dense linear
algebra (Chebyshev operators) done in float64 NumPy on host, transferred to
device as constants.
"""

__version__ = "0.1.0"
