"""Production serving layer: checkpoint -> warm compiled rollout service.

The reference has no deployment story at all — its trained surrogates are
consumed by re-running the training script's eval tail by hand (ref
neural_spectral/spectral_ode.py:208-224 writes extrapolation.npy and
exits). This package is the missing production half: load a checkpoint
directory, rebuild the model from its embedded config, compile the
rollout once, and serve any-horizon extrapolation requests at steady
state from a long-lived process (ns_tpu.cli.serve / serve.server) or
in-process (serve.engine.InferenceEngine).

The classical-solver counterpart lives in ns_tpu.runtime.engine
(AOT-compiled solver rollouts + portable StableHLO export); this package
is the checkpoint-driven surrogate half.
"""

from ns_tpu.serve.client import ServeClient, ServeError
from ns_tpu.serve.engine import InferenceEngine
from ns_tpu.serve.solver import SolverEngine, SolverEngine3D

__all__ = ["InferenceEngine", "SolverEngine", "SolverEngine3D",
           "ServeClient", "ServeError"]
