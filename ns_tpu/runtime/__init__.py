from ns_tpu.runtime.engine import (FDRolloutEngine, RolloutEngine,
                                   export_fd_rollout, export_rollout,
                                   load_fd_rollout_artifact,
                                   load_rollout_artifact)

__all__ = ["RolloutEngine", "FDRolloutEngine", "export_rollout",
           "export_fd_rollout", "load_rollout_artifact",
           "load_fd_rollout_artifact"]
