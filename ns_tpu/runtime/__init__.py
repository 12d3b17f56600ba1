from ns_tpu.runtime.engine import (FDRolloutEngine, Rollout3DEngine,
                                   RolloutEngine, export_fd_rollout,
                                   export_rollout, export_rollout3d,
                                   load_fd_rollout_artifact,
                                   load_rollout_artifact,
                                   load_rollout3d_artifact)

__all__ = ["RolloutEngine", "FDRolloutEngine", "Rollout3DEngine",
           "export_rollout", "export_fd_rollout", "export_rollout3d",
           "load_rollout_artifact", "load_fd_rollout_artifact",
           "load_rollout3d_artifact"]
