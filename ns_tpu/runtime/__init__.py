from ns_tpu.runtime.engine import RolloutEngine, export_rollout, load_rollout_artifact
