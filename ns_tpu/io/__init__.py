from ns_tpu.io.npz import save_rollout, load_rollout
from ns_tpu.io.coarsen import spatial_coarsen
