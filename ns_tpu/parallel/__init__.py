from ns_tpu.parallel.mesh import make_mesh, MESH_PRESETS
from ns_tpu.parallel.halo import exchange_halo_rows
from ns_tpu.parallel import distributed
