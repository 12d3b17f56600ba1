from ns_tpu.ops.pallas.poisson_kernels import (
    jacobi_fused_pallas,
    sor_redblack_fused_pallas,
    sor_redblack_tiled_pallas,
    sor_redblack_tiled_any,
    sor_redblack_packed_tiled_pallas,
    pack_redblack,
    unpack_redblack,
    vmem_fits,
)
