from ns_tpu.core.bc import BC, dirichlet, neumann, apply_bcs
from ns_tpu.core.state import FlowState
