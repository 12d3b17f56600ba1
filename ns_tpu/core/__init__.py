from ns_tpu.core.bc import (BC, DirichletBoundaryCondition,
                            NeumannBoundaryCondition, apply_bcs,
                            dirichlet, neumann)
from ns_tpu.core.state import FlowState
