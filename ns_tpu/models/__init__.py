from ns_tpu.models.node import odeint, odeint_checkpoint
from ns_tpu.models.basis import BasisODE, BasisODE2, BasisGRU
from ns_tpu.models.gru import FullFieldGRU
