from ns_tpu.train.metrics import AverageMeter, mean_squared_error
from ns_tpu.train.checkpoint import save_checkpoint, load_checkpoint
from ns_tpu.train.trainer import TrainConfig, Trainer
