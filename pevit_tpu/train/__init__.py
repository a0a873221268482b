from .head import batch_norm, head_forward, init_bn_state, init_head
from .optim import make_optimizer, step_decay_lr
from .partition import combine, count_params, partition
from .sweep import hyperparameter_sweep_lr, run_method
from .trainer import TaskStatic, TrainTask, model_forward, trainable_pred

__all__ = [
    "TaskStatic",
    "TrainTask",
    "batch_norm",
    "combine",
    "count_params",
    "head_forward",
    "hyperparameter_sweep_lr",
    "init_bn_state",
    "init_head",
    "make_optimizer",
    "model_forward",
    "partition",
    "run_method",
    "step_decay_lr",
    "trainable_pred",
]
