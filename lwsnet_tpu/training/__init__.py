from lwsnet_tpu.training import losses, metrics
from lwsnet_tpu.training.checkpoint import CheckpointManager
from lwsnet_tpu.training.loop import Trainer, TrainerConfig
from lwsnet_tpu.training.state import (TrainState, create_train_state,
                                       make_lr_schedule, make_optimizer,
                                       param_count)
from lwsnet_tpu.training.steps import make_eval_step, make_train_step
