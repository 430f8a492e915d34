from .lr_schedule import polynomial_decay_schedule
from .train_state import TrainState, ema_update, init_train_state, make_optimizer
from .train_step import TaskBatch, make_train_step, multitask_loss, task_loss

__all__ = [
    "polynomial_decay_schedule", "TrainState", "ema_update", "init_train_state",
    "make_optimizer", "TaskBatch", "make_train_step", "multitask_loss", "task_loss",
]
from .checkpoint import (
    CheckpointManager, export_pt, import_pt, load_checkpoint, save_checkpoint,
    wait_for_saves,
)
from .trainer import EarlyStopper, train_loop
from .metrics import MetricsLogger, SmoothedMeter, named_scope, profile_trace
