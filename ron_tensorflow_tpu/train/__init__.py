"""Training: optimizers, schedules, train state/step, checkpointing."""

from .optimizer import OptimizerConfig, make_learning_rate_schedule, make_optimizer
from .state import TrainState, create_train_state, make_eval_step, make_train_step
from .tf_checkpoint import TFCheckpointReader

__all__ = [
    "OptimizerConfig",
    "make_learning_rate_schedule",
    "make_optimizer",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "TFCheckpointReader",
]
