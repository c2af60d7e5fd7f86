from .state import TrainState, create_train_state, make_optimizer
from .steps import make_train_step, make_eval_step, METRICS_MULTITASK, METRICS_SINGLE
from .loop import train_model, TrainConfig
from . import checkpoint

__all__ = [
    "TrainState",
    "create_train_state",
    "make_optimizer",
    "make_train_step",
    "make_eval_step",
    "METRICS_MULTITASK",
    "METRICS_SINGLE",
    "train_model",
    "TrainConfig",
    "checkpoint",
]
