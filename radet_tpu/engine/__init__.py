from .checkpoint import CheckpointManager, load_weights, save_weights
from .optim import build_optimizer, frozen_param_mask, onecycle_linear
from .train_step import TrainState, build_infer_step, build_train_step

__all__ = [
    "CheckpointManager",
    "load_weights",
    "save_weights",
    "build_optimizer",
    "frozen_param_mask",
    "onecycle_linear",
    "TrainState",
    "build_infer_step",
    "build_train_step",
]
