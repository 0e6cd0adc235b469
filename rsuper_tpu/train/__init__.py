from .optim import make_optimizer, warmup_poly_schedule, ema_update
from .state import TrainState, create_train_state
from .step import build_train_step

__all__ = [
    "make_optimizer",
    "warmup_poly_schedule",
    "ema_update",
    "TrainState",
    "create_train_state",
    "build_train_step",
]
