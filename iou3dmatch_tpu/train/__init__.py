"""Training: jitted pretrain/SSL steps, EMA teacher, schedules, checkpoints."""
from .schedules import get_lr, get_bn_momentum
from .state import TrainState, create_train_state
from .steps import make_pretrain_step, make_ssl_step, make_eval_forward, ema_update
from . import checkpoint

__all__ = [
    "get_lr",
    "get_bn_momentum",
    "TrainState",
    "create_train_state",
    "make_pretrain_step",
    "make_ssl_step",
    "make_eval_forward",
    "ema_update",
    "checkpoint",
]
