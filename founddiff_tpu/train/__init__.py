from founddiff_tpu.train.ema import EmaState, ema_decay_schedule, ema_update
from founddiff_tpu.train.state import TrainState, make_optimizer
from founddiff_tpu.train.trainer import Trainer

__all__ = [
    "EmaState",
    "TrainState",
    "Trainer",
    "ema_decay_schedule",
    "ema_update",
    "make_optimizer",
]
