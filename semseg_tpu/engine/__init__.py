"""Training and evaluation engine."""

from semseg_tpu.engine.losses import cross_entropy_mean, cross_entropy_sum
from semseg_tpu.engine.optim import (
    SGDState,
    make_lr_mult,
    poly_lr,
    sgd_init,
    sgd_update,
)
from semseg_tpu.engine.trainer import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

__all__ = [
    "cross_entropy_mean",
    "cross_entropy_sum",
    "SGDState",
    "make_lr_mult",
    "poly_lr",
    "sgd_init",
    "sgd_update",
    "TrainState",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "SlidingWindowEvaluator",
]
