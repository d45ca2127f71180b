"""Utilities: metrics, meters, schedules, IO helpers."""

from semseg_tpu.utils.metrics import (
    AverageMeter,
    intersection_and_union,
    intersection_and_union_jax,
)
from semseg_tpu.utils.misc import (
    check_makedirs,
    colorize,
    poly_learning_rate,
    step_learning_rate,
)

__all__ = [
    "AverageMeter",
    "intersection_and_union",
    "intersection_and_union_jax",
    "check_makedirs",
    "colorize",
    "poly_learning_rate",
    "step_learning_rate",
]
