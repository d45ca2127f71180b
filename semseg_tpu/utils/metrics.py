"""Segmentation metrics: per-class intersection / union / target histograms.

mIoU = mean(intersection/union), mAcc = mean(intersection/target),
allAcc = sum(intersection)/sum(target) — identical definitions to the
reference (``util/util.py:40-67``, ``tool/train.py:333-337``). Pixels whose
target is ``ignore_index`` are excluded by overwriting the prediction with
the ignore value before histogramming.

Two implementations: numpy (host-side scoring of saved predictions) and a
jit-safe JAX version (in-step metrics; histograms are later ``psum``-reduced
across the data axis, replacing the reference's ``dist.all_reduce``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Tracks current value, running sum and average."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0
        self.avg = 0
        self.sum = 0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum = self.sum + val * n
        self.count += n
        self.avg = self.sum / self.count


def intersection_and_union(output, target, num_classes, ignore_index=255):
    """Numpy histogram variant. Inputs: integer class maps, any shape."""
    output = np.asarray(output).reshape(-1).copy()
    target = np.asarray(target).reshape(-1)
    if output.shape != target.shape:
        raise ValueError(f"shape mismatch {output.shape} vs {target.shape}")
    output[target == ignore_index] = ignore_index
    intersection = output[output == target]
    bins = np.arange(num_classes + 1)
    area_intersection, _ = np.histogram(intersection, bins=bins)
    area_output, _ = np.histogram(output, bins=bins)
    area_target, _ = np.histogram(target, bins=bins)
    area_union = area_output + area_target - area_intersection
    return area_intersection, area_union, area_target


def intersection_and_union_jax(output, target, num_classes, ignore_index=255):
    """JAX variant, jit-safe (one-hot matmul histograms, no bincount)."""
    output = output.reshape(-1)
    target = target.reshape(-1)
    ignore = target == ignore_index
    output = jnp.where(ignore, ignore_index, output)
    match = output == target

    classes = jnp.arange(num_classes)[None, :]
    out_hot = (output[:, None] == classes).astype(jnp.float32)
    tgt_hot = (target[:, None] == classes).astype(jnp.float32)
    area_intersection = jnp.sum(out_hot * match[:, None].astype(jnp.float32), axis=0)
    area_output = jnp.sum(out_hot, axis=0)
    area_target = jnp.sum(tgt_hot, axis=0)
    area_union = area_output + area_target - area_intersection
    return area_intersection, area_union, area_target


def summarize(intersection_sum, union_sum, target_sum):
    """(mIoU, mAcc, allAcc) from accumulated histograms."""
    iou = intersection_sum / (union_sum + 1e-10)
    acc = intersection_sum / (target_sum + 1e-10)
    m_iou = float(np.mean(iou))
    m_acc = float(np.mean(acc))
    all_acc = float(np.sum(intersection_sum) / (np.sum(target_sum) + 1e-10))
    return m_iou, m_acc, all_acc
