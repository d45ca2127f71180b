"""Losses: cross-entropy with ignore-label masking.

Matches ``nn.CrossEntropyLoss(ignore_index=...)`` 'mean' reduction over
non-ignored pixels (reference ``tool/train.py:121``): the per-replica loss
is the local valid-pixel mean; gradients are then ``pmean``-ed across the
data axis, which reproduces DDP's equal-weight replica averaging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_sum(logits, labels, ignore_index=255):
    """(sum of per-pixel NLL over valid pixels, valid count).

    ``logits``: [..., C] float; ``labels``: [...] int.
    """
    valid = (labels != ignore_index).astype(jnp.float32)
    safe_labels = jnp.where(labels == ignore_index, 0, labels)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid), jnp.sum(valid)


def cross_entropy_mean(logits, labels, ignore_index=255):
    """Valid-pixel mean CE (torch 'mean' reduction with ignore_index)."""
    loss_sum, count = cross_entropy_sum(logits, labels, ignore_index)
    return loss_sum / jnp.maximum(count, 1.0)
