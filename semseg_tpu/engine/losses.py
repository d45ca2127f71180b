"""Losses: cross-entropy with ignore-label masking.

Matches ``nn.CrossEntropyLoss(ignore_index=...)`` 'mean' reduction over
non-ignored pixels (reference ``tool/train.py:121``): the per-replica loss
is the local valid-pixel mean; gradients are then ``pmean``-ed across the
data axis, which reproduces DDP's equal-weight replica averaging.
"""

from __future__ import annotations

import jax.numpy as jnp


def nll_and_valid(logits, labels, ignore_index=255):
    """Per-pixel negative log-likelihood + valid mask, [...]-shaped.

    Computed as ``logsumexp(logits) - <logits, onehot(label)>`` rather
    than ``take_along_axis(log_softmax(...))``: per-pixel gathers (and
    their scatter backward) lower terribly on TPU at segmentation scale —
    measured at [16,473,473,150]: 70.6 ms fwd / ~40 s bwd for the gather
    form vs 14.5 ms fwd for this one, with values identical to 1e-6 rel
    and gradients to 4e-13 abs. Same math as torch CE with ignore_index.
    """
    valid = (labels != ignore_index).astype(jnp.float32)
    safe = jnp.where(labels == ignore_index, 0, labels)
    lf = logits.astype(jnp.float32)
    m = jnp.max(lf, axis=-1)
    lse = m + jnp.log(jnp.sum(jnp.exp(lf - m[..., None]), axis=-1))
    onehot = (safe[..., None] == jnp.arange(lf.shape[-1])).astype(jnp.float32)
    picked = jnp.sum(lf * onehot, axis=-1)
    return lse - picked, valid


def cross_entropy_sum(logits, labels, ignore_index=255):
    """(sum of per-pixel NLL over valid pixels, valid count).

    ``logits``: [..., C] float; ``labels``: [...] int.
    """
    nll, valid = nll_and_valid(logits, labels, ignore_index)
    return jnp.sum(nll * valid), jnp.sum(valid)


def cross_entropy_mean(logits, labels, ignore_index=255):
    """Valid-pixel mean CE (torch 'mean' reduction with ignore_index)."""
    loss_sum, count = cross_entropy_sum(logits, labels, ignore_index)
    return loss_sum / jnp.maximum(count, 1.0)
