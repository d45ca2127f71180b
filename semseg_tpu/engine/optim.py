"""SGD with PyTorch update order, parameter groups, and poly LR.

PyTorch SGD folds weight decay and momentum into the gradient *before* the
LR multiply (the reference FAQ explicitly flags this divergence from
Caffe, ``FAQ.md:34-42``):

    g = grad + wd * p
    buf = momentum * buf + g
    p = p - lr * buf

The reference trains with two LR groups — backbone at ``base_lr``, new
modules (ppm/psa/cls/aux) at ``10 * base_lr`` — with the poly schedule
applied to both every iteration (``tool/train.py:134-140, 299-304``). Here
the group structure is a pytree of per-leaf LR multipliers aligned with the
parameter tree, so the whole update is one fused elementwise pass.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class SGDState(NamedTuple):
    momentum: Any  # pytree like params


def sgd_init(params) -> SGDState:
    return SGDState(momentum=jax.tree.map(jnp.zeros_like, params))


def sgd_update(
    params,
    grads,
    state: SGDState,
    lr: jnp.ndarray,
    lr_mult,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
):
    """One SGD step. ``lr`` is the scheduled base LR (traced scalar);
    ``lr_mult`` is a pytree of static per-leaf multipliers."""

    new_momentum = jax.tree.map(
        lambda p, g, buf: momentum * buf
        + (g.astype(jnp.float32) + weight_decay * p),
        params, grads, state.momentum,
    )
    new_params = jax.tree.map(
        lambda p, buf, mult: p - (lr * mult) * buf,
        params, new_momentum, lr_mult,
    )
    return new_params, SGDState(momentum=new_momentum)


NEW_MODULE_PREFIXES = ("ppm", "psa", "cls", "aux")


def make_lr_mult(params, new_module_lr_mult: float = 10.0):
    """Per-leaf LR multiplier tree: backbone 1x, new modules 10x
    (reference ``tool/train.py:134-138``)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree.structure(params)
    mults = []
    for path, _ in flat:
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        mults.append(
            new_module_lr_mult if top in NEW_MODULE_PREFIXES else 1.0
        )
    return jax.tree.unflatten(treedef, mults)


def poly_lr(base_lr, step, max_iter, power=0.9):
    """Poly schedule on a traced step counter."""
    frac = 1.0 - step.astype(jnp.float32) / max_iter
    return base_lr * jnp.maximum(frac, 0.0) ** power
