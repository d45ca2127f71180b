"""Training step: jit-compiled, GSPMD data-parallel, SyncBN-exact.

Parallelism design (replaces reference ``tool/train.py``'s
mp.spawn + NCCL DDP + SyncBatchNorm + explicit all_reduce stack):

- The global batch lives as one array sharded along the ``data`` mesh axis;
  parameters are replicated. Everything below runs inside ONE ``jax.jit``
  and the XLA SPMD partitioner inserts all collectives on ICI:
  * BatchNorm reduces moments over the *global* batch axis — that IS
    SyncBatchNorm, with no wrapper (``jnp.mean`` over a sharded axis
    compiles to a local reduce + all-reduce);
  * gradient averaging falls out of differentiating the replica-averaged
    loss (below) — XLA emits the same ring all-reduce DDP would;
  * metric histograms are global sums (the reference's
    ``dist.all_reduce`` of intersection/union/target).
- DDP loss semantics are reproduced exactly: torch CE averages over the
  *local* batch's valid pixels and DDP means the per-replica gradients
  equally. Reshaping the global batch into ``num_replicas`` groups and
  averaging group means reproduces this bit-for-bit under GSPMD.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from semseg_tpu.engine.losses import cross_entropy_sum, nll_and_valid
from semseg_tpu.engine.optim import (
    SGDState,
    make_lr_mult,
    poly_lr,
    sgd_init,
    sgd_update,
)
from semseg_tpu.ops import resize_bilinear_align_corners
from semseg_tpu.utils.metrics import intersection_and_union_jax


def downscale_labels(labels, zoom_factor: int):
    """Label downscale for ``zoom_factor != 8`` recipes.

    Mirrors the reference exactly (``tool/train.py:262-266``): float
    labels are bilinearly resized with align_corners to the logits grid
    ``(H-1)//8*zoom+1`` and truncated back to integers (torch ``.long()``
    truncates toward zero, as does this astype).
    """
    h = (labels.shape[1] - 1) // 8 * zoom_factor + 1
    w = (labels.shape[2] - 1) // 8 * zoom_factor + 1
    lab_f = resize_bilinear_align_corners(
        labels.astype(jnp.float32)[..., None], (h, w)
    )[..., 0]
    return lab_f.astype(jnp.int32)


def _device_normalize(images, normalize):
    """Normalize raw-pixel images on device (the uint8 wire format).

    f32 subtract/divide matching host ``transform.Normalize`` — pinned
    bit-identical on CPU (tests/test_data.py); on TPU the divide may
    differ by ~1 ulp, far below the wire format's 0.5/255 quantization.
    """
    if normalize is None:
        return images
    mean, std = normalize
    return (images.astype(jnp.float32)
            - jnp.asarray(mean, jnp.float32)) / jnp.asarray(std, jnp.float32)


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt: SGDState
    step: jnp.ndarray  # int32 scalar


def create_train_state(model, rng, sample_input) -> TrainState:
    variables = jax.jit(functools.partial(model.init, train=True))(
        {"params": rng, "dropout": rng}, sample_input
    )
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt=sgd_init(params),
        step=jnp.zeros((), jnp.int32),
    )


def replica_mean_ce(logits, labels, num_replicas: int, ignore_index: int):
    """Mean over replicas of each replica's valid-pixel-mean CE (DDP
    semantics). ``logits``: [B, H, W, C] with B divisible by replicas.

    NLL comes from ``losses.nll_and_valid`` (logsumexp-dot form — the
    gather form is TPU-hostile at segmentation scale, see its docstring).
    """
    b = logits.shape[0]
    assert b % num_replicas == 0, (b, num_replicas)
    group = b // num_replicas
    # Per-group means: reshape keeps the leading (sharded) axis outermost.
    lg = logits.reshape(num_replicas, group, *logits.shape[1:])
    tg = labels.reshape(num_replicas, group, *labels.shape[1:])
    nll, valid = nll_and_valid(lg, tg, ignore_index)
    axes = tuple(range(1, nll.ndim))
    group_sum = jnp.sum(nll * valid, axis=axes)
    group_cnt = jnp.maximum(jnp.sum(valid, axis=axes), 1.0)
    return jnp.mean(group_sum / group_cnt)


def make_train_step(
    model,
    *,
    classes: int,
    ignore_label: int,
    aux_weight: float,
    base_lr: float,
    max_iter: int,
    power: float,
    momentum: float,
    weight_decay: float,
    zoom_factor: int,
    num_replicas: int,
    rng_seed: int = 0,
    donate: bool = True,
    normalize=None,
):
    """Build the jitted train step: (state, images, labels) -> (state, metrics).

    ``images``: [B, H, W, 3] float32 (normalized), sharded along batch.
    ``labels``: [B, H, W] int32/int64 with ignore_label outside.
    ``normalize``: optional (mean, std) 3-vectors — images then arrive as
    RAW pixels (e.g. the uint8 wire format) and are normalized on device
    (see ``_device_normalize``).
    """

    def step_fn(state: TrainState, images, labels):
        images = _device_normalize(images, normalize)
        if zoom_factor != 8:
            labels_t = downscale_labels(labels, zoom_factor)
        else:
            labels_t = labels.astype(jnp.int32)

        dropout_rng = jax.random.fold_in(
            jax.random.PRNGKey(rng_seed), state.step
        )

        def loss_fn(params):
            (logits, aux_logits), new_model_state = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            main_loss = replica_mean_ce(
                logits, labels_t, num_replicas, ignore_label
            )
            aux_loss = replica_mean_ce(
                aux_logits, labels_t, num_replicas, ignore_label
            )
            loss = main_loss + aux_weight * aux_loss
            return loss, (main_loss, aux_loss, logits, new_model_state)

        (loss, (main_loss, aux_loss, logits, new_model_state)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        )

        # Reference timing: the optimizer's LR is set for the *next*
        # iteration after stepping (tool/train.py:299-304), so iteration k
        # (0-based step counter) uses poly(k / max_iter) — the first step
        # runs at exactly base_lr.
        lr = poly_lr(base_lr, state.step, max_iter, power)
        lr_mult = make_lr_mult(state.params)
        new_params, new_opt = sgd_update(
            state.params, grads, state.opt, lr, lr_mult,
            momentum=momentum, weight_decay=weight_decay,
        )

        pred = jnp.argmax(logits, axis=-1)
        inter, union, target = intersection_and_union_jax(
            pred, labels_t, classes, ignore_label
        )

        new_state = TrainState(
            params=new_params,
            batch_stats=new_model_state["batch_stats"],
            opt=new_opt,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss,
            "main_loss": main_loss,
            "aux_loss": aux_loss,
            "lr": lr,
            "intersection": inter,
            "union": union,
            "target": target,
        }
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_eval_step(model, *, classes: int, ignore_label: int, zoom_factor: int,
                   normalize=None):
    """Center-crop validation step (reference ``tool/train.py:343-406``):
    eval-mode forward, CE loss, argmax metrics."""

    def step_fn(variables, images, labels):
        images = _device_normalize(images, normalize)
        logits = model.apply(variables, images, train=False)
        labels_t = labels.astype(jnp.int32)
        if zoom_factor != 8:
            logits = resize_bilinear_align_corners(
                logits, (labels.shape[1], labels.shape[2])
            )
        loss_sum, count = cross_entropy_sum(logits, labels_t, ignore_label)
        pred = jnp.argmax(logits, axis=-1)
        inter, union, target = intersection_and_union_jax(
            pred, labels_t, classes, ignore_label
        )
        return {
            "loss_sum": loss_sum,
            "valid_count": count,
            "intersection": inter,
            "union": union,
            "target": target,
        }

    return jax.jit(step_fn)
