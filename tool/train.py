"""Distributed training driver (TPU-native).

CLI-compatible with the reference trainer (``--config <yaml> [KEY VALUE
...]``, reference ``tool/train.py:27-36``) with the same recipe: random
scale/rotate/blur/flip/crop augmentation, poly LR with 10x head group,
SyncBN, aux loss 0.4, per-epoch checkpointing with rolling retention,
inline center-crop validation.

Execution model: one Python process per *host* (not per chip).
``jax.distributed.initialize`` + a data-axis mesh over all chips replace
mp.spawn/NCCL/DDP; the jitted train step contains the whole
forward/backward/update and every collective (see
``semseg_tpu/engine/trainer.py``).
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from semseg_tpu.config import parse_config_args

    cfg = parse_config_args(
        default_config="config/ade20k/ade20k_pspnet50.yaml"
    )
    run(cfg)


def run(cfg):
    import jax
    import jax.numpy as jnp

    from semseg_tpu.data import DataLoader, SemData, transform
    from semseg_tpu.engine import checkpoint as ckpt
    from semseg_tpu.engine.optim import sgd_init
    from semseg_tpu.engine.trainer import (
        TrainState,
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from semseg_tpu.models.build import build_model, derive_psa_mask_dims, validate_arch
    from semseg_tpu.parallel.mesh import batch_sharding, create_mesh
    from semseg_tpu.utils import AverageMeter, check_makedirs
    from semseg_tpu.utils.metrics import summarize
    from semseg_tpu.utils.misc import get_logger

    logger = get_logger()
    validate_arch(cfg)

    if cfg.get("manual_seed") is not None:
        random.seed(cfg.manual_seed)
        np.random.seed(cfg.manual_seed)

    # Multi-host init (no-op single-host). The reference's TCP rendezvous
    # (tool/train.py:103-119) is replaced by the JAX coordinator: set
    # SEMSEG_NUM_HOSTS>1 or the standard JAX_COORDINATOR_ADDRESS /
    # JAX_NUM_PROCESSES env and launch one process per host.
    if (
        int(os.environ.get("SEMSEG_NUM_HOSTS", "1")) > 1
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or int(os.environ.get("JAX_NUM_PROCESSES", "1")) > 1
    ):
        jax.distributed.initialize()

    is_main = jax.process_index() == 0
    mesh = create_mesh()
    num_devices = jax.device_count()
    logger.info("devices: %d (%d hosts)", num_devices, jax.process_count())

    # TPU-first default: bf16 compute (f32 params/stats) unless the config
    # pins a dtype. CPU keeps f32 (bf16 is emulated and slow there).
    dtype_name = cfg.get("compute_dtype")
    if dtype_name is None:
        dtype_name = (
            "bfloat16"
            if jax.default_backend() in ("tpu", "axon")
            else "float32"
        )
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    logger.info("compute dtype: %s", dtype_name)
    model, updates = build_model(cfg, dtype=compute_dtype)
    for k, v in updates.items():
        cfg[k] = v
    if is_main:
        logger.info("=> creating model ... classes: %d", cfg.classes)

    if cfg.batch_size % num_devices != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by {num_devices} devices"
        )

    # --- data ---------------------------------------------------------------
    value_scale = 255
    mean = [0.485 * value_scale, 0.456 * value_scale, 0.406 * value_scale]
    std = [0.229 * value_scale, 0.224 * value_scale, 0.225 * value_scale]
    train_transform = transform.Compose([
        transform.RandScale([cfg.scale_min, cfg.scale_max]),
        transform.RandRotate(
            [cfg.rotate_min, cfg.rotate_max], padding=mean,
            ignore_label=cfg.ignore_label,
        ),
        transform.RandomGaussianBlur(),
        transform.RandomHorizontalFlip(),
        transform.Crop(
            [cfg.train_h, cfg.train_w], crop_type="rand", padding=mean,
            ignore_label=cfg.ignore_label,
        ),
        transform.ToTensor(),
        transform.Normalize(mean=mean, std=std),
    ])
    train_data = SemData(
        split="train", data_root=cfg.data_root, data_list=cfg.train_list,
        transform=train_transform,
    )
    host_batch = cfg.batch_size // jax.process_count()
    train_loader = DataLoader(
        train_data, batch_size=host_batch, shuffle=True,
        num_workers=cfg.workers, drop_last=True,
        seed=cfg.get("manual_seed") or 0,
        shard_index=jax.process_index(), num_shards=jax.process_count(),
    )
    val_loader = None
    if cfg.evaluate:
        val_transform = transform.Compose([
            transform.Crop(
                [cfg.train_h, cfg.train_w], crop_type="center", padding=mean,
                ignore_label=cfg.ignore_label,
            ),
            transform.ToTensor(),
            transform.Normalize(mean=mean, std=std),
        ])
        val_data = SemData(
            split="val", data_root=cfg.data_root, data_list=cfg.val_list,
            transform=val_transform,
        )
        val_loader = DataLoader(
            val_data, batch_size=cfg.batch_size_val // jax.process_count(),
            shuffle=False, num_workers=cfg.workers,
            shard_index=jax.process_index(), num_shards=jax.process_count(),
        )

    # --- state --------------------------------------------------------------
    rng = jax.random.PRNGKey(cfg.get("manual_seed") or 0)
    sample = jnp.zeros((cfg.batch_size, cfg.train_h, cfg.train_w, 3), jnp.float32)
    state = create_train_state(model, rng, sample)
    start_epoch = cfg.start_epoch

    if cfg.get("weight"):
        if os.path.isfile(cfg.weight) or os.path.isdir(cfg.weight):
            logger.info("=> loading weight '%s'", cfg.weight)
            variables = ckpt.load_model_variables(cfg.weight, cfg.arch, cfg.layers)
            merged_params = _merge(state.params, variables["params"])
            merged_stats = _merge(state.batch_stats, variables["batch_stats"])
            state = state._replace(
                params=jax.tree.map(jnp.asarray, merged_params),
                batch_stats=jax.tree.map(jnp.asarray, merged_stats),
            )
        else:
            logger.info("=> no weight found at '%s'", cfg.weight)

    if cfg.get("resume"):
        resume_path = cfg.resume
        if resume_path == "auto":
            resume_path = ckpt.latest_checkpoint(cfg.save_path)
        if resume_path and os.path.exists(resume_path):
            logger.info("=> loading checkpoint '%s'", resume_path)
            payload = ckpt.restore_checkpoint(resume_path)
            from semseg_tpu.engine.optim import SGDState

            state = TrainState(
                params=jax.tree.map(jnp.asarray, payload["params"]),
                batch_stats=jax.tree.map(jnp.asarray, payload["batch_stats"]),
                opt=SGDState(momentum=jax.tree.map(jnp.asarray, payload["momentum"])),
                step=jnp.asarray(payload["step"], jnp.int32),
            )
            start_epoch = int(payload["epoch"])
            logger.info("=> loaded checkpoint (epoch %d)", start_epoch)
        else:
            logger.info("=> no checkpoint found at '%s'", cfg.resume)

    steps_per_epoch = len(train_loader)
    max_iter = cfg.epochs * steps_per_epoch
    train_step = make_train_step(
        model,
        classes=cfg.classes,
        ignore_label=cfg.ignore_label,
        aux_weight=cfg.aux_weight,
        base_lr=cfg.base_lr,
        max_iter=max_iter,
        power=cfg.power,
        momentum=cfg.momentum,
        weight_decay=cfg.weight_decay,
        zoom_factor=cfg.zoom_factor,
        num_replicas=num_devices,
        rng_seed=cfg.get("manual_seed") or 0,
    )
    eval_step = make_eval_step(
        model, classes=cfg.classes, ignore_label=cfg.ignore_label,
        zoom_factor=cfg.zoom_factor,
    ) if cfg.evaluate else None

    writer = _make_writer(cfg.save_path) if is_main else None
    if is_main:
        check_makedirs(cfg.save_path)

    sharding = batch_sharding(mesh)

    def to_global(images, labels):
        if jax.process_count() == 1:
            return (
                jax.device_put(images, sharding),
                jax.device_put(labels, sharding),
            )
        return (
            jax.make_array_from_process_local_data(sharding, images),
            jax.make_array_from_process_local_data(sharding, labels),
        )

    # Optional profiler trace (config key `profile_dir`): captures XLA/TPU
    # timelines for the first epoch — the jax-native upgrade over the
    # reference's AverageMeter wall-clock instrumentation.
    profile_dir = cfg.get("profile_dir")
    if profile_dir and is_main:
        jax.profiler.start_trace(profile_dir)

    for epoch in range(start_epoch, cfg.epochs):
        epoch_log = epoch + 1
        train_loader.set_epoch(epoch)
        stats = _train_epoch(
            cfg, logger, is_main, writer, train_loader, train_step, state,
            to_global, epoch, steps_per_epoch, max_iter,
        )
        state = stats.pop("state")
        if is_main and writer is not None:
            for key in ("loss", "mIoU", "mAcc", "allAcc"):
                writer.add_scalar(f"{key}_train", stats[key], epoch_log)

        if epoch_log % cfg.save_freq == 0 and is_main:
            path = ckpt.save_checkpoint(
                cfg.save_path, epoch_log, state, cfg.save_freq
            )
            logger.info("Saving checkpoint to: %s", path)

        if cfg.evaluate and val_loader is not None:
            val_stats = _validate(
                cfg, logger, is_main, val_loader, eval_step, state, to_global
            )
            if is_main and writer is not None:
                for key in ("loss", "mIoU", "mAcc", "allAcc"):
                    writer.add_scalar(f"{key}_val", val_stats[key], epoch_log)

        if profile_dir and is_main and epoch == start_epoch:
            jax.profiler.stop_trace()
            profile_dir = None
    return state


def _train_epoch(cfg, logger, is_main, writer, loader, train_step, state,
                 to_global, epoch, steps_per_epoch, max_iter):
    import jax

    from semseg_tpu.utils import AverageMeter
    from semseg_tpu.utils.metrics import summarize

    import jax.numpy as jnp

    batch_time, data_time = AverageMeter(), AverageMeter()
    # Metric accumulation stays ON DEVICE; the host syncs only at
    # print_freq boundaries and at epoch end. Every host sync costs a
    # full device round trip, so per-step device_get would serialize the
    # otherwise-async step pipeline.
    acc = None
    end = time.time()
    for i, (images, labels) in enumerate(loader):
        data_time.update(time.time() - end)
        gi, gl = to_global(images, labels)
        state, metrics = train_step(state, gi, gl)
        if acc is None:
            acc = {
                k: metrics[k] for k in ("intersection", "union", "target")
            }
            acc.update(
                {k: metrics[k] for k in ("main_loss", "aux_loss", "loss")}
            )
        else:
            acc = {k: acc[k] + metrics[k] for k in acc}
        batch_time.update(time.time() - end)
        end = time.time()

        current_iter = epoch * steps_per_epoch + i + 1
        if (i + 1) % cfg.print_freq == 0 and is_main:
            m = jax.device_get(metrics)  # sync point (every print_freq)
            remain = (max_iter - current_iter) * batch_time.avg
            t_m, t_s = divmod(int(remain), 60)
            t_h, t_m = divmod(t_m, 60)
            accuracy = m["intersection"].sum() / (m["target"].sum() + 1e-10)
            logger.info(
                "Epoch: [%d/%d][%d/%d] Data %.3f (%.3f) Batch %.3f (%.3f) "
                "Remain %02d:%02d:%02d MainLoss %.4f AuxLoss %.4f Loss %.4f "
                "Accuracy %.4f lr %.6f",
                epoch + 1, cfg.epochs, i + 1, steps_per_epoch,
                data_time.val, data_time.avg, batch_time.val, batch_time.avg,
                t_h, t_m, t_s, float(m["main_loss"]),
                float(m["aux_loss"]), float(m["loss"]), accuracy,
                float(m["lr"]),
            )
            if writer is not None:
                writer.add_scalar(
                    "loss_train_batch", float(m["main_loss"]), current_iter
                )

    steps = max(i + 1, 1) if acc is not None else 1
    if acc is None:
        return {"state": state, "loss": 0.0, "mIoU": 0.0, "mAcc": 0.0,
                "allAcc": 0.0}
    totals = jax.device_get(acc)
    m_iou, m_acc, all_acc = summarize(
        totals["intersection"], totals["union"], totals["target"]
    )
    if is_main:
        logger.info(
            "Train result at epoch [%d/%d]: mIoU/mAcc/allAcc %.4f/%.4f/%.4f.",
            epoch + 1, cfg.epochs, m_iou, m_acc, all_acc,
        )
    return {
        "state": state,
        "loss": float(totals["main_loss"]) / steps,
        "mIoU": m_iou,
        "mAcc": m_acc,
        "allAcc": all_acc,
    }


def _validate(cfg, logger, is_main, loader, eval_step, state, to_global):
    import jax

    from semseg_tpu.utils.metrics import summarize

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    inter = union = target = 0
    loss_sum = count_sum = 0.0
    for images, labels in loader:
        gi, gl = to_global(images, labels)
        metrics = jax.device_get(eval_step(variables, gi, gl))
        inter = inter + metrics["intersection"]
        union = union + metrics["union"]
        target = target + metrics["target"]
        loss_sum += float(metrics["loss_sum"])
        count_sum += float(metrics["valid_count"])
    m_iou, m_acc, all_acc = summarize(inter, union, target)
    if is_main:
        logger.info(
            "Val result: mIoU/mAcc/allAcc %.4f/%.4f/%.4f.", m_iou, m_acc, all_acc
        )
        iou = inter / (union + 1e-10)
        acc = inter / (target + 1e-10)
        for c in range(cfg.classes):
            logger.info(
                "Class_%d Result: iou/accuracy %.4f/%.4f.", c, iou[c], acc[c]
            )
    return {
        "loss": loss_sum / max(count_sum, 1.0),
        "mIoU": m_iou,
        "mAcc": m_acc,
        "allAcc": all_acc,
    }


def _merge(base, override):
    """Recursively overlay ``override`` onto ``base`` where keys exist."""
    if not isinstance(base, dict) or not isinstance(override, dict):
        return override if override is not None else base
    merged = dict(base)
    for key, value in override.items():
        if key in merged:
            merged[key] = _merge(merged[key], value)
        else:
            merged[key] = value
    return merged


def _make_writer(save_path):
    try:
        from torch.utils.tensorboard import SummaryWriter

        return SummaryWriter(save_path)
    except Exception:
        return _JsonlWriter(os.path.join(save_path, "scalars.jsonl"))


class _JsonlWriter:
    """Tensorboard-API-compatible scalar logger writing JSON lines."""

    def __init__(self, path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        self._f = open(path, "a")

    def add_scalar(self, tag, value, step):
        import json

        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()


if __name__ == "__main__":
    main()
