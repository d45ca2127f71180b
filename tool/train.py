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
    num_devices = jax.device_count()
    # `model_parallel: N` shards the wide head layers' output channels over
    # an N-sized `model` mesh axis (semseg_tpu/parallel/sharding_rules.py);
    # the batch shards over the remaining `data` axis. Default 1 = pure DP,
    # the reference's only strategy.
    model_parallel = int(cfg.get("model_parallel") or 1)
    if num_devices % model_parallel != 0:
        raise ValueError(
            f"model_parallel {model_parallel} does not divide "
            f"{num_devices} devices"
        )
    mesh = create_mesh(model=model_parallel)
    data_parallel = num_devices // model_parallel
    logger.info(
        "devices: %d (%d hosts), mesh: (data=%d, model=%d)",
        num_devices, jax.process_count(), data_parallel, model_parallel,
    )

    # Distributed-section keys from the reference schema: `sync_bn` is
    # honored (build_model switches BN between global-batch moments and
    # per-replica groups); `train_gpu` is validated against the attached
    # device count (the reference pins processes to that list,
    # tool/train.py:86-93,152-156 — here the mesh is the contract); the
    # NCCL rendezvous keys have no TPU equivalent and are reported inert.
    train_gpu = cfg.get("train_gpu")
    if train_gpu is not None and len(train_gpu) != num_devices:
        logger.warning(
            "config train_gpu lists %d devices but %d chips are attached; "
            "the attached mesh is used (batch divisibility is enforced "
            "against it below)", len(train_gpu), num_devices,
        )
    inert = [
        k for k in ("dist_url", "dist_backend", "multiprocessing_distributed",
                    "world_size", "rank")
        if cfg.get(k) is not None
    ]
    if inert:
        logger.info(
            "NCCL-era config keys with no TPU-native equivalent "
            "(accepted, ignored): %s — multi-host setup is "
            "jax.distributed.initialize via JAX_COORDINATOR_ADDRESS",
            ", ".join(inert),
        )
    if not cfg.get("sync_bn", True):
        logger.info(
            "sync_bn False: BatchNorm uses per-replica-group moments "
            "(%d groups), matching the reference's per-GPU BatchNorm2d",
            data_parallel,
        )

    # Training defaults to float32 compute, matching the reference recipe's
    # numerics (torch trains f32). `compute_dtype: bfloat16` opts into the
    # faster MXU path (params/stats stay f32 either way) — validate mIoU at
    # recipe scale before switching production runs.
    dtype_name = cfg.get("compute_dtype") or "float32"
    compute_dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    if dtype_name == "bfloat16":
        logger.info(
            "compute dtype: bfloat16 (deviates from the reference's f32 "
            "recipe; faster on TPU, validate mIoU parity)"
        )
    else:
        logger.info("compute dtype: %s", dtype_name)
    model, updates = build_model(
        cfg, dtype=compute_dtype, data_shards=data_parallel
    )
    for k, v in updates.items():
        cfg[k] = v
    if is_main:
        logger.info("=> creating model ... classes: %d", cfg.classes)

    if cfg.batch_size % data_parallel != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by the data axis "
            f"({data_parallel} replicas)"
        )
    if cfg.evaluate and cfg.batch_size_val % data_parallel != 0:
        raise ValueError(
            f"batch_size_val {cfg.batch_size_val} not divisible by the "
            f"data axis ({data_parallel} replicas)"
        )

    # --- data ---------------------------------------------------------------
    value_scale = 255
    mean = [0.485 * value_scale, 0.456 * value_scale, 0.406 * value_scale]
    std = [0.229 * value_scale, 0.224 * value_scale, 0.225 * value_scale]

    # Image wire format (`image_wire_dtype`): float32 (default), float16
    # (half the host->device bytes), or uint8 (quarter). uint8 ships RAW
    # [0,255] pixels — host normalization is dropped and the train/eval
    # steps normalize on device in f32 (bit-identical on CPU, ~1 ulp on
    # TPU); the real numerics change is rounding interpolated pixels to
    # integers (<= 0.5/255), the same scale as bf16's input truncation.
    wire_name = cfg.get("image_wire_dtype") or "float32"
    if wire_name not in ("float32", "float16", "uint8"):
        raise ValueError(
            f"image_wire_dtype must be float32/float16/uint8, got {wire_name}")
    wire_uint8 = wire_name == "uint8"
    if wire_name != "float32" and dtype_name != "bfloat16":
        logger.warning(
            "image_wire_dtype %s with float32 compute quantizes the "
            "inputs; use only when transfer-bound", wire_name,
        )
    device_normalize = (mean, std) if wire_uint8 else None

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
    ] + ([] if wire_uint8 else [transform.Normalize(mean=mean, std=std)]))
    train_data = None
    if cfg.get("native_loader"):
        # C++/OpenCV fused decode+augment pipeline (csrc/hostpipe.cpp):
        # same per-sample RNG stream, all pixel work in one GIL-free call.
        from semseg_tpu.data import native as native_pipe

        if native_pipe.available():
            train_data = native_pipe.NativeSemData(
                "train", cfg.data_root, cfg.train_list,
                crop_h=cfg.train_h, crop_w=cfg.train_w, mean=mean, std=std,
                ignore_label=cfg.ignore_label, crop_type="rand",
                scale=(cfg.scale_min, cfg.scale_max),
                rotate=(cfg.rotate_min, cfg.rotate_max),
                normalize=not wire_uint8,
            )
            logger.info("native (C++) host data pipeline enabled")
        else:
            logger.warning(
                "native_loader requested but the extension is not built "
                "(python csrc/setup.py build_ext --inplace); "
                "falling back to the Python pipeline"
            )
    if train_data is None:
        train_data = SemData(
            split="train", data_root=cfg.data_root, data_list=cfg.train_list,
            transform=train_transform,
        )
    if wire_uint8:
        # Round to uint8 per sample on the loader's worker threads (cv2
        # releases the GIL) instead of over the stacked batch in the
        # main loop.
        from semseg_tpu.data import Uint8Wire

        train_data = Uint8Wire(train_data)
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
        ] + ([] if wire_uint8 else [transform.Normalize(mean=mean, std=std)]))
        val_data = SemData(
            split="val", data_root=cfg.data_root, data_list=cfg.val_list,
            transform=val_transform,
        )
        if wire_uint8:
            from semseg_tpu.data import Uint8Wire

            val_data = Uint8Wire(val_data)
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

    # ImageNet-pretrained backbone init (reference builds seg models with
    # pretrained=True, loading ./initmodel/resnet{layers}_v2.pth inside the
    # ResNet constructor, model/resnet.py:199-200, tool/train.py:121-126).
    # `pretrained: False` or a missing file skips it; `initmodel:` overrides
    # the path. Load order matches the reference: pretrained -> weight ->
    # resume, later loads overwriting earlier ones.
    if cfg.get("pretrained", True):
        init_path = cfg.get("initmodel") or os.path.join(
            "initmodel", f"resnet{cfg.layers}_v2.pth"
        )
        if os.path.isfile(init_path):
            logger.info(
                "=> loading ImageNet-pretrained backbone '%s'", init_path
            )
            state, unused = ckpt.load_pretrained_backbone(
                state, cfg.layers, init_path
            )
            if unused:
                logger.warning("unconverted pretrained keys: %s", unused)
        else:
            logger.warning(
                "=> no pretrained backbone at '%s' — training from scratch "
                "deviates from the reference recipe (set pretrained: False "
                "to silence)", init_path,
            )

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

    # Mid-epoch resume (preemption snapshot): the global step encodes how
    # many batches of the in-progress epoch were consumed; fast-forward
    # the loader past them (exact: augmentation RNG is per-sample).
    start_batch = 0
    consumed = int(state.step) - start_epoch * steps_per_epoch
    if consumed >= steps_per_epoch:
        # Preempted exactly at an epoch boundary: those epochs completed.
        start_epoch += consumed // steps_per_epoch
        consumed %= steps_per_epoch
    if 0 < consumed < steps_per_epoch:
        start_batch = consumed
        logger.info(
            "=> mid-epoch resume: skipping %d consumed batches of epoch %d",
            consumed, start_epoch + 1,
        )

    # Preemption handling: SIGTERM (and SIGUSR1) request a checkpoint at
    # the next step boundary followed by a clean exit. `resume: auto`
    # picks the snapshot up and continues exactly where training stopped.
    import signal

    preempt = {"flag": False}

    def _on_signal(signum, frame):
        preempt["flag"] = True
        logger.info(
            "received signal %d: checkpointing at the next step boundary",
            signum,
        )

    for _sig in (signal.SIGTERM, signal.SIGUSR1):
        try:
            signal.signal(_sig, _on_signal)
        except ValueError:  # non-main thread (e.g. under a test runner)
            pass
    # Test hook: trip the same path deterministically after N steps.
    preempt_after = cfg.get("_preempt_after_step")
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
        num_replicas=data_parallel,
        rng_seed=cfg.get("manual_seed") or 0,
        normalize=device_normalize,
    )
    eval_step = make_eval_step(
        model, classes=cfg.classes, ignore_label=cfg.ignore_label,
        zoom_factor=cfg.zoom_factor, normalize=device_normalize,
    ) if cfg.evaluate else None

    writer = _make_writer(cfg.save_path) if is_main else None
    if is_main:
        check_makedirs(cfg.save_path)

    # Place the state on the mesh: TP PartitionSpecs for the head params
    # (replication when model_parallel == 1). Without this, jit would
    # implicitly reshard every step.
    from semseg_tpu.parallel.sharding_rules import shard_train_state

    state = shard_train_state(state, mesh)

    sharding = batch_sharding(mesh)

    # Labels travel as uint8 when class ids fit (every shipped dataset:
    # classes <= 150, ignore 255) — 8x less host->device traffic than the
    # loader's int64, bit-exact (the train step casts to int32 on device).
    labels_u8 = cfg.classes <= 255 and 0 <= cfg.ignore_label <= 255

    # Image wire conversion (wire_name resolved in the data section above;
    # float16 halves the image bytes, uint8 quarters them with on-device
    # normalization — the loader then emits raw [0,255] pixels).
    image_wire = {
        "float32": np.float32, "float16": np.float16, "uint8": np.uint8,
    }[wire_name]

    def to_global(images, labels):
        if labels_u8 and labels.dtype != np.uint8:
            labels = labels.astype(np.uint8)
        if images.dtype != image_wire:
            if wire_uint8:
                # Interpolated pixels are float; round half-to-even and
                # clip defensively (augmentation output stays in [0,255]).
                images = np.clip(np.rint(images), 0.0, 255.0).astype(np.uint8)
            else:
                images = images.astype(image_wire)
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
        train_loader.set_epoch(
            epoch, start_batch if epoch == start_epoch else 0
        )
        stats = _train_epoch(
            cfg, logger, is_main, writer, train_loader, train_step, state,
            to_global, epoch, steps_per_epoch, max_iter,
            start_batch=start_batch if epoch == start_epoch else 0,
            preempt=preempt, preempt_after=preempt_after,
        )
        state = stats.pop("state")
        if stats.pop("preempted", False):
            if profile_dir and is_main:
                jax.profiler.stop_trace()
            if is_main:
                # A preemption snapshot must not race an in-flight
                # async epoch save (it would delete the preempt dir).
                ckpt.wait_pending()
                path = ckpt.save_preempt_checkpoint(
                    cfg.save_path, epoch, state
                )
                logger.info("Preemption checkpoint saved to: %s", path)
            return state
        if is_main and writer is not None:
            for key in ("loss", "mIoU", "mAcc", "allAcc"):
                writer.add_scalar(f"{key}_train", stats[key], epoch_log)

        if epoch_log % cfg.save_freq == 0 and is_main:
            # async (default): snapshot on device and let a worker thread
            # run the device_get + orbax write while the next epoch
            # trains; `async_save: False` restores blocking saves.
            if cfg.get("async_save", True):
                path = ckpt.save_checkpoint_async(
                    cfg.save_path, epoch_log, state, cfg.save_freq
                )
            else:
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
    if is_main:
        ckpt.wait_pending()  # surface async-save errors before returning
    return state


def _train_epoch(cfg, logger, is_main, writer, loader, train_step, state,
                 to_global, epoch, steps_per_epoch, max_iter,
                 start_batch=0, preempt=None, preempt_after=None):
    import jax

    from semseg_tpu.utils import AverageMeter
    from semseg_tpu.utils.metrics import summarize

    import jax.numpy as jnp

    batch_time, data_time = AverageMeter(), AverageMeter()
    # Per-step metrics stay ON DEVICE in a pending buffer; the host syncs
    # only at print_freq boundaries and at epoch end. Every host sync costs
    # a full device round trip, so per-step device_get would serialize the
    # otherwise-async step pipeline. Flushing the buffer still yields
    # per-iteration tensorboard scalars (loss/mIoU/mAcc/allAcc_train_batch,
    # reference tool/train.py:327-331), written retroactively in order.
    totals = None
    pending = []  # (current_iter, device metrics) awaiting flush
    steps = 0

    def flush(last_log=None):
        nonlocal totals
        fetched = jax.device_get([m for _, m in pending])
        for (it, _), m in zip(pending, fetched):
            if totals is None:
                totals = dict(m)
            else:
                for k in totals:
                    totals[k] = totals[k] + m[k]
            if writer is not None:
                inter, union, target = (
                    m["intersection"], m["union"], m["target"]
                )
                writer.add_scalar("loss_train_batch", float(m["main_loss"]), it)
                writer.add_scalar(
                    "mIoU_train_batch", float(np.mean(inter / (union + 1e-10))), it
                )
                writer.add_scalar(
                    "mAcc_train_batch", float(np.mean(inter / (target + 1e-10))), it
                )
                writer.add_scalar(
                    "allAcc_train_batch",
                    float(inter.sum() / (target.sum() + 1e-10)), it,
                )
        last = fetched[-1] if fetched else None
        pending.clear()
        return last

    preempted = False
    end = time.time()
    for i, (gi, gl) in enumerate(_device_prefetch(loader, to_global)):
        data_time.update(time.time() - end)
        state, metrics = train_step(state, gi, gl)
        steps += 1
        batch_idx = start_batch + i + 1  # absolute within the epoch
        current_iter = epoch * steps_per_epoch + batch_idx
        pending.append((current_iter, metrics))
        batch_time.update(time.time() - end)
        end = time.time()

        if batch_idx % cfg.print_freq == 0:
            m = flush()  # sync point (every print_freq)
            if is_main and m is not None:
                remain = (max_iter - current_iter) * batch_time.avg
                t_m, t_s = divmod(int(remain), 60)
                t_h, t_m = divmod(t_m, 60)
                accuracy = m["intersection"].sum() / (m["target"].sum() + 1e-10)
                logger.info(
                    "Epoch: [%d/%d][%d/%d] Data %.3f (%.3f) Batch %.3f (%.3f) "
                    "Remain %02d:%02d:%02d MainLoss %.4f AuxLoss %.4f Loss %.4f "
                    "Accuracy %.4f lr %.6f",
                    epoch + 1, cfg.epochs, batch_idx, steps_per_epoch,
                    data_time.val, data_time.avg, batch_time.val, batch_time.avg,
                    t_h, t_m, t_s, float(m["main_loss"]),
                    float(m["aux_loss"]), float(m["loss"]), accuracy,
                    float(m["lr"]),
                )
        flag_local = (preempt is not None and preempt["flag"]) or (
            preempt_after is not None and current_iter >= int(preempt_after)
        )
        # Single process: react to the local flag immediately (free).
        # Multi-host: the agreement collective is a blocking host round
        # trip (~40ms on a relay), so it runs only at print_freq
        # boundaries — the same loop point on every host, preserving the
        # same-step-boundary guarantee while taxing the hot loop zero
        # extra syncs (it aligns with the metric flush already there).
        if jax.process_count() == 1:
            if flag_local:
                preempted = True
                break
        elif batch_idx % cfg.print_freq == 0 and _preempt_agreed(flag_local):
            preempted = True
            break
    flush()

    if totals is None:
        return {"state": state, "loss": 0.0, "mIoU": 0.0, "mAcc": 0.0,
                "allAcc": 0.0, "preempted": preempted}
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
        "preempted": preempted,
    }


def _preempt_agreed(flag_local: bool) -> bool:
    """Collective preemption decision.

    Signal delivery is asynchronous: in a multi-host run, host A can see
    SIGTERM one step earlier than host B (or B never receives it). If
    each host broke on its own flag, the lagging hosts would dispatch the
    next step's cross-host collectives (SyncBN moments, gradient
    all-reduce) that the exited host never joins — a deadlock — and the
    saved snapshot's step would disagree across hosts. Every host calls
    this at the same loop points (print_freq boundaries — a blocking
    host round trip per call, so it is amortized rather than per-step),
    so all hosts observe the same OR-reduced flag and break on the same
    step boundary. Single-process: the local flag as-is.
    """
    import jax

    if jax.process_count() == 1:
        return bool(flag_local)
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray([1 if flag_local else 0], np.int32)
    )
    return bool(np.asarray(flags).any())


def _device_prefetch(iterator, to_global, depth=2):
    """Keep ``depth`` batches staged on the device ahead of consumption.

    The host issues the (async) host->device transfer of batch k+1 while
    the device still executes step k, hiding transfer latency behind
    compute — the double-buffering the reference gets implicitly from
    ``.cuda(non_blocking=True)`` + CUDA streams (tool/train.py:267-268).
    The host-side loader already overlaps augmentation via its prefetch
    queue; this closes the remaining transfer/dispatch gap.
    """
    from collections import deque

    buf = deque()
    it = iter(iterator)
    exhausted = False
    while True:
        while not exhausted and len(buf) < depth:
            try:
                buf.append(to_global(*next(it)))
            except StopIteration:
                exhausted = True
        if not buf:
            return
        yield buf.popleft()


def _pad_batch(images, labels, full, ignore_label):
    """Pad a trailing partial batch to ``full`` samples with ignore-labeled
    filler. Padded pixels carry ``ignore_label`` so they are excluded from
    the CE loss_sum/valid_count and the metric histograms — the GSPMD
    equivalent of the reference's drop_last=False validation loader
    (reference tool/train.py:213-218) without uneven shapes that a
    batch-sharded device_put cannot place."""
    n = images.shape[0]
    if n == full:
        return images, labels
    pad = full - n
    images = np.concatenate(
        [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
    )
    labels = np.concatenate(
        [labels, np.full((pad,) + labels.shape[1:], ignore_label, labels.dtype)]
    )
    return images, labels


def _validate(cfg, logger, is_main, loader, eval_step, state, to_global):
    import jax

    from semseg_tpu.utils.metrics import summarize

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    host_batch = cfg.batch_size_val // jax.process_count()

    def stage(images, labels):
        return to_global(
            *_pad_batch(images, labels, host_batch, cfg.ignore_label)
        )

    # Accumulate on device (tiny adds); one host sync at the end keeps the
    # eval steps pipelined back-to-back.
    acc = None
    for gi, gl in _device_prefetch(loader, stage):
        metrics = eval_step(variables, gi, gl)
        acc = metrics if acc is None else {
            k: acc[k] + metrics[k] for k in acc
        }
    if acc is None:
        return {"loss": 0.0, "mIoU": 0.0, "mAcc": 0.0, "allAcc": 0.0}
    acc = jax.device_get(acc)
    inter, union, target = acc["intersection"], acc["union"], acc["target"]
    loss_sum = float(acc["loss_sum"])
    count_sum = float(acc["valid_count"])
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
