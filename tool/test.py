"""Whole-image multi-scale sliding-window evaluation driver.

CLI-compatible with the reference tester (``tool/test.py``): loads a
checkpoint (native or reference ``.pth``), runs multi-scale sliding-window
inference over an index-sharded list of images, saves gray + palette-color
PNG predictions, and scores them against ground truth (``cal_acc``).
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main():
    from semseg_tpu.config import parse_config_args

    cfg = parse_config_args(
        default_config="config/ade20k/ade20k_pspnet50.yaml"
    )
    run(cfg)


def run(cfg):
    import jax.numpy as jnp

    from semseg_tpu.data import SemData, transform
    from semseg_tpu.engine.checkpoint import load_model_variables
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
    from semseg_tpu.models.build import build_model, validate_arch
    from semseg_tpu.utils import AverageMeter, check_makedirs, colorize
    from semseg_tpu.utils.misc import get_logger

    logger = get_logger()
    validate_arch(cfg)
    if cfg.split not in ("train", "val", "test"):
        raise ValueError(f"bad split {cfg.split}")
    logger.info("=> creating model ... classes: %d", cfg.classes)

    value_scale = 255
    mean = [0.485 * value_scale, 0.456 * value_scale, 0.406 * value_scale]
    std = [0.229 * value_scale, 0.224 * value_scale, 0.225 * value_scale]

    gray_folder = os.path.join(cfg.save_folder, "gray")
    color_folder = os.path.join(cfg.save_folder, "color")

    test_data = SemData(
        split=cfg.split, data_root=cfg.data_root, data_list=cfg.test_list,
        transform=transform.Compose([transform.ToTensor()]),
    )
    index_start = cfg.index_start
    index_end = (
        len(test_data.data_list)
        if cfg.index_step == 0
        else min(index_start + cfg.index_step, len(test_data.data_list))
    )
    test_data.data_list = test_data.data_list[index_start:index_end]
    colors = np.loadtxt(cfg.colors_path).astype("uint8")
    names = [line.rstrip("\n") for line in open(cfg.names_path)]

    if not cfg.has_prediction:
        import jax

        model, updates = build_model(cfg, dtype=jnp.float32)
        for k, v in updates.items():
            cfg[k] = v
        if not (os.path.isfile(cfg.model_path) or os.path.isdir(cfg.model_path)):
            raise RuntimeError(f"=> no checkpoint found at '{cfg.model_path}'")
        logger.info("=> loading checkpoint '%s'", cfg.model_path)
        variables = load_model_variables(cfg.model_path, cfg.arch, cfg.layers)
        variables = jax.tree.map(jnp.asarray, variables)
        logger.info("=> loaded checkpoint '%s'", cfg.model_path)

        # Pipeline selection: 'device' compiles one program per (image
        # shape, scale) — ideal for fixed-size datasets (Cityscapes);
        # 'device_bucketed' bounds compiles for variable-size datasets
        # (ADE20K/VOC); 'host' is the cv2/numpy exactness fallback.
        mode = cfg.get("eval_pipeline")
        if not mode:
            # Probe a spread of images, not just the head of the list: a
            # dataset whose first few images share a shape but later vary
            # would otherwise pick 'device' and compile per shape. Header
            # sniffing keeps this cheap even for large lists.
            n_list = len(test_data.data_list)
            probe_idx = sorted(
                {int(i) for i in np.linspace(0, max(n_list - 1, 0), num=min(16, n_list))}
            )
            probe = [
                _image_shape(test_data.data_list[i][0]) for i in probe_idx
            ]
            mode = "device" if len(set(probe)) <= 1 else "device_bucketed"
            logger.info(
                "eval_pipeline auto-selected: %s (%d shapes over %d probes)",
                mode, len(set(probe)), len(probe),
            )
        # Multi-chip SPMD eval: `eval_devices: N` (or 'all') runs the
        # window forwards over an N-chip mesh — `eval_partition: window`
        # (throughput) or `spatial` (per-image latency via GSPMD halo
        # exchange). Single-process analog of the reference's
        # DataParallel eval (`tool/test.py:34-36`).
        eval_mesh = None
        n_eval = cfg.get("eval_devices")
        if n_eval:
            from jax.sharding import Mesh

            from semseg_tpu.parallel.mesh import DATA_AXIS

            n_eval = jax.device_count() if n_eval == "all" else int(n_eval)
            if n_eval > jax.device_count():
                raise RuntimeError(
                    f"eval_devices={n_eval} but only "
                    f"{jax.device_count()} devices attached"
                )
            if mode == "host":
                logger.warning(
                    "eval_devices is ignored by the host pipeline "
                    "(cv2/numpy reference path runs single-chip); use "
                    "eval_pipeline device/device_bucketed for multi-chip"
                )
            elif n_eval > 1:
                eval_mesh = Mesh(
                    np.asarray(jax.devices()[:n_eval]), (DATA_AXIS,)
                )
                logger.info(
                    "eval mesh: %d chips, partition=%s",
                    n_eval, cfg.get("eval_partition") or "window",
                )
        evaluator = SlidingWindowEvaluator(
            model, variables,
            classes=cfg.classes, crop_h=cfg.test_h, crop_w=cfg.test_w,
            mean=mean, std=std, base_size=cfg.base_size, scales=cfg.scales,
            window_batch=cfg.get("window_batch") or 8,
            mode=mode,
            bucket=cfg.get("eval_bucket") or 128,
            mesh=eval_mesh,
            partition=cfg.get("eval_partition") or "window",
        )
        test(
            logger, test_data, evaluator, gray_folder, color_folder, colors
        )
    if cfg.split != "test":
        cal_acc(logger, test_data.data_list, gray_folder, cfg.classes, names)


def _jpeg_exif_orientation(f):
    """EXIF orientation (1-8) from an open JPEG positioned at an APP1
    payload start, or None. cv2.imread applies this orientation when
    decoding, so the shape probe must account for it."""
    import struct

    if f.read(6) != b"Exif\x00\x00":
        return None
    tiff = f.tell()
    order = f.read(2)
    if order == b"II":
        fmt = "<"
    elif order == b"MM":
        fmt = ">"
    else:
        return None
    if struct.unpack(fmt + "H", f.read(2))[0] != 42:
        return None
    (ifd_off,) = struct.unpack(fmt + "I", f.read(4))
    f.seek(tiff + ifd_off)
    (count,) = struct.unpack(fmt + "H", f.read(2))
    for _ in range(count):
        entry = f.read(12)
        tag, typ = struct.unpack(fmt + "HH", entry[:4])
        if tag == 0x0112 and typ == 3:  # orientation, SHORT
            return struct.unpack(fmt + "H", entry[8:10])[0]
    return None


def _image_shape(path):
    """Decoded (H, W) of an image file without reading the pixels when
    possible (PNG/JPEG header sniff, EXIF-orientation aware; cv2
    fallback)."""
    try:
        with open(path, "rb") as f:
            head = f.read(32)
            if head[:8] == b"\x89PNG\r\n\x1a\n":
                import struct

                w, h = struct.unpack(">II", head[16:24])
                return (h, w)
            if head[:2] == b"\xff\xd8":  # JPEG: walk segments for SOFn
                import struct

                f.seek(2)
                transposed = None
                hw = None
                while hw is None or transposed is None:
                    marker = f.read(2)
                    if len(marker) < 2 or marker[0] != 0xFF:
                        break
                    if marker[1] in (0xD9, 0xDA):
                        # EOI / SOS: entropy-coded data follows — no more
                        # walkable segments (EXIF must precede SOS).
                        break
                    (size,) = struct.unpack(">H", f.read(2))
                    payload_at = f.tell()
                    if 0xC0 <= marker[1] <= 0xCF and marker[1] not in (
                        0xC4, 0xC8, 0xCC,
                    ):
                        f.read(1)  # sample precision
                        hw = struct.unpack(">HH", f.read(4))
                        # keep walking: APP1 may legally follow SOF
                    elif marker[1] == 0xE1 and transposed is None:  # APP1
                        orient = _jpeg_exif_orientation(f)
                        transposed = orient in (5, 6, 7, 8)
                    f.seek(payload_at + size - 2)
                if hw is not None:
                    h, w = hw
                    return (w, h) if transposed else (h, w)
    except Exception:
        pass
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    return img.shape[:2]


def test(logger, test_data, evaluator, gray_folder, color_folder, colors,
         pipeline_depth=3):
    logger.info(">>>>>>>>>>>>>>>> Start Evaluation >>>>>>>>>>>>>>>>")
    from collections import deque

    from semseg_tpu.utils import AverageMeter, check_makedirs, colorize

    check_makedirs(gray_folder)
    check_makedirs(color_folder)

    def save(idx, gray):
        color = colorize(gray, colors)
        image_path, _ = test_data.data_list[idx]
        image_name = os.path.splitext(os.path.basename(image_path))[0]
        cv2.imwrite(os.path.join(gray_folder, image_name + ".png"), gray)
        color.save(os.path.join(color_folder, image_name + ".png"))

    data_time, batch_time = AverageMeter(), AverageMeter()
    device_mode = getattr(evaluator, "mode", "host") in (
        "device", "device_bucketed"
    )
    # Device pipelines dispatch asynchronously: keep several images in
    # flight so upload, compute and readback overlap across images
    # (exactly the wire bench.py measures) instead of a full host sync
    # per image. Host mode stays serial (reference-faithful path).
    depth = max(1, pipeline_depth) if device_mode else 0
    pending = deque()
    end = time.time()
    n = len(test_data)
    for i in range(n):
        image, _ = test_data[i]
        image = np.ascontiguousarray(image)
        if device_mode and image.dtype != np.uint8:
            # Decoded pixels are integer-valued [0,255] floats here;
            # shipping them as uint8 quarters the host->device bytes of
            # this upload-bound pipeline, bit-exactly (the device program
            # casts back to f32 before any arithmetic).
            image = image.astype(np.uint8)
        data_time.update(time.time() - end)
        if device_mode:
            pending.append((i, evaluator.predict_async(image)))
            while len(pending) > depth:
                j, lazy = pending.popleft()
                save(j, np.asarray(lazy))
        else:
            save(i, evaluator.predict(image))
        batch_time.update(time.time() - end)
        end = time.time()
        if (i + 1) % 10 == 0 or i + 1 == n:
            logger.info(
                "Test: [%d/%d] Data %.3f (%.3f) Batch %.3f (%.3f).",
                i + 1, n, data_time.val, data_time.avg,
                batch_time.val, batch_time.avg,
            )
    while pending:
        j, lazy = pending.popleft()
        save(j, np.asarray(lazy))
    logger.info("<<<<<<<<<<<<<<<<< End Evaluation <<<<<<<<<<<<<<<<<")


def cal_acc(logger, data_list, pred_folder, classes, names):
    from semseg_tpu.utils import AverageMeter
    from semseg_tpu.utils.metrics import intersection_and_union, summarize

    intersection_meter = AverageMeter()
    union_meter = AverageMeter()
    target_meter = AverageMeter()

    for i, (image_path, target_path) in enumerate(data_list):
        image_name = os.path.splitext(os.path.basename(image_path))[0]
        pred = cv2.imread(
            os.path.join(pred_folder, image_name + ".png"), cv2.IMREAD_GRAYSCALE
        )
        target = cv2.imread(target_path, cv2.IMREAD_GRAYSCALE)
        intersection, union, target_hist = intersection_and_union(
            pred, target, classes
        )
        intersection_meter.update(intersection)
        union_meter.update(union)
        target_meter.update(target_hist)
        accuracy = sum(intersection_meter.val) / (sum(target_meter.val) + 1e-10)
        logger.info(
            "Evaluating %d/%d on image %s, accuracy %.4f.",
            i + 1, len(data_list), image_name + ".png", accuracy,
        )

    m_iou, m_acc, all_acc = summarize(
        intersection_meter.sum, union_meter.sum, target_meter.sum
    )
    logger.info(
        "Eval result: mIoU/mAcc/allAcc %.4f/%.4f/%.4f.", m_iou, m_acc, all_acc
    )
    iou_class = intersection_meter.sum / (union_meter.sum + 1e-10)
    accuracy_class = intersection_meter.sum / (target_meter.sum + 1e-10)
    for i in range(classes):
        logger.info(
            "Class_%d result: iou/accuracy %.4f/%.4f, name: %s.",
            i, iou_class[i], accuracy_class[i], names[i],
        )
    return m_iou, m_acc, all_acc


if __name__ == "__main__":
    main()
