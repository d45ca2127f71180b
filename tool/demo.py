"""Single-image inference demo.

Usage (matches the reference ``tool/demo.py``):
    python tool/demo.py --config config/ade20k/ade20k_pspnet50.yaml \
        image figure/demo/ADE_val_00001515.jpg TEST.scales '[1.0]'

Runs multi-scale sliding-window inference on one image and writes
``<name>_gray.png`` / ``<name>_color.png`` next to it. CPU-runnable.

Note: the reference demo discards its scale-accumulation loop and keeps
only the last scale (``tool/demo.py:170-181``); this implementation
averages over all requested scales (the intended behavior — identical
output at ``scales=[1.0]``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def main():
    from semseg_tpu.config import load_cfg, merge_cfg_from_list

    import argparse

    parser = argparse.ArgumentParser(description="TPU semseg demo")
    parser.add_argument(
        "--config", type=str,
        default="config/ade20k/ade20k_pspnet50.yaml",
    )
    parser.add_argument("--image", type=str, default=None)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    cfg = load_cfg(args.config)
    opts = list(args.opts or [])
    # Demo-only keys accepted through the generic KEY VALUE stream even
    # though they are not part of the experiment YAML schema.
    for extra in ("image", "allow_random_weights", "eval_pipeline",
                  "window_batch", "eval_devices", "eval_partition"):
        if extra in opts:
            idx = opts.index(extra)
            from semseg_tpu.config import _decode_value

            cfg[extra] = _decode_value(opts[idx + 1])
            del opts[idx : idx + 2]
    if args.image:
        cfg["image"] = args.image
    if opts:
        cfg = merge_cfg_from_list(cfg, opts)
    if not cfg.get("image"):
        raise SystemExit("provide an input via --image or 'image <path>'")
    run(cfg)


def run(cfg):
    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.checkpoint import load_model_variables
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
    from semseg_tpu.models.build import build_model, validate_arch
    from semseg_tpu.utils import colorize
    from semseg_tpu.utils.misc import get_logger

    logger = get_logger()
    validate_arch(cfg)

    value_scale = 255
    mean = [0.485 * value_scale, 0.456 * value_scale, 0.406 * value_scale]
    std = [0.229 * value_scale, 0.224 * value_scale, 0.225 * value_scale]

    model, updates = build_model(cfg, dtype=jnp.float32)
    for k, v in updates.items():
        cfg[k] = v

    if os.path.isfile(cfg.model_path) or os.path.isdir(cfg.model_path):
        logger.info("=> loading checkpoint '%s'", cfg.model_path)
        variables = load_model_variables(cfg.model_path, cfg.arch, cfg.layers)
        variables = jax.tree.map(jnp.asarray, variables)
    elif cfg.get("allow_random_weights"):
        logger.warning("=> no checkpoint; using RANDOM weights (smoke mode)")
        rng = jax.random.PRNGKey(0)
        sample = jnp.zeros((1, cfg.test_h, cfg.test_w, 3), jnp.float32)
        variables = jax.jit(
            lambda r, x: model.init({"params": r, "dropout": r}, x, train=False)
        )(rng, sample)
    else:
        raise RuntimeError(f"=> no checkpoint found at '{cfg.model_path}'")

    # Single-image multi-chip: `eval_devices N eval_partition spatial`
    # splits each window's convolutions across chips (GSPMD halo
    # exchange) — the latency-oriented layout for one huge image.
    eval_mesh = None
    n_eval = cfg.get("eval_devices")
    if n_eval:
        from jax.sharding import Mesh

        from semseg_tpu.parallel.mesh import DATA_AXIS

        n_eval = jax.device_count() if n_eval == "all" else int(n_eval)
        if n_eval > 1:
            import numpy as _np

            eval_mesh = Mesh(_np.asarray(jax.devices()[:n_eval]), (DATA_AXIS,))
    evaluator = SlidingWindowEvaluator(
        model, variables,
        classes=cfg.classes, crop_h=cfg.test_h, crop_w=cfg.test_w,
        mean=mean, std=std, base_size=cfg.base_size, scales=cfg.scales,
        window_batch=cfg.get("window_batch") or 8,
        mode=cfg.get("eval_pipeline") or "device",
        mesh=eval_mesh,
        partition=cfg.get("eval_partition") or "window",
    )

    image_path = cfg.image
    bgr = cv2.imread(image_path, cv2.IMREAD_COLOR)
    if bgr is None:
        raise RuntimeError(f"failed to read image {image_path}")
    image = np.float32(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))
    logger.info(">>>>>>>>>>>>>>>> Start Prediction >>>>>>>>>>>>>>>>")
    gray = evaluator.predict(image)
    logger.info("<<<<<<<<<<<<<<<<< End Prediction <<<<<<<<<<<<<<<<<")

    colors = np.loadtxt(cfg.colors_path).astype("uint8")
    color = colorize(gray, colors)
    stem = os.path.splitext(image_path)[0]
    gray_path, color_path = stem + "_gray.png", stem + "_color.png"
    cv2.imwrite(gray_path, gray)
    color.save(color_path)
    logger.info("Result saved to %s and %s", gray_path, color_path)
    return gray


if __name__ == "__main__":
    main()
