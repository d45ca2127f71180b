"""Export a trained checkpoint as a deployment artifact.

The reference's only "deployment" path is re-running ``tool/test.py`` with
the framework + model source + a ``.pth`` (``tool/test.py:99-116``). This
driver produces standalone artifacts instead:

- ``export_format stablehlo`` (default): a serialized ``jax.export``
  program of the eval forward — weights baked in as constants, symbolic
  batch dimension, loadable WITHOUT this package
  (``semseg_tpu.engine.export.load_serving``). The TPU-native serving
  unit: ship the artifact, not the framework.
- ``export_format pth``: a reference-format torch state_dict, so the
  reference's own tools can consume checkpoints trained here (the
  interop inverse of loading reference ``.pth`` files).

Usage:
    python tool/export.py --config config/ade20k/ade20k_pspnet50.yaml \
        model_path exp/.../train_epoch_100.ckpt \
        export_path /tmp/pspnet50_serving.shlo \
        [export_format stablehlo] [export_output probs|logits|pred] \
        [export_platforms "['tpu','cpu']"] \
        [export_scope crop|full export_h <H> export_w <W>]

``export_scope full`` serializes the ENTIRE fused sliding-window program
(scale resize -> mean pad -> window grid + flip TTA -> count-normalized
stitch -> prob resize -> ms average -> uint8 argmax) for a fixed input
(export_h, export_w) with the config's TEST scales/base_size/crop — the
complete ``tool/test.py`` contract as one artifact. Default ``crop``
exports the batch-polymorphic per-crop forward (the ``net_process``
analog).

Note on PSANet: a portable (cross-platform) artifact must not embed the
Mosaic TPU custom call, so export builds PSA models with
``fused_attention False`` unless the config forces it (the pure-XLA
attention path — numerically interchangeable, see tests/test_psa_pallas).
A TPU-targeted export (``export_platforms "['tpu']"``) keeps the fused
Pallas attention kernel in the artifact (Mosaic custom call allowed);
see the version-compat note in ``semseg_tpu/engine/export.py`` — pin the
exporting jax version in deployment metadata and re-export when the
serving runtime rolls past jax.export's Mosaic compatibility window.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from semseg_tpu.config import parse_config_args

    cfg = parse_config_args(
        default_config="config/ade20k/ade20k_pspnet50.yaml"
    )
    run(cfg)


def run(cfg):
    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.checkpoint import export_pth, load_model_variables
    from semseg_tpu.engine.export import export_serving, save_serving
    from semseg_tpu.models.build import build_model, validate_arch
    from semseg_tpu.utils.misc import get_logger

    logger = get_logger()
    validate_arch(cfg)
    out_path = cfg.get("export_path")
    if not out_path:
        raise ValueError("export_path is required (CLI: export_path <file>)")
    fmt = cfg.get("export_format") or "stablehlo"
    if not (os.path.isfile(cfg.model_path) or os.path.isdir(cfg.model_path)):
        raise RuntimeError(f"=> no checkpoint found at '{cfg.model_path}'")

    if fmt == "pth":
        export_pth(cfg.model_path, out_path, cfg.arch, cfg.layers)
        logger.info("=> exported reference .pth: %s", out_path)
        return out_path
    if fmt != "stablehlo":
        raise ValueError(f"unknown export_format {fmt!r}")

    platforms = cfg.get("export_platforms")
    tpu_only = bool(platforms) and all(p == "tpu" for p in platforms)
    # Portable artifact: keep the attention on the pure-XLA path unless
    # the config explicitly forces the fused kernel OR the export is
    # TPU-targeted (export_platforms "['tpu']"), where the Mosaic custom
    # call is servable and the fused kernel stays (version-compat note in
    # engine/export.py — re-export when the serving runtime rolls past
    # jax.export's Mosaic compatibility window).
    if cfg.arch == "psa" and cfg.get("fused_attention") is None:
        # explicit, not backend-auto: the artifact must not depend on the
        # exporting process's platform
        cfg["fused_attention"] = tpu_only
    allow_tpu_cc = bool(
        tpu_only and cfg.arch == "psa" and cfg.get("fused_attention")
    )
    model, updates = build_model(cfg, dtype=jnp.float32)
    for k, v in updates.items():
        cfg[k] = v
    variables = jax.tree.map(
        jnp.asarray, load_model_variables(cfg.model_path, cfg.arch, cfg.layers)
    )

    value_scale = 255
    mean = [0.485 * value_scale, 0.456 * value_scale, 0.406 * value_scale]
    std = [0.229 * value_scale, 0.224 * value_scale, 0.225 * value_scale]
    scope = cfg.get("export_scope") or "crop"
    if scope == "full":
        from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
        from semseg_tpu.engine.export import export_sliding_window

        h, w = cfg.get("export_h"), cfg.get("export_w")
        if not (h and w):
            raise ValueError(
                "export_scope full requires export_h/export_w (the window "
                "grid is static per input shape)")
        evaluator = SlidingWindowEvaluator(
            model, variables, classes=cfg.classes,
            crop_h=cfg.get("test_h") or cfg.train_h,
            crop_w=cfg.get("test_w") or cfg.train_w,
            mean=mean, std=std,
            base_size=cfg.get("base_size") or max(h, w),
            scales=list(cfg.get("scales") or [1.0]),
        )
        exported = export_sliding_window(
            evaluator, int(h), int(w), platforms=platforms,
            allow_tpu_custom_calls=allow_tpu_cc)
    elif scope == "crop":
        exported = export_serving(
            model, variables,
            crop_h=cfg.get("test_h") or cfg.train_h,
            crop_w=cfg.get("test_w") or cfg.train_w,
            mean=mean, std=std,
            output=cfg.get("export_output") or "probs",
            platforms=platforms,
            allow_tpu_custom_calls=allow_tpu_cc,
        )
    else:
        raise ValueError(f"unknown export_scope {scope!r}")
    save_serving(out_path, exported)
    logger.info(
        "=> exported serving program: %s (platforms=%s, %.1f MB)",
        out_path, list(exported.platforms), os.path.getsize(out_path) / 1e6,
    )
    return out_path


if __name__ == "__main__":
    main()
