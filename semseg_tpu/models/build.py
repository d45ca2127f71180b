"""Model construction from experiment configs.

Includes the PSA mask-dimension derivation and architecture validation the
reference performs in its drivers (``tool/train.py:58-79``).
"""

from __future__ import annotations

import jax.numpy as jnp

from semseg_tpu.models.psanet import PSANet
from semseg_tpu.models.pspnet import PSPNet


def derive_psa_mask_dims(cfg):
    """Resolve (mask_h, mask_w) from crop size / shrink factor.

    Mutates nothing; returns the resolved pair. Mirrors the contract of the
    reference driver check (``tool/train.py:63-77``): compact mode uses the
    feature extent directly, otherwise the default full relative extent
    ``2*((crop-1)//(8*shrink)+1)-1``; explicit values must be odd, >= 3 and
    no larger than the full extent.
    """
    shrink = cfg.shrink_factor
    feat_h = (cfg.train_h - 1) // (8 * shrink) + 1
    feat_w = (cfg.train_w - 1) // (8 * shrink) + 1
    if cfg.compact:
        return feat_h, feat_w
    mask_h, mask_w = cfg.get("mask_h"), cfg.get("mask_w")
    if (mask_h is None) != (mask_w is None):
        raise ValueError("mask_h and mask_w must both be set or both unset")
    if mask_h is None:
        return 2 * feat_h - 1, 2 * feat_w - 1
    full_h, full_w = 2 * feat_h - 1, 2 * feat_w - 1
    if not (mask_h % 2 == 1 and 3 <= mask_h <= full_h):
        raise ValueError(f"mask_h={mask_h} invalid (odd, 3..{full_h})")
    if not (mask_w % 2 == 1 and 3 <= mask_w <= full_w):
        raise ValueError(f"mask_w={mask_w} invalid (odd, 3..{full_w})")
    return mask_h, mask_w


def validate_arch(cfg):
    """Architecture/shape invariants shared by all drivers."""
    if cfg.classes <= 1:
        raise ValueError("classes must be > 1")
    if cfg.zoom_factor not in (1, 2, 4, 8):
        raise ValueError(f"zoom_factor={cfg.zoom_factor} not in (1,2,4,8)")
    if cfg.arch not in ("psp", "psa"):
        raise ValueError(f"architecture {cfg.arch!r} not supported")
    if (cfg.train_h - 1) % 8 != 0 or (cfg.train_w - 1) % 8 != 0:
        raise ValueError("(train_h-1) and (train_w-1) must be multiples of 8")


def build_model(cfg, axis_name=None, dtype=jnp.float32, data_shards=1):
    """Build the flax model described by ``cfg``.

    Returns ``(model, resolved_cfg_updates)`` where updates carry derived
    values (PSA mask dims) the caller may want to record.
    ``data_shards``: data-axis size of the mesh the model will run on
    (sets the per-replica-group BN when ``sync_bn: False``).
    """
    validate_arch(cfg)
    # Optional f32-path speed knob (`matmul_precision: high` = 3-pass
    # bfloat16 decomposition on the MXU; default 'highest' = exact f32,
    # the reference-numerics contract). No effect under bf16 compute.
    from semseg_tpu.models.layers import set_bn_groups, set_precision_override

    set_precision_override(cfg.get("matmul_precision"))
    # `sync_bn: False` = the reference's per-GPU BatchNorm2d under DDP
    # (reference tool/train.py:141-142 converts to SyncBN only when set):
    # each data-parallel replica group normalizes with its own local-batch
    # moments. Default True = global-batch moments (SyncBN under GSPMD).
    set_bn_groups(1 if cfg.get("sync_bn", True) else max(1, int(data_shards)))
    updates = {}
    if cfg.arch == "psp":
        model = PSPNet(
            layers=cfg.layers,
            classes=cfg.classes,
            zoom_factor=cfg.zoom_factor,
            remat=bool(cfg.get("remat") or False),
            axis_name=axis_name,
            dtype=dtype,
        )
    else:
        mask_h, mask_w = derive_psa_mask_dims(cfg)
        updates["mask_h"], updates["mask_w"] = mask_h, mask_w
        # An empty normalization_factor defaults to mask_h*mask_w
        # (reference model/psanet.py:20-22).
        norm = cfg.get("normalization_factor")
        if norm is None:
            norm = float(mask_h * mask_w)
        model = PSANet(
            layers=cfg.layers,
            classes=cfg.classes,
            zoom_factor=cfg.zoom_factor,
            psa_type=cfg.psa_type,
            compact=bool(cfg.compact),
            shrink_factor=cfg.shrink_factor,
            mask_h=mask_h,
            mask_w=mask_w,
            normalization_factor=norm,
            psa_softmax=bool(cfg.psa_softmax),
            # None = auto (fused Pallas on TPU; resident-vs-flash kernel
            # choice is per-shape in ops/psa_pallas); True/False force.
            fused_attention=cfg.get("fused_attention"),
            remat=bool(cfg.get("remat") or False),
            axis_name=axis_name,
            dtype=dtype,
        )
    return model, updates
