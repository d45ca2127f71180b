"""Model-zoo construction and config-driven build coverage."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semseg_tpu.config import load_cfg
from semseg_tpu.models import PSANet, PSPNet, resnet18, resnet50
from semseg_tpu.models.build import build_model, derive_psa_mask_dims, validate_arch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ALL_CONFIGS = [
    os.path.join(REPO, "config", d, f)
    for d in ("ade20k", "voc2012", "cityscapes")
    for f in sorted(os.listdir(os.path.join(REPO, "config", d)))
    if f.endswith(".yaml")
]


@pytest.mark.parametrize("path", ALL_CONFIGS, ids=lambda p: os.path.basename(p))
def test_build_model_from_every_config(path):
    cfg = load_cfg(path)
    model, updates = build_model(cfg)
    if cfg.arch == "psp":
        assert isinstance(model, PSPNet)
        assert model.layers == cfg.layers
    else:
        assert isinstance(model, PSANet)
        feat = (cfg.train_h - 1) // (8 * cfg.shrink_factor) + 1
        assert updates["mask_h"] == 2 * feat - 1
        assert model.mask_h == updates["mask_h"]


def test_derive_psa_mask_dims_compact_and_explicit():
    from semseg_tpu.config import Config

    base = dict(train_h=465, train_w=465, shrink_factor=2, compact=0,
                mask_h=None, mask_w=None)
    cfg = Config(base)
    assert derive_psa_mask_dims(cfg) == (59, 59)
    cfg = Config({**base, "compact": 1})
    assert derive_psa_mask_dims(cfg) == (30, 30)
    cfg = Config({**base, "mask_h": 31, "mask_w": 33})
    assert derive_psa_mask_dims(cfg) == (31, 33)
    with pytest.raises(ValueError):
        derive_psa_mask_dims(Config({**base, "mask_h": 4, "mask_w": 5}))
    with pytest.raises(ValueError):
        derive_psa_mask_dims(Config({**base, "mask_h": 61, "mask_w": 61}))


def test_matmul_precision_knob_plumbs_through_build():
    """`matmul_precision: high` switches the f32 conv precision policy to
    the 3-pass bf16 decomposition; absence resets to exact 'highest' (the
    override must not leak between builds); bad values error."""
    from semseg_tpu.config import Config
    from semseg_tpu.models.layers import default_precision

    base = dict(classes=10, zoom_factor=8, arch="psp", layers=50,
                train_h=473, train_w=473)
    try:
        build_model(Config({**base, "matmul_precision": "high"}))
        assert default_precision(jnp.float32) == "high"
        assert default_precision(jnp.bfloat16) is None  # bf16 unaffected
        build_model(Config(base))
        assert default_precision(jnp.float32) == "highest"
        with pytest.raises(ValueError):
            build_model(Config({**base, "matmul_precision": "medium"}))
    finally:
        from semseg_tpu.models.layers import set_precision_override

        set_precision_override(None)


def test_fused_attention_auto_rule_and_config_plumb(monkeypatch):
    """Auto fused-kernel choice is a scoped-VMEM model (batch does not
    enter — per-grid-step VMEM is batch-independent); explicit
    True/False and the `fused_attention` config key override it."""
    import semseg_tpu.models.psanet as psanet_mod
    from semseg_tpu.config import Config
    from semseg_tpu.models.psanet import (
        fused_attention_vmem_bytes,
        use_fused_attention,
    )

    monkeypatch.setattr(psanet_mod, "_on_tpu", lambda: True)
    # Every shipped recipe fits: ADE (hw=900) and Cityscapes-PSA
    # (hw=2025) at any batch — the VMEM-OOM that capped round 2's
    # monolithic backward kernel is gone with the split kernels.
    assert use_fused_attention(None, 16, 900)
    assert use_fused_attention(None, 8, 2025)
    assert use_fused_attention(None, 16, 2025)
    # A shrink_factor=1 Cityscapes extent (hw=8100) blows the dx
    # accumulator block past VMEM -> auto picks the XLA path.
    assert not use_fused_attention(None, 1, 8100)
    # f32 operands double the streamed blocks; the model accounts for it
    # (hw=2025 f32 still fits; the budget binds ~2x earlier).
    assert fused_attention_vmem_bytes(512, 2025, 4) > \
        fused_attention_vmem_bytes(512, 2025, 2)
    # The rule follows the chip's VMEM budget (env override for other
    # TPU generations).
    monkeypatch.setenv("SEMSEG_VMEM_BYTES", str(4 * 2 ** 20))
    assert not use_fused_attention(None, 16, 2025)
    monkeypatch.delenv("SEMSEG_VMEM_BYTES")
    # Explicit override beats auto in both directions.
    assert use_fused_attention(True, 8, 8100)
    assert not use_fused_attention(False, 1, 1)
    # Off-TPU auto is always the XLA path.
    monkeypatch.setattr(psanet_mod, "_on_tpu", lambda: False)
    assert not use_fused_attention(None, 1, 1)

    cfg = Config(dict(
        arch="psa", layers=50, classes=19, zoom_factor=8, train_h=705,
        train_w=705, psa_type=2, compact=0, shrink_factor=2, mask_h=None,
        mask_w=None, normalization_factor=1.0, psa_softmax=1,
        fused_attention=False,
    ))
    model, _ = build_model(cfg)
    assert model.fused_attention is False
    cfg.pop("fused_attention")
    model, _ = build_model(cfg)
    assert model.fused_attention is None


def test_validate_arch_rejects_bad_configs():
    from semseg_tpu.config import Config

    good = dict(classes=10, zoom_factor=8, arch="psp", train_h=473, train_w=473)
    validate_arch(Config(good))
    with pytest.raises(ValueError):
        validate_arch(Config({**good, "classes": 1}))
    with pytest.raises(ValueError):
        validate_arch(Config({**good, "zoom_factor": 3}))
    with pytest.raises(ValueError):
        validate_arch(Config({**good, "arch": "deeplab"}))
    with pytest.raises(ValueError):
        validate_arch(Config({**good, "train_h": 474}))


@pytest.mark.slow
def test_basic_block_resnet18_forward(rng):
    """BasicBlock path (18/34) — construction, shapes, classifier head."""
    from semseg_tpu.models.resnet import ResNetClassifier

    model = resnet18(seg=True)
    x = jnp.asarray(rng.rand(1, 33, 33, 3).astype(np.float32))
    variables = jax.jit(lambda r, xs: model.init(r, xs, train=False))(
        jax.random.PRNGKey(0), x
    )
    c1, c2, c3, c4 = jax.jit(
        lambda v, xs: model.apply(v, xs, train=False)
    )(variables, x)
    # output stride 8 with seg dilation config; channels 64/128/256/512
    assert c4.shape == (1, 5, 5, 512)
    assert c3.shape == (1, 5, 5, 256)

    clf = ResNetClassifier(depth=18, num_classes=10)
    cv = jax.jit(lambda r, xs: clf.init(r, xs, train=False))(
        jax.random.PRNGKey(0), x
    )
    logits = jax.jit(lambda v, xs: clf.apply(v, xs, train=False))(cv, x)
    assert logits.shape == (1, 10)


@pytest.mark.slow
def test_zoom_factor_output_sizes(rng):
    """zoom_factor scales the logits grid: (H-1)/8*zoom+1."""
    x = jnp.asarray(rng.rand(1, 33, 33, 3).astype(np.float32))
    for zoom, want in ((1, 5), (2, 9), (4, 17), (8, 33)):
        model = PSPNet(layers=50, classes=3, zoom_factor=zoom)
        variables = jax.jit(
            lambda r, xs, m=model: m.init({"params": r, "dropout": r}, xs, train=False)
        )(jax.random.PRNGKey(0), x)
        out = jax.jit(
            lambda v, xs, m=model: m.apply(v, xs, train=False)
        )(variables, x)
        assert out.shape == (1, want, want, 3), (zoom, out.shape)
