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
    """Auto = fused on TPU (the flash kernel removed the size fallback);
    which Pallas kernel runs is a per-shape scoped-VMEM choice; explicit
    True/False and the `fused_attention` config key override the auto."""
    import semseg_tpu.models.psanet as psanet_mod
    from semseg_tpu.config import Config
    from semseg_tpu.models.psanet import use_fused_attention
    from semseg_tpu.ops.psa_pallas import (
        resident_vmem_bytes,
        select_psa_kernel,
    )

    monkeypatch.setattr(psanet_mod, "_on_tpu", lambda: True)
    # On TPU the auto rule is unconditional now: every hw has a fused
    # kernel (flash covers what the resident kernel can't hold in VMEM).
    assert use_fused_attention(None)
    # The shipped shrink_factor=2 recipes run the resident kernel
    # (minimal HBM traffic: x fetched once per batch row; measured
    # fastest everywhere it compiles) in bf16 AND f32 ...
    assert select_psa_kernel(512, 900, 2) == "resident"
    assert select_psa_kernel(512, 2025, 2) == "resident"
    assert select_psa_kernel(512, 2025, 4) == "resident"
    # ... while shrink_factor=1 extents (hw>=7000) run the flash kernel,
    # whose per-grid-step VMEM is hw-independent — round 3 auto-disabled
    # the fused path entirely here.
    assert select_psa_kernel(512, 8100, 2) == "flash"
    assert select_psa_kernel(512, 8100, 4) == "flash"
    # f32 operands double the resident kernel's streamed blocks; the
    # model accounts for it.
    assert resident_vmem_bytes(512, 2025, 4) > resident_vmem_bytes(
        512, 2025, 2)
    # The rule follows the chip's VMEM budget (env override for other
    # TPU generations).
    monkeypatch.setenv("SEMSEG_VMEM_BYTES", str(4 * 2 ** 20))
    assert select_psa_kernel(512, 2025, 2) == "flash"
    monkeypatch.delenv("SEMSEG_VMEM_BYTES")
    # Explicit override beats auto in both directions.
    assert use_fused_attention(True)
    assert not use_fused_attention(False)
    # Off-TPU auto is always the XLA path.
    monkeypatch.setattr(psanet_mod, "_on_tpu", lambda: False)
    assert not use_fused_attention(None)

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
