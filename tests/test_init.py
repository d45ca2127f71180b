"""Weight-init distribution parity vs the reference (PyTorch).

The reference applies kaiming_normal_(mode='fan_out', relu) + BN(1, 0)
only to modules inside ResNet.__init__ (reference ``model/resnet.py:
123-128``); every conv/linear created at the PSPNet/PSANet level — PPM
branches, seg heads, PSA reduce/attention/proj, classifier fc — keeps
PyTorch's default init (kaiming_uniform_ a=sqrt(5) => U(+-sqrt(1/fan_in)),
bias U(+-1/sqrt(fan_in))).  These tests pin both our initializer formulas
(vs torch empirically) and their *placement* in the assembled models.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from semseg_tpu.models.layers import (
    kaiming_normal_fan_out,
    torch_default_bias_init,
    torch_default_conv_init,
)


def test_kaiming_normal_fan_out_matches_torch():
    shape = (3, 3, 64, 128)  # HWIO
    k = np.asarray(
        kaiming_normal_fan_out(jax.random.PRNGKey(0), shape, jnp.float32)
    )
    fan_out = 128 * 9
    expected_std = (2.0 / fan_out) ** 0.5
    assert abs(np.std(k) / expected_std - 1) < 0.02

    w = torch.empty(128, 64, 3, 3)  # OIHW, same fan_out
    torch.nn.init.kaiming_normal_(w, mode="fan_out", nonlinearity="relu")
    assert abs(w.std().item() / expected_std - 1) < 0.02


def test_torch_default_conv_init_matches_torch_conv2d():
    shape = (3, 3, 512, 19)  # HWIO
    k = np.asarray(
        torch_default_conv_init(jax.random.PRNGKey(1), shape, jnp.float32)
    )
    fan_in = 512 * 9
    bound = fan_in ** -0.5
    assert k.max() <= bound and k.min() >= -bound
    # uniform(-b, b) std = b/sqrt(3)
    assert abs(np.std(k) / (bound / 3 ** 0.5) - 1) < 0.02

    conv = torch.nn.Conv2d(512, 19, 3)
    tw = conv.weight.detach().numpy()
    assert abs(tw.max() / bound - 1) < 0.05  # max hugs the same bound
    assert abs(np.std(tw) / np.std(k) - 1) < 0.05

    tb = conv.bias.detach().numpy()
    ours_b = np.asarray(
        torch_default_bias_init(fan_in)(
            jax.random.PRNGKey(2), (4096,), jnp.float32
        )
    )
    b_bound = 1.0 / fan_in ** 0.5
    assert np.abs(tb).max() <= b_bound and np.abs(ours_b).max() <= b_bound
    assert abs(np.std(ours_b) / (b_bound / 3 ** 0.5) - 1) < 0.05


@pytest.fixture(scope="module")
def pspnet_params():
    from semseg_tpu.models import PSPNet

    model = PSPNet(layers=50, classes=21, zoom_factor=8)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=True)
    return variables["params"]


def _is_uniform_with_conv_bound(kernel):
    """True if values look like U(+-sqrt(1/fan_in)) for this HWIO shape."""
    k = np.asarray(kernel)
    fan_in = k.shape[0] * k.shape[1] * k.shape[2]
    bound = fan_in ** -0.5
    inside = np.abs(k).max() <= bound * (1 + 1e-6)
    std_ok = abs(np.std(k) / (bound / 3 ** 0.5) - 1) < 0.1
    return inside and std_ok


def _is_kaiming_fan_out(kernel):
    k = np.asarray(kernel)
    fan_out = k.shape[0] * k.shape[1] * k.shape[3]
    expected_std = (2.0 / fan_out) ** 0.5
    return abs(np.std(k) / expected_std - 1) < 0.1


def test_backbone_convs_are_kaiming_heads_are_torch_default(pspnet_params):
    p = pspnet_params
    # Backbone: kaiming fan_out (reference model/resnet.py:123-128).
    assert _is_kaiming_fan_out(p["backbone"]["stem_cb2"]["conv"]["kernel"])
    assert _is_kaiming_fan_out(
        p["backbone"]["layer3_block0"]["cb2"]["conv"]["kernel"]
    )
    # PPM branch + head convs: torch Conv2d defaults (created bare in
    # reference model/pspnet.py:15, :64-70 — never re-initialized).
    assert _is_uniform_with_conv_bound(p["ppm"]["branch0"]["conv"]["kernel"])
    assert _is_uniform_with_conv_bound(p["cls"]["cb"]["conv"]["kernel"])
    assert _is_uniform_with_conv_bound(p["cls"]["conv_logits"]["kernel"])
    assert not _is_uniform_with_conv_bound(
        p["backbone"]["layer3_block0"]["cb2"]["conv"]["kernel"]
    )
    # Logit conv bias: U(+-1/sqrt(fan_in)), not zeros.
    bias = np.asarray(p["cls"]["conv_logits"]["bias"])
    b_bound = 1.0 / 512 ** 0.5
    assert np.abs(bias).max() <= b_bound
    assert np.abs(bias).max() > 0.0


def test_psa_convs_are_torch_default():
    from semseg_tpu.models import PSANet

    model = PSANet(
        layers=50, classes=5, zoom_factor=8, shrink_factor=2,
        mask_h=5, mask_w=5, compact=False, fused_attention=False,
    )
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 33, 33, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, x, train=False)
    psa = variables["params"]["psa"]
    for name in ("reduce", "attention_cb", "proj"):
        assert _is_uniform_with_conv_bound(psa[name]["conv"]["kernel"]), name
    assert _is_uniform_with_conv_bound(psa["attention_conv"]["kernel"])
