"""Full-model eval parity against the PyTorch reference implementation.

The reference package at /root/reference is imported read-only (torch CPU)
with randomly initialized weights; its state_dict is converted through
``semseg_tpu.models.convert`` and both frameworks must produce matching
logits in eval mode. This validates the converter, layer numerics, the
dilation surgery, PPM/PSA assembly, and align-corners resizes end to end.

``lib.psa``'s C++ extension cannot build against modern torch, so a
numpy-oracle stub (same semantics as ``lib/psa/src/cpu/psamask.cpp``) is
injected for PSANet.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"

pytestmark = pytest.mark.slow


def _install_reference_path():
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)


def _install_psa_stub():
    """Provide lib.psa.functional.psa_mask backed by the numpy oracle."""
    from tests.test_ops import psamask_oracle

    def psa_mask(input_, psa_type, mask_h, mask_w):
        buf = psamask_oracle(
            input_.detach().numpy(), psa_type, mask_h, mask_w
        )
        return torch.from_numpy(buf)

    functional = types.ModuleType("lib.psa.functional")
    functional.psa_mask = psa_mask
    lib = types.ModuleType("lib")
    lib_psa = types.ModuleType("lib.psa")
    lib_psa.functional = functional
    sys.modules.setdefault("lib", lib)
    sys.modules["lib.psa"] = lib_psa
    sys.modules["lib.psa.functional"] = functional


@pytest.fixture(scope="module")
def reference_models():
    _install_reference_path()
    _install_psa_stub()
    torch.manual_seed(0)
    return True


def _convert_and_run(torch_model, arch, layers, x_nchw, jax_model):
    from semseg_tpu.models.convert import convert_torch_state_dict

    torch_model.eval()
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x_nchw)).permute(0, 2, 3, 1).numpy()

    variables, unused = convert_torch_state_dict(
        torch_model.state_dict(), arch, layers
    )
    assert not unused, f"unconverted torch keys: {unused}"
    variables = jax.tree.map(jnp.asarray, variables)
    got = np.asarray(
        jax.jit(lambda v, xs: jax_model.apply(v, xs, train=False))(
            variables, jnp.asarray(x_nchw.transpose(0, 2, 3, 1))
        )
    )
    return got, want


def test_pspnet50_eval_parity(reference_models, rng):
    from model.pspnet import PSPNet as TorchPSPNet

    from semseg_tpu.models import PSPNet

    torch_model = TorchPSPNet(
        layers=50, classes=11, zoom_factor=8, pretrained=False
    )
    x = rng.randn(1, 3, 33, 33).astype(np.float32)
    got, want = _convert_and_run(
        torch_model, "psp", 50, x, PSPNet(layers=50, classes=11, zoom_factor=8)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_psanet50_eval_parity(reference_models, rng):
    from model.psanet import PSANet as TorchPSANet

    from semseg_tpu.models import PSANet

    mask_h = mask_w = 5  # full extent for 33x33 input at shrink 2
    torch_model = TorchPSANet(
        layers=50, classes=7, zoom_factor=8, psa_type=2, compact=False,
        shrink_factor=2, mask_h=mask_h, mask_w=mask_w,
        normalization_factor=1.0, psa_softmax=True, pretrained=False,
    )
    x = rng.randn(1, 3, 33, 33).astype(np.float32)
    got, want = _convert_and_run(
        torch_model, "psa", 50, x,
        PSANet(
            layers=50, classes=7, zoom_factor=8, psa_type=2, compact=False,
            shrink_factor=2, mask_h=mask_h, mask_w=mask_w,
            normalization_factor=1.0, psa_softmax=True,
        ),
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_pspnet101_eval_parity(reference_models, rng):
    """Covers the 101-depth block-count table in the converter."""
    from model.pspnet import PSPNet as TorchPSPNet

    from semseg_tpu.models import PSPNet

    torch_model = TorchPSPNet(
        layers=101, classes=5, zoom_factor=8, pretrained=False
    )
    x = rng.randn(1, 3, 25, 25).astype(np.float32)
    got, want = _convert_and_run(
        torch_model, "psp", 101, x,
        PSPNet(layers=101, classes=5, zoom_factor=8),
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_imagenet_resnet_converter(reference_models, rng):
    """Backbone-only converter: raw torch deep-base ResNet state_dict."""
    from model.resnet import resnet50 as torch_resnet50

    from semseg_tpu.models.convert import convert_imagenet_resnet

    tm = torch_resnet50(pretrained=False, deep_base=True)
    variables, unused = convert_imagenet_resnet(tm.state_dict(), 50)
    assert not unused, unused
    # All stem + 16 blocks present
    assert "stem_cb3" in variables["params"]["backbone"]
    assert "layer4_block2" in variables["params"]["backbone"]
    assert "fc" in variables["params"]
