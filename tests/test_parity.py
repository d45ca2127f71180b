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


@pytest.mark.parametrize("psa_type", [0, 1])
def test_psanet_single_direction_parity(reference_models, rng, psa_type):
    """psa_type=0 (collect) and 1 (distribute) full-model paths vs torch
    (reference ``model/psanet.py:53-98`` single-branch modes)."""
    from model.psanet import PSANet as TorchPSANet

    from semseg_tpu.models import PSANet

    mask_h = mask_w = 5
    kwargs = dict(
        layers=50, classes=7, zoom_factor=8, psa_type=psa_type,
        compact=False, shrink_factor=2, mask_h=mask_h, mask_w=mask_w,
        normalization_factor=1.0, psa_softmax=True,
    )
    torch_model = TorchPSANet(pretrained=False, **kwargs)
    x = rng.randn(1, 3, 33, 33).astype(np.float32)
    got, want = _convert_and_run(
        torch_model, "psa", 50, x, PSANet(**kwargs)
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_psanet_compact_parity(reference_models, rng):
    """compact=True: channels directly index absolute positions via the
    reference's transpose-view (``model/psanet.py:63-66,82-83``) — the
    trickiest pure-reshape path, asserted against torch end to end."""
    from model.psanet import PSANet as TorchPSANet

    from semseg_tpu.models import PSANet

    # compact mode: mask dims are the (shrunk) feature extent itself
    # (reference tool/train.py:66-70): 33x33 -> feat 5 -> shrink 2 -> 3.
    kwargs = dict(
        layers=50, classes=7, zoom_factor=8, psa_type=2,
        compact=True, shrink_factor=2, mask_h=3, mask_w=3,
        normalization_factor=1.0, psa_softmax=True,
    )
    torch_model = TorchPSANet(pretrained=False, **kwargs)
    x = rng.randn(1, 3, 33, 33).astype(np.float32)
    got, want = _convert_and_run(
        torch_model, "psa", 50, x, PSANet(**kwargs)
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


def test_export_pth_round_trip(reference_models, rng, tmp_path):
    """Interop in the reverse direction: OUR variables -> ``.pth`` ->
    reference torch model forward parity. strict=True load pins the exact
    reference key naming (``model/pspnet.py`` module tree)."""
    from model.pspnet import PSPNet as TorchPSPNet

    from semseg_tpu.models import PSPNet
    from semseg_tpu.models.convert import export_pth, export_torch_state_dict

    model = PSPNet(layers=50, classes=11, zoom_factor=8)
    x = rng.randn(1, 33, 33, 3).astype(np.float32)
    rng_key = jax.random.PRNGKey(3)
    variables = jax.jit(
        lambda r, xs: model.init({"params": r, "dropout": r}, xs, train=True)
    )(rng_key, jnp.asarray(x))

    ours = np.asarray(
        jax.jit(lambda v, xs: model.apply(v, xs, train=False))(
            variables, jnp.asarray(x)
        )
    )

    torch_model = TorchPSPNet(
        layers=50, classes=11, zoom_factor=8, pretrained=False
    )
    sd = export_torch_state_dict(variables, "psp", 50, ddp_prefix=False)
    missing, unexpected = torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    assert not missing and not unexpected
    torch_model.eval()
    with torch.no_grad():
        want = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)

    # File format: DDP-prefixed .pth the reference test driver loads
    # (tool/test.py:107-116 creates DataParallel then strict=False load).
    path = export_pth(str(tmp_path / "ours.pth"), variables, "psp", 50, epoch=5)
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert ckpt["epoch"] == 5
    assert all(k.startswith("module.") for k in ckpt["state_dict"])


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
