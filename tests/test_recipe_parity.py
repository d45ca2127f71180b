"""Recipe-scale parity evidence vs the PyTorch reference.

Two levels above the 33x33 smoke parity of ``test_parity.py``:

1. Full-crop logit parity: PSPNet50 at the ADE20K recipe's 473x473 crop
   with 150 classes, random weights (reference ``tool/train.py:121-126``
   builds exactly this model; ``config/ade20k/ade20k_pspnet50.yaml``).
2. Demo-image golden: the complete single-scale sliding-window pipeline
   (reference ``tool/demo.py:106-189`` / ``tool/test.py:122-178``) on the
   bundled ``figure/demo/ADE_val_00001515.jpg`` with a fixed-seed
   checkpoint. The torch reference pipeline's gray map is pinned as a
   committed fixture (``tests/fixtures/demo_golden_gray.png``); our demo
   driver (host mode = reference-faithful numerics) and the TPU device
   pipeline must reproduce it.

Tolerances (documented per VERDICT):
- logits: rtol 1e-3 / atol 1e-4 (f32 accumulation-order differences
  across conv backends over a 50-layer net);
- host-mode gray map: >= 99.9% pixel agreement with the fixture (the
  remaining pixels are argmax ties flipped by <1e-4 logit noise);
- device-mode gray map: >= 99.5% agreement and probs atol 2e-2 (the
  device pipeline resizes with MXU matmul kernels on the same cv2
  half-pixel grid; tiny interpolation differences move near-tie argmaxes).

Regenerate the fixture with:
    SEMSEG_REGEN_GOLDEN=1 python -m pytest tests/test_recipe_parity.py -k golden
"""

import os
import sys

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "demo_golden_gray.png")
DEMO_IMAGE = os.path.join(REPO, "figure", "demo", "ADE_val_00001515.jpg")

pytestmark = pytest.mark.slow

CLASSES = 150
CROP = 473
BASE_SIZE = 512
MEAN = np.float32([0.485, 0.456, 0.406]) * 255
STD = np.float32([0.229, 0.224, 0.225]) * 255


@pytest.fixture(scope="module")
def torch_pspnet50():
    """Fixed-seed reference PSPNet50 at the ADE20K recipe configuration."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from model.pspnet import PSPNet as TorchPSPNet

    torch.manual_seed(0)
    model = TorchPSPNet(
        layers=50, classes=CLASSES, zoom_factor=8, pretrained=False
    )
    model.eval()
    return model


def _converted_variables(torch_model):
    from semseg_tpu.models.convert import convert_torch_state_dict

    variables, unused = convert_torch_state_dict(
        torch_model.state_dict(), "psp", 50
    )
    assert not unused, unused
    return jax.tree.map(jnp.asarray, variables)


def test_pspnet50_full_crop_logit_parity(torch_pspnet50, rng):
    """473x473 / 150-class eval logits match the torch reference."""
    from semseg_tpu.models import PSPNet

    x = rng.randn(1, 3, CROP, CROP).astype(np.float32)
    with torch.no_grad():
        want = (
            torch_pspnet50(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()
        )
    model = PSPNet(layers=50, classes=CLASSES, zoom_factor=8)
    variables = _converted_variables(torch_pspnet50)
    got = np.asarray(
        jax.jit(lambda v, xs: model.apply(v, xs, train=False))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    )
    assert got.shape == want.shape == (1, CROP, CROP, CLASSES)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_psanet50_full_crop_logit_parity(rng):
    """ADE20K PSANet50 recipe-scale parity: 465x465 crop, 150 classes,
    bi-direction PSA with the derived 59x59 mask at shrink 2 (reference
    ``tool/train.py:70-72`` mask-dim derivation,
    ``config/ade20k/ade20k_psanet50.yaml``). One level above
    ``test_parity.py``'s 33x33 PSA smoke tests: the full-extent mask,
    the 30x30 shrunk attention grid, and the recipe head widths."""
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from tests.test_parity import _install_psa_stub

    _install_psa_stub()
    from model.psanet import PSANet as TorchPSANet

    from semseg_tpu.models import PSANet
    from semseg_tpu.models.convert import convert_torch_state_dict

    crop = 465
    mask = 2 * ((crop - 1) // (8 * 2) + 1) - 1  # 59, as the driver derives
    torch.manual_seed(0)
    torch_model = TorchPSANet(
        layers=50, classes=CLASSES, zoom_factor=8, psa_type=2, compact=False,
        shrink_factor=2, mask_h=mask, mask_w=mask, normalization_factor=1.0,
        psa_softmax=True, pretrained=False,
    )
    torch_model.eval()
    x = rng.randn(1, 3, crop, crop).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x)).permute(0, 2, 3, 1).numpy()

    variables, unused = convert_torch_state_dict(
        torch_model.state_dict(), "psa", 50
    )
    assert not unused, unused
    variables = jax.tree.map(jnp.asarray, variables)
    model = PSANet(
        layers=50, classes=CLASSES, zoom_factor=8, psa_type=2, compact=False,
        shrink_factor=2, mask_h=mask, mask_w=mask, normalization_factor=1.0,
        psa_softmax=True,
    )
    got = np.asarray(
        jax.jit(lambda v, xs: model.apply(v, xs, train=False))(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1))
        )
    )
    assert got.shape == want.shape == (1, crop, crop, CLASSES)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


# ---------------------------------------------------------------------------
# torch oracle pipeline (implements the documented reference semantics:
# tool/demo.py:106-189 == tool/test.py:122-178; written independently)
# ---------------------------------------------------------------------------

def _torch_net_process(model, window):
    """normalize -> [x, flip(x)] batch -> forward -> softmax -> flip-average
    (reference tool/test.py:122-146)."""
    x = torch.from_numpy(window.transpose(2, 0, 1).copy())
    x = (x - torch.from_numpy(MEAN)[:, None, None]) / torch.from_numpy(STD)[
        :, None, None
    ]
    batch = torch.stack([x, torch.flip(x, dims=[2])])
    with torch.no_grad():
        out = model(batch)
        if out.shape[2:] != batch.shape[2:]:
            out = F.interpolate(
                out, size=batch.shape[2:], mode="bilinear", align_corners=True
            )
        out = F.softmax(out, dim=1)
    probs = (out[0] + torch.flip(out[1], dims=[2])) / 2
    return probs.permute(1, 2, 0).numpy()


def _torch_scale_process(model, image, out_h, out_w):
    """mean-pad -> ceil(crop*2/3) sliding grid -> accumulate/count ->
    un-pad -> cv2 resize to original (reference tool/test.py:149-178)."""
    ori_h, ori_w, _ = image.shape
    pad_h = max(CROP - ori_h, 0)
    pad_w = max(CROP - ori_w, 0)
    ph, pw = pad_h // 2, pad_w // 2
    if pad_h or pad_w:
        image = cv2.copyMakeBorder(
            image, ph, pad_h - ph, pw, pad_w - pw, cv2.BORDER_CONSTANT,
            value=MEAN.tolist(),
        )
    new_h, new_w, _ = image.shape
    stride = int(np.ceil(CROP * 2 / 3))
    grid_h = int(np.ceil(float(new_h - CROP) / stride) + 1)
    grid_w = int(np.ceil(float(new_w - CROP) / stride) + 1)
    pred = np.zeros((new_h, new_w, CLASSES), dtype=np.float64)
    count = np.zeros((new_h, new_w, 1), dtype=np.float64)
    for ih in range(grid_h):
        for iw in range(grid_w):
            e_h = min(ih * stride + CROP, new_h)
            e_w = min(iw * stride + CROP, new_w)
            s_h, s_w = e_h - CROP, e_w - CROP
            window = image[s_h:e_h, s_w:e_w]
            pred[s_h:e_h, s_w:e_w] += _torch_net_process(model, window)
            count[s_h:e_h, s_w:e_w] += 1
    pred /= count
    pred = pred[ph : ph + ori_h, pw : pw + ori_w]
    # cv2 5.x rejects >4-channel resize; chunking is numerically identical
    # to the reference's single cv2.resize call on cv2 3/4.
    parts = [
        cv2.resize(pred[:, :, i : i + 4], (out_w, out_h),
                   interpolation=cv2.INTER_LINEAR)
        for i in range(0, CLASSES, 4)
    ]
    parts = [p if p.ndim == 3 else p[:, :, None] for p in parts]
    return np.concatenate(parts, axis=2)


def _torch_demo_probs(model, image):
    """Single-scale [1.0] demo prediction (reference tool/demo.py:166-181;
    at scales=[1.0] the reference's last-scale-only bug is a no-op)."""
    h, w, _ = image.shape
    long_size = round(1.0 * BASE_SIZE)
    if h > w:
        new_h, new_w = long_size, round(long_size / float(h) * w)
    else:
        new_h, new_w = round(long_size / float(w) * h), long_size
    scaled = cv2.resize(image, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    return _torch_scale_process(model, scaled, h, w)


@pytest.fixture(scope="module")
def demo_image():
    bgr = cv2.imread(DEMO_IMAGE, cv2.IMREAD_COLOR)
    assert bgr is not None, DEMO_IMAGE
    return np.float32(cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB))


@pytest.fixture(scope="module")
def golden_gray(torch_pspnet50, demo_image):
    """The pinned torch-reference gray map (regenerated on demand)."""
    if os.environ.get("SEMSEG_REGEN_GOLDEN") or not os.path.isfile(FIXTURE):
        probs = _torch_demo_probs(torch_pspnet50, demo_image)
        gray = np.argmax(probs, axis=2).astype(np.uint8)
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        cv2.imwrite(FIXTURE, gray)
        return gray
    return cv2.imread(FIXTURE, cv2.IMREAD_GRAYSCALE)


def test_demo_golden_torch_oracle_stable(torch_pspnet50, demo_image,
                                         golden_gray):
    """The live torch pipeline still reproduces the committed fixture
    (guards against torch RNG/op drift invalidating the golden)."""
    probs = _torch_demo_probs(torch_pspnet50, demo_image)
    gray = np.argmax(probs, axis=2).astype(np.uint8)
    agree = float((gray == golden_gray).mean())
    assert agree >= 0.9999, agree


def test_demo_driver_matches_golden_host(torch_pspnet50, golden_gray,
                                         tmp_path, demo_image):
    """Our demo driver end-to-end (.pth conversion + host pipeline) pins
    the reference gray map per-pixel (>= 99.9%)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "tool_demo", os.path.join(REPO, "tool", "demo.py")
    )
    demo_tool = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo_tool)

    from semseg_tpu.config import Config

    pth = tmp_path / "ckpt.pth"
    torch.save({"state_dict": torch_pspnet50.state_dict()}, str(pth))
    img_path = str(tmp_path / "demo.jpg")
    # Re-encode loses nothing: copy the original bytes.
    import shutil

    shutil.copyfile(DEMO_IMAGE, img_path)

    cfg = Config(dict(
        arch="psp", layers=50, classes=CLASSES, zoom_factor=8,
        train_h=CROP, train_w=CROP, test_h=CROP, test_w=CROP,
        base_size=BASE_SIZE, scales=[1.0], model_path=str(pth),
        image=img_path, colors_path=os.path.join(
            REPO, "data", "ade20k", "ade20k_colors.txt"
        ),
        eval_pipeline="host", window_batch=4,
    ))
    gray = demo_tool.run(cfg)
    assert gray.shape == golden_gray.shape
    agree = float((gray == golden_gray).mean())
    assert agree >= 0.999, agree


def test_demo_device_pipeline_matches_golden(torch_pspnet50, demo_image,
                                             golden_gray):
    """The TPU-native device pipeline reproduces the reference demo within
    the documented interpolation tolerance."""
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
    from semseg_tpu.models import PSPNet

    model = PSPNet(layers=50, classes=CLASSES, zoom_factor=8)
    variables = _converted_variables(torch_pspnet50)
    evaluator = SlidingWindowEvaluator(
        model, variables, classes=CLASSES, crop_h=CROP, crop_w=CROP,
        mean=MEAN.tolist(), std=STD.tolist(), base_size=BASE_SIZE,
        scales=[1.0], window_batch=4, mode="device",
    )
    probs = evaluator.predict_probs(demo_image)
    gray = np.argmax(probs, axis=-1).astype(np.uint8)
    agree = float((gray == golden_gray).mean())
    assert agree >= 0.995, agree
