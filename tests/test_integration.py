"""End-to-end integration tests on synthetic data (8-device CPU mesh).

Covers: the full train driver (data -> augmentation -> sharded train step
-> checkpoint -> inline validation), resume, the sliding-window evaluator's
stitching exactness, and the demo driver.
"""

import importlib.util
import os
import sys

import cv2
import numpy as np
import pytest

import jax

from semseg_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        f"tool_{name}", os.path.join(REPO, "tool", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def synth_dataset(tmp_path):
    """8 images (30x40) with 4-class labels + train/val list files."""
    rs = np.random.RandomState(0)
    root = tmp_path / "data"
    root.mkdir()
    lines = []
    for i in range(8):
        img = (rs.rand(30, 40, 3) * 255).astype(np.uint8)
        lab = rs.randint(0, 4, size=(30, 40)).astype(np.uint8)
        lab[:3, :5] = 255
        cv2.imwrite(str(root / f"img{i}.png"), img)
        cv2.imwrite(str(root / f"lab{i}.png"), lab)
        lines.append(f"img{i}.png lab{i}.png\n")
    train_list = tmp_path / "train.txt"
    train_list.write_text("".join(lines))
    return dict(data_root=str(root), list_file=str(train_list))


def _train_cfg(synth_dataset, tmp_path, **overrides):
    cfg = Config(dict(
        arch="psp", layers=50, classes=4, zoom_factor=8, sync_bn=True,
        train_h=25, train_w=25, scale_min=0.5, scale_max=2.0,
        rotate_min=-10, rotate_max=10, ignore_label=255, aux_weight=0.4,
        workers=2, batch_size=8, batch_size_val=8, base_lr=0.01,
        epochs=1, start_epoch=0, power=0.9, momentum=0.9,
        weight_decay=0.0001, manual_seed=1, print_freq=1, save_freq=1,
        save_path=str(tmp_path / "model"), weight=None, resume=None,
        evaluate=True,
        data_root=synth_dataset["data_root"],
        train_list=synth_dataset["list_file"],
        val_list=synth_dataset["list_file"],
    ))
    cfg.update(overrides)
    return cfg


def test_train_driver_end_to_end(synth_dataset, tmp_path):
    train_tool = _load_tool("train")
    cfg = _train_cfg(synth_dataset, tmp_path)
    state = train_tool.run(cfg)
    assert int(state.step) == 1  # 8 samples, batch 8 -> 1 step
    # checkpoint written with reference naming
    assert os.path.isdir(os.path.join(cfg.save_path, "train_epoch_1.ckpt"))
    # params moved
    leaf = jax.tree.leaves(state.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_train_resume_round_trip(synth_dataset, tmp_path):
    train_tool = _load_tool("train")
    cfg = _train_cfg(synth_dataset, tmp_path)
    train_tool.run(cfg)
    cfg2 = _train_cfg(
        synth_dataset, tmp_path, resume="auto", epochs=2, evaluate=False
    )
    state = train_tool.run(cfg2)
    assert int(state.step) == 2  # one more epoch from the restored step
    assert os.path.isdir(os.path.join(cfg.save_path, "train_epoch_2.ckpt"))


def test_loss_decreases_over_steps(synth_dataset, tmp_path):
    """Gradient flow sanity: repeated steps on one batch reduce the loss."""
    import jax.numpy as jnp

    from semseg_tpu.engine.trainer import create_train_state, make_train_step
    from semseg_tpu.models import PSPNet

    model = PSPNet(layers=50, classes=4, zoom_factor=8)
    rs = np.random.RandomState(0)
    images = rs.rand(8, 25, 25, 3).astype(np.float32)
    labels = rs.randint(0, 4, size=(8, 25, 25)).astype(np.int32)
    state = create_train_state(
        model, jax.random.PRNGKey(0), jnp.zeros((8, 25, 25, 3))
    )
    step = make_train_step(
        model, classes=4, ignore_label=255, aux_weight=0.4, base_lr=0.005,
        max_iter=1000, power=0.9, momentum=0.9, weight_decay=1e-4,
        zoom_factor=8, num_replicas=1, donate=False,
    )
    losses = []
    for _ in range(8):
        state, metrics = step(state, jnp.asarray(images), jnp.asarray(labels))
        losses.append(float(metrics["loss"]))
    assert min(losses[-2:]) < losses[0], losses


def test_train_driver_uneven_val_batches(synth_dataset, tmp_path):
    """Validation with len(val) % batch_size_val != 0: the trailing partial
    batch is padded with ignore-labeled filler (8-device mesh cannot place
    a batch of 5). Reference analog: drop_last=False val loader
    (tool/train.py:213-218)."""
    train_tool = _load_tool("train")
    # 5 val samples, batch_size_val 8 -> one partial batch of 5
    val_list = tmp_path / "val.txt"
    val_list.write_text(
        "".join(f"img{i}.png lab{i}.png\n" for i in range(5))
    )
    cfg = _train_cfg(synth_dataset, tmp_path, val_list=str(val_list))
    state = train_tool.run(cfg)
    assert int(state.step) == 1


def test_train_driver_f16_image_wire(synth_dataset, tmp_path):
    """`image_wire_dtype: float16` (half the host->device image bytes)
    trains end-to-end; the quantization is ~5e-4 relative on normalized
    inputs, so the first-step loss stays within float tolerance of the
    float32-wire run."""
    train_tool = _load_tool("train")
    cfg = _train_cfg(synth_dataset, tmp_path, evaluate=False)
    state32 = train_tool.run(cfg)
    cfg16 = _train_cfg(
        synth_dataset, tmp_path, evaluate=False,
        image_wire_dtype="float16",
        save_path=str(tmp_path / "model16"),
    )
    state16 = train_tool.run(cfg16)
    assert int(state16.step) == 1
    a = np.asarray(jax.tree.leaves(state32.params)[0], np.float64)
    b = np.asarray(jax.tree.leaves(state16.params)[0], np.float64)
    # identical recipe modulo input wire quantization
    np.testing.assert_allclose(a, b, atol=5e-3, rtol=1e-2)


def test_train_driver_uint8_image_wire(synth_dataset, tmp_path):
    """`image_wire_dtype: uint8` ships raw [0,255] pixels (quarter the
    f32 wire bytes) and normalizes on device; inline validation exercises
    the eval step's device normalization too. Quantization = rounding
    interpolated pixels to integers (<= 0.5/255), so the first-step
    params stay within float tolerance of the f32-wire run."""
    train_tool = _load_tool("train")
    cfg = _train_cfg(synth_dataset, tmp_path)
    state32 = train_tool.run(cfg)
    cfg8 = _train_cfg(
        synth_dataset, tmp_path,
        image_wire_dtype="uint8",
        save_path=str(tmp_path / "model8"),
    )
    state8 = train_tool.run(cfg8)
    assert int(state8.step) == 1
    a = np.asarray(jax.tree.leaves(state32.params)[0], np.float64)
    b = np.asarray(jax.tree.leaves(state8.params)[0], np.float64)
    np.testing.assert_allclose(a, b, atol=2e-2, rtol=5e-2)


def test_train_driver_model_parallel(synth_dataset, tmp_path):
    """`model_parallel: 2` config key -> (4, 2) mesh with TP head sharding,
    end-to-end through the driver."""
    train_tool = _load_tool("train")
    cfg = _train_cfg(
        synth_dataset, tmp_path, model_parallel=2, evaluate=False
    )
    state = train_tool.run(cfg)
    assert int(state.step) == 1
    leaf = jax.tree.leaves(state.params)[0]
    assert np.all(np.isfinite(np.asarray(leaf)))


def test_preemption_checkpoint_and_exact_resume(synth_dataset, tmp_path):
    """Mid-epoch preemption (SIGTERM path, tripped via the deterministic
    test hook) checkpoints, and `resume: auto` + loader fast-forward
    reproduce the uninterrupted run bit-for-bit (deterministic per-sample
    augmentation RNG + per-step dropout folding)."""
    train_tool = _load_tool("train")
    # 16-entry list (8 images listed twice), batch 8 -> 2 steps/epoch.
    big_list = tmp_path / "train16.txt"
    lines = [f"img{i}.png lab{i}.png\n" for i in range(8)]
    big_list.write_text("".join(lines * 2))
    base = dict(train_list=str(big_list), epochs=2, evaluate=False)

    cfg_full = _train_cfg(
        synth_dataset, tmp_path, save_path=str(tmp_path / "full"), **base
    )
    state_full = train_tool.run(cfg_full)
    assert int(state_full.step) == 4

    cfg_pre = _train_cfg(
        synth_dataset, tmp_path, save_path=str(tmp_path / "pre"),
        _preempt_after_step=3, **base
    )
    state_pre = train_tool.run(cfg_pre)
    assert int(state_pre.step) == 3
    assert os.path.isdir(os.path.join(cfg_pre.save_path, "train_preempt.ckpt"))

    cfg_res = _train_cfg(
        synth_dataset, tmp_path, save_path=str(tmp_path / "pre"),
        resume="auto", **base
    )
    state_res = train_tool.run(cfg_res)
    assert int(state_res.step) == 4

    for a, b in zip(
        jax.tree.leaves(state_full.params), jax.tree.leaves(state_res.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the epoch save at the end of the resumed run clears the snapshot
    assert not os.path.exists(
        os.path.join(cfg_pre.save_path, "train_preempt.ckpt")
    )


def test_train_driver_pretrained_init(synth_dataset, tmp_path):
    """ImageNet-pretrained backbone initialization through the driver:
    `initmodel:` points at a torch deep-base checkpoint; with lr=0 the
    backbone params after one epoch equal the converted torch weights,
    and head params stay freshly initialized (reference
    model/resnet.py:199-200, tool/train.py:121-126)."""
    import sys

    import torch

    sys.path.insert(0, "/root/reference")
    from model.resnet import resnet50

    torch.manual_seed(3)
    tm = resnet50(pretrained=False, deep_base=True)
    with torch.no_grad():
        tm.bn1.running_mean.copy_(torch.arange(64.0) / 64.0)
    pth = tmp_path / "resnet50_v2.pth"
    torch.save(tm.state_dict(), str(pth))

    train_tool = _load_tool("train")
    cfg = _train_cfg(
        synth_dataset, tmp_path, initmodel=str(pth), evaluate=False,
        base_lr=0.0,
    )
    state = train_tool.run(cfg)

    want = tm.conv1.weight.detach().numpy().transpose(2, 3, 1, 0)
    got = np.asarray(state.params["backbone"]["stem_cb1"]["conv"]["kernel"])
    np.testing.assert_allclose(got, want, atol=0)
    # head logits conv must remain fresh-init (not present in the
    # ImageNet checkpoint), i.e. not all equal to any torch tensor
    assert "conv_logits" in state.params["cls"]


class _PerPixelModel:
    """Stand-in 'model' whose logits depend only on the local pixel —
    sliding-window stitching must then be exact regardless of the grid."""

    def __init__(self, threshold=50.0):
        self.threshold = threshold

    def apply(self, variables, x, train=False):
        import jax.numpy as jnp

        mean = jnp.mean(x, axis=-1, keepdims=True)
        return jnp.concatenate([mean, self.threshold - mean], axis=-1)


@pytest.mark.parametrize("mode", ["device", "host"])
def test_sliding_window_stitch_exact(mode):
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

    evaluator = SlidingWindowEvaluator(
        _PerPixelModel(), {}, classes=2, crop_h=17, crop_w=17,
        mean=[0.0, 0.0, 0.0], std=None, base_size=40, scales=[1.0],
        flip=True, window_batch=4, mode=mode,
    )
    rs = np.random.RandomState(1)
    image = (rs.rand(40, 40, 3) * 100).astype(np.float32)
    pred = evaluator.predict(image)
    want = (image.mean(axis=-1) <= 25.0).astype(np.uint8)
    np.testing.assert_array_equal(pred, want)


def test_device_pipeline_matches_host_pipeline():
    """Multi-scale device-resident pipeline vs the reference-faithful host
    pipeline: probabilities agree within interpolation tolerance."""
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

    rs = np.random.RandomState(2)
    image = (rs.rand(37, 52, 3) * 255).astype(np.float32)
    kwargs = dict(
        classes=2, crop_h=17, crop_w=17, mean=[10.0, 20.0, 30.0],
        std=[55.0, 55.0, 55.0], base_size=52,
        scales=[0.75, 1.0, 1.25], flip=True, window_batch=4,
    )
    # Decision boundary at normalized value 1.0 — inside the data range so
    # the argmax actually varies across the image.
    dev = SlidingWindowEvaluator(
        _PerPixelModel(2.0), {}, mode="device", **kwargs
    )
    host = SlidingWindowEvaluator(
        _PerPixelModel(2.0), {}, mode="host", **kwargs
    )
    p_dev = dev.predict_probs(image)
    p_host = host.predict_probs(image)
    np.testing.assert_allclose(p_dev, p_host, atol=2e-2, rtol=1e-2)
    agree = (np.argmax(p_dev, -1) == np.argmax(p_host, -1)).mean()
    assert agree > 0.995, agree
    # The fused all-scales ms program (predict_async single-dispatch
    # path) must agree exactly with the per-scale device path.
    gray_fused = np.asarray(dev.predict_async(image))
    np.testing.assert_array_equal(gray_fused, np.argmax(p_dev, -1))


def test_pooled_ms_stream_matches_per_scale_program():
    """The pooled cross-scale window stream (one scan, windows from every
    scale's canvas pooled into shared batch-aligned chunks) must emit the
    exact class map of the per-scale ms program: pooling only repacks
    which batch slot a window rides in, never a value. Scales chosen so
    canvases both pad up to the crop (0.4x) and tile multiple windows
    (1.3x), with window counts that leave ragged per-scale tails."""
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

    rs = np.random.RandomState(4)
    image = (rs.rand(40, 61, 3) * 255).astype(np.float32)
    kwargs = dict(
        classes=2, crop_h=17, crop_w=17, mean=[10.0, 20.0, 30.0],
        std=[55.0, 55.0, 55.0], base_size=61,
        scales=[0.4, 0.75, 1.0, 1.3], flip=True, window_batch=4,
        mode="device",
    )
    pooled = SlidingWindowEvaluator(
        _PerPixelModel(2.0), {}, pooled_ms=True, **kwargs
    )
    per_scale = SlidingWindowEvaluator(
        _PerPixelModel(2.0), {}, pooled_ms=False, **kwargs
    )
    assert pooled.pooled_ms and not per_scale.pooled_ms
    np.testing.assert_array_equal(
        np.asarray(pooled.predict_async(image)),
        np.asarray(per_scale.predict_async(image)),
    )


@pytest.mark.parametrize("bucket", [32, 128])
def test_bucketed_pipeline_matches_host_across_shapes(bucket):
    """device_bucketed must agree with the host reference pipeline on
    variable image shapes (the ADE20K/VOC case) while reusing programs —
    at any bucket granularity (bucket=32 exercises multi-bucket keys on
    these small images; 128 puts every shape in one bucket)."""
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

    rs = np.random.RandomState(3)
    kwargs = dict(
        classes=2, crop_h=17, crop_w=17, mean=[10.0, 20.0, 30.0],
        std=[55.0, 55.0, 55.0], base_size=48,
        scales=[0.75, 1.0], flip=True, window_batch=4,
    )
    dev = SlidingWindowEvaluator(
        _PerPixelModel(2.0), {}, mode="device_bucketed", bucket=bucket,
        **kwargs
    )
    host = SlidingWindowEvaluator(
        _PerPixelModel(2.0), {}, mode="host", **kwargs
    )
    for shape in [(37, 52), (41, 33), (52, 37), (64, 64)]:
        image = (rs.rand(*shape, 3) * 255).astype(np.float32)
        p_dev = dev.predict_probs(image)
        p_host = host.predict_probs(image)
        assert p_dev.shape == p_host.shape == (*shape, 2)
        np.testing.assert_allclose(
            p_dev, p_host, atol=2e-2, rtol=1e-2,
            err_msg=f"shape {shape}",
        )
        agree = (np.argmax(p_dev, -1) == np.argmax(p_host, -1)).mean()
        assert agree > 0.99, (shape, agree)
    # program reuse: bounded compile count across 4 shapes x 2 scales
    # (tighter buckets distinguish more canvas shapes, but stay bounded)
    assert len(dev._bucketed._programs) <= (4 if bucket == 128 else 12)


def test_image_shape_probe_exif_orientation(tmp_path):
    """The eval-pipeline auto-probe's header sniff must report the
    *decoded* shape: cv2.imread applies EXIF orientation, so a JPEG with
    a 90-degree orientation tag has swapped H/W vs its SOF dims."""
    import struct

    test_tool = _load_tool("test")
    rs = np.random.RandomState(0)
    img = (rs.rand(30, 50, 3) * 255).astype(np.uint8)
    plain = tmp_path / "plain.jpg"
    cv2.imwrite(str(plain), img)
    assert test_tool._image_shape(str(plain)) == (30, 50)

    # splice an APP1 Exif segment (orientation=6, rotate 90 CW) after SOI
    tiff = (
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 1)                      # one IFD entry
        + struct.pack("<HHI", 0x0112, 3, 1)         # orientation SHORT x1
        + struct.pack("<HH", 6, 0)                  # value 6 + pad
        + struct.pack("<I", 0)                      # next IFD
    )
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
    raw = plain.read_bytes()
    rotated = tmp_path / "rotated.jpg"
    rotated.write_bytes(raw[:2] + app1 + raw[2:])

    decoded = cv2.imread(str(rotated), cv2.IMREAD_COLOR).shape[:2]
    probed = test_tool._image_shape(str(rotated))
    assert probed == decoded == (50, 30)

    # EXIF is not required to precede SOF: splice the same APP1 *after*
    # the SOF segment and the probe must still report the decoded shape
    # (round-3 probe stopped walking at SOF and missed it).
    sof_at = None
    pos = 2
    while pos + 4 <= len(raw):
        assert raw[pos] == 0xFF
        m = raw[pos + 1]
        seg_len = struct.unpack(">H", raw[pos + 2:pos + 4])[0]
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            sof_at = pos
            break
        pos += 2 + seg_len
    assert sof_at is not None
    sof_end = sof_at + 2 + struct.unpack(">H", raw[sof_at + 2:sof_at + 4])[0]
    late = tmp_path / "late_exif.jpg"
    late.write_bytes(raw[:sof_end] + app1 + raw[sof_end:])
    decoded = cv2.imread(str(late), cv2.IMREAD_COLOR).shape[:2]
    assert test_tool._image_shape(str(late)) == decoded == (50, 30)


def test_cal_acc_scoring(synth_dataset, tmp_path):
    """tool/test.py scoring path: perfect predictions -> mIoU 1.0."""
    import logging

    test_tool = _load_tool("test")
    pred_dir = tmp_path / "gray"
    pred_dir.mkdir()
    data_list = []
    for i in range(8):
        lab_path = os.path.join(synth_dataset["data_root"], f"lab{i}.png")
        img_path = os.path.join(synth_dataset["data_root"], f"img{i}.png")
        lab = cv2.imread(lab_path, cv2.IMREAD_GRAYSCALE)
        cv2.imwrite(str(pred_dir / f"img{i}.png"), lab)
        data_list.append((img_path, lab_path))
    m_iou, m_acc, all_acc = test_tool.cal_acc(
        logging.getLogger("t"), data_list, str(pred_dir), 4,
        [str(c) for c in range(4)],
    )
    assert m_iou == pytest.approx(1.0)
    assert all_acc == pytest.approx(1.0)


def test_test_driver_end_to_end(synth_dataset, tmp_path):
    """Train 1 epoch, then run the full test driver on the checkpoint:
    sliding-window inference, PNG outputs, cal_acc scoring."""
    train_tool = _load_tool("train")
    test_tool = _load_tool("test")
    cfg = _train_cfg(synth_dataset, tmp_path, evaluate=False)
    train_tool.run(cfg)

    colors_path = tmp_path / "colors.txt"
    colors_path.write_text("0 0 0\n255 0 0\n0 255 0\n0 0 255\n")
    names_path = tmp_path / "names.txt"
    names_path.write_text("a\nb\nc\nd\n")
    test_cfg = _train_cfg(synth_dataset, tmp_path)
    test_cfg.update(dict(
        test_list=synth_dataset["list_file"], split="val",
        base_size=40, test_h=25, test_w=25, scales=[1.0],
        has_prediction=False, index_start=0, index_step=3,
        model_path=os.path.join(str(tmp_path / "model"), "train_epoch_1.ckpt"),
        save_folder=str(tmp_path / "result"),
        colors_path=str(colors_path), names_path=str(names_path),
        window_batch=4,  # eval_pipeline unset: exercises auto-selection
    ))
    test_tool.run(test_cfg)
    grays = os.listdir(tmp_path / "result" / "gray")
    colors = os.listdir(tmp_path / "result" / "color")
    assert len(grays) == 3 and len(colors) == 3  # index_step sharding
    pred = cv2.imread(
        str(tmp_path / "result" / "gray" / grays[0]), cv2.IMREAD_GRAYSCALE
    )
    assert pred.shape == (30, 40)
    assert pred.max() <= 3


def test_demo_driver(synth_dataset, tmp_path):
    demo_tool = _load_tool("demo")
    img_path = os.path.join(synth_dataset["data_root"], "img0.png")
    colors_path = tmp_path / "colors.txt"
    colors_path.write_text("0 0 0\n255 0 0\n0 255 0\n0 0 255\n")
    cfg = Config(dict(
        arch="psp", layers=50, classes=4, zoom_factor=8,
        train_h=25, train_w=25, test_h=25, test_w=25,
        base_size=30, scales=[1.0], model_path="/nonexistent",
        allow_random_weights=True, image=img_path,
        colors_path=str(colors_path), window_batch=4,
    ))
    gray = demo_tool.run(cfg)
    assert gray.shape == (30, 40)
    assert os.path.isfile(img_path.replace(".png", "_gray.png"))
    assert os.path.isfile(img_path.replace(".png", "_color.png"))


def test_demo_driver_mesh_matches_single_device(synth_dataset, tmp_path):
    """The demo's `eval_devices`/`eval_partition` flags (single-image
    multi-chip spatial partitioning) must reproduce the single-device
    prediction exactly — same weights (fixed PRNG seed in smoke mode),
    same image, 8-device CPU mesh."""
    demo_tool = _load_tool("demo")
    img_path = os.path.join(synth_dataset["data_root"], "img1.png")
    colors_path = tmp_path / "colors.txt"
    colors_path.write_text("0 0 0\n255 0 0\n0 255 0\n0 0 255\n")
    base = dict(
        arch="psp", layers=50, classes=4, zoom_factor=8,
        train_h=25, train_w=25, test_h=25, test_w=25,
        base_size=30, scales=[1.0], model_path="/nonexistent",
        allow_random_weights=True, image=img_path,
        colors_path=str(colors_path), window_batch=4,
    )
    gray_single = demo_tool.run(Config(dict(base)))
    gray_mesh = demo_tool.run(Config(dict(
        base, eval_devices=8, eval_partition="spatial",
    )))
    np.testing.assert_array_equal(gray_mesh, gray_single)
