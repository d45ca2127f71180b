"""End-to-end oracle: the reference's LITERAL ``tool/test.py`` executed
on a synthetic mini-dataset with a checkpoint exported by our framework,
byte-compared against our ``tool/test.py`` in host and device modes.

This removes the last human-transcription step from the fidelity chain:
``tests/test_recipe_parity.py`` re-implements the reference pipeline in
torch as its oracle; here the oracle is ``/root/reference/tool/test.py``
itself (``:99-223``) run unmodified (torch CPU) via its own config
loader, its own dataset/transform stack, and its own sliding-window /
multi-scale / flip-TTA / cal_acc code.

Environment shim (documented): the reference script hardcodes
``.cuda()`` placement (``tool/test.py:108,130``); the runner subprocess
no-ops ``torch.Tensor.cuda``/``torch.nn.Module.cuda`` before executing
it (``torch.nn.DataParallel`` already degrades to a passthrough on
CPU-only hosts). No reference logic is altered.

Checkpoint direction: OUR random-init variables -> ``export_pth`` (DDP
``module.``-prefixed ``{"epoch","state_dict"}``) -> consumed by the
reference's ``torch.load`` + ``load_state_dict(strict=False)`` AND
round-tripped back through our ``load_model_variables`` — both drivers
eval the same weights that crossed the torch wire format.

Tolerances: host mode >= 99.9% per-pixel gray agreement per image
(residual = argmax ties flipped by <1e-4 cross-backend logit noise on
random weights); device mode >= 99.5% (MXU-matmul resize on the same
cv2 half-pixel grid moves near-tie argmaxes) — same bounds as
``test_recipe_parity.py``.
"""

import os
import subprocess
import sys
import textwrap

import cv2
import numpy as np
import pytest

REFERENCE = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow

CLASSES = 6
CROP = 97            # (97-1) % 8 == 0
BASE_SIZE = 100
SCALES = [1.0, 0.75]  # exercises multi-scale accumulate + pad-to-crop


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    return tmp_path_factory.mktemp("reforacle")


@pytest.fixture(scope="module")
def mini_dataset(workdir):
    """3 images (distinct shapes incl. one below crop size) + labels."""
    root = workdir / "data"
    root.mkdir()
    rs = np.random.RandomState(42)
    lines = []
    for i, (h, w) in enumerate([(60, 84), (97, 97), (120, 72)]):
        # piecewise-constant color blobs: decisive argmax regions, unlike
        # pure noise, and compressible PNGs
        img = np.zeros((h, w, 3), np.uint8)
        lab = np.zeros((h, w), np.uint8)
        for _ in range(6):
            y0, x0 = rs.randint(0, h), rs.randint(0, w)
            hh, ww = rs.randint(h // 4, h), rs.randint(w // 4, w)
            img[y0:y0 + hh, x0:x0 + ww] = rs.randint(0, 255, 3)
            lab[y0:y0 + hh, x0:x0 + ww] = rs.randint(0, CLASSES)
        img = np.clip(
            img.astype(np.int16) + rs.randint(-20, 20, img.shape), 0, 255
        ).astype(np.uint8)
        cv2.imwrite(str(root / f"img{i}.png"), img)
        cv2.imwrite(str(root / f"lab{i}.png"), lab)
        lines.append(f"img{i}.png lab{i}.png\n")
    (root / "val.txt").write_text("".join(lines))
    names = workdir / "names.txt"
    names.write_text("".join(f"class{i}\n" for i in range(CLASSES)))
    colors = workdir / "colors.txt"
    rs2 = np.random.RandomState(1)
    colors.write_text(
        "".join(" ".join(map(str, rs2.randint(0, 256, 3))) + "\n"
                for _ in range(CLASSES))
    )
    return root


@pytest.fixture(scope="module")
def exported_pth(workdir):
    """Our random-init PSPNet50 exported to the reference's .pth format."""
    import jax
    import jax.numpy as jnp

    from semseg_tpu.models import PSPNet
    from semseg_tpu.models.convert import export_pth

    model = PSPNet(layers=50, classes=CLASSES, zoom_factor=8,
                   dtype=jnp.float32)
    rng = jax.random.PRNGKey(7)
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=False)
    )(rng, jnp.zeros((1, CROP, CROP, 3), jnp.float32))
    variables = jax.device_get(variables)  # materialize before any torch
    path = str(workdir / "export.pth")
    export_pth(path, variables, "psp", 50)
    return path


def _write_cfg(workdir, mini_dataset, pth, save_folder):
    cfg = textwrap.dedent(f"""\
        DATA:
          data_root: {mini_dataset}
          test_list: {mini_dataset}/val.txt
          classes: {CLASSES}
        TRAIN:
          arch: psp
          layers: 50
          sync_bn: False
          train_h: {CROP}
          train_w: {CROP}
          zoom_factor: 8
          ignore_label: 255
        TEST:
          split: val
          test_gpu: [0]
          workers: 0
          has_prediction: False
          index_start: 0
          index_step: 0
          base_size: {BASE_SIZE}
          test_h: {CROP}
          test_w: {CROP}
          scales: {SCALES}
          model_path: {pth}
          save_folder: {save_folder}
          colors_path: {workdir}/colors.txt
          names_path: {workdir}/names.txt
        """)
    path = workdir / f"cfg_{os.path.basename(save_folder)}.yaml"
    path.write_text(cfg)
    return str(path)


@pytest.fixture(scope="module")
def reference_grays(workdir, mini_dataset, exported_pth):
    """Execute /root/reference/tool/test.py literally in a subprocess."""
    save = workdir / "ref_out"
    cfgpath = _write_cfg(workdir, mini_dataset, exported_pth, str(save))
    runner = workdir / "run_reference.py"
    runner.write_text(textwrap.dedent(f"""\
        import runpy, sys
        import torch
        # CPU-only host: the reference hardcodes .cuda() placement; make
        # it a no-op (DataParallel already passes through with no GPUs).
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self
        sys.argv = ["test.py", "--config", {cfgpath!r}]
        runpy.run_path({REFERENCE!r} + "/tool/test.py", run_name="__main__")
    """))
    env = dict(os.environ)
    env["PYTHONPATH"] = REFERENCE
    env.pop("JAX_PLATFORMS", None)
    proc = subprocess.run(
        [sys.executable, str(runner)], env=env, cwd=str(workdir),
        capture_output=True, text=True, timeout=1800,
    )
    assert proc.returncode == 0, (
        f"reference tool/test.py failed\n--- stdout\n{proc.stdout[-4000:]}"
        f"\n--- stderr\n{proc.stderr[-4000:]}"
    )
    # the reference logs its cal_acc verdict; keep it for debugging
    gray = save / "gray"
    assert sorted(os.listdir(gray)) == ["img0.png", "img1.png", "img2.png"]
    return gray, proc.stderr


def _run_ours(workdir, mini_dataset, exported_pth, pipeline):
    from semseg_tpu.config import load_cfg_from_cfg_file

    sys.path.insert(0, os.path.join(REPO, "tool"))
    try:
        import test as ours_test  # tool/test.py
    finally:
        sys.path.pop(0)
    save = workdir / f"ours_{pipeline}"
    cfgpath = _write_cfg(workdir, mini_dataset, exported_pth, str(save))
    cfg = load_cfg_from_cfg_file(cfgpath)
    cfg["eval_pipeline"] = pipeline
    ours_test.run(cfg)
    return save / "gray"


def _agreement(a_dir, b_dir, name):
    a = cv2.imread(str(a_dir / name), cv2.IMREAD_GRAYSCALE)
    b = cv2.imread(str(b_dir / name), cv2.IMREAD_GRAYSCALE)
    assert a is not None and b is not None and a.shape == b.shape
    return float((a == b).mean())


def test_reference_oracle_host_mode(workdir, mini_dataset, exported_pth,
                                    reference_grays):
    ref_gray, _ = reference_grays
    ours_gray = _run_ours(workdir, mini_dataset, exported_pth, "host")
    for name in ("img0.png", "img1.png", "img2.png"):
        agree = _agreement(ref_gray, ours_gray, name)
        assert agree >= 0.999, f"{name}: host agreement {agree:.5f}"


def test_reference_oracle_device_mode(workdir, mini_dataset, exported_pth,
                                      reference_grays):
    ref_gray, _ = reference_grays
    ours_gray = _run_ours(
        workdir, mini_dataset, exported_pth, "device_bucketed"
    )
    for name in ("img0.png", "img1.png", "img2.png"):
        agree = _agreement(ref_gray, ours_gray, name)
        assert agree >= 0.995, f"{name}: device agreement {agree:.5f}"
