"""Native (C++/OpenCV) host data pipeline wrapper.

``NativeSemData`` is a drop-in for ``SemData`` + the standard train-time
``Compose`` (RandScale, RandRotate, RandomGaussianBlur,
RandomHorizontalFlip, Crop, ToTensor, Normalize — the recipe every shipped
config uses, reference ``tool/train.py:194-201``) that executes decode and
ALL pixel work inside the ``_hostpipe`` C extension
(``csrc/hostpipe.cpp``): one GIL-free call per sample, no per-op Python
dispatch, no intermediate numpy temporaries.

Randomness stays in Python: parameters are drawn from the same
per-(seed, epoch, sample) stream as the pure-Python transforms
(``transform.per_sample_rng``), in the same order, so the native path is
numerics-compatible with the Python path given identical decoders (exact
on PNG; JPEG decode may differ by ±1/255 between the system libjpeg and
the cv2 wheel's — below augmentation noise).

Build the extension with ``python csrc/setup.py build_ext --inplace``;
``available()`` reports whether it is importable. Enable in training with
the ``native_loader: True`` config key.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from semseg_tpu.data.dataset import make_dataset
from semseg_tpu.data.transform import _default_rng

try:  # pragma: no cover - exercised when the extension is built
    from semseg_tpu.data import _hostpipe
except ImportError:  # pragma: no cover
    _hostpipe = None


def available() -> bool:
    return _hostpipe is not None


def _cv_round(x: float) -> int:
    """cvRound: round half to even (OpenCV's saturate_cast<int>(double))."""
    return int(np.rint(np.float64(x)))


class NativeSemData:
    """Map-style dataset emitting augmented (image f32 HWC, label i64 HW)
    crops through the native pipeline."""

    def __init__(
        self,
        split: str,
        data_root: Optional[str],
        data_list: Optional[str],
        *,
        crop_h: int,
        crop_w: int,
        mean: Sequence[float],
        std: Optional[Sequence[float]],
        ignore_label: int = 255,
        crop_type: str = "rand",
        scale: Optional[Sequence[float]] = (0.5, 2.0),
        rotate: Optional[Sequence[float]] = (-10.0, 10.0),
        blur_p: float = 0.5,
        flip_p: float = 0.5,
        rotate_p: float = 0.5,
        normalize: bool = True,
        rng=None,
    ):
        if _hostpipe is None:
            raise RuntimeError(
                "native host pipeline not built — run "
                "`python csrc/setup.py build_ext --inplace`"
            )
        if crop_type not in ("rand", "center"):
            raise ValueError(crop_type)
        self.split = split
        self.data_list = make_dataset(split, data_root, data_list)
        self.crop_h, self.crop_w = int(crop_h), int(crop_w)
        self.mean = [float(m) for m in mean]
        self.std = None if std is None else [float(s) for s in std]
        self.ignore_label = int(ignore_label)
        self.crop_type = crop_type
        self.scale = None if scale is None else tuple(scale)
        self.rotate = None if rotate is None else tuple(rotate)
        self.blur_p = blur_p
        self.flip_p = flip_p
        self.rotate_p = rotate_p
        # normalize=False emits RAW [0,255] float pixels (for the uint8
        # wire format with on-device normalization); mean keeps filling
        # rotation/crop padding either way, mirroring the reference's
        # mean-padded borders.
        self.normalize = bool(normalize)
        self.rng = rng or _default_rng

    def __len__(self) -> int:
        return len(self.data_list)

    def __getitem__(self, index: int):
        image_path, label_path = self.data_list[index]
        img, lab = _hostpipe.read_pair(image_path, label_path)
        if img.shape[:2] != lab.shape[:2]:
            raise RuntimeError(
                f"Image & label shape mismatch: {image_path} {label_path}"
            )
        h, w = lab.shape
        rng = self.rng

        # Parameter draws: same order and arithmetic as the Python
        # transforms (transform.py RandScale/RandRotate/Blur/HFlip/Crop),
        # so the (seed, epoch, index) stream yields identical batches.
        fx = fy = 0.0
        if self.scale is not None:
            s = self.scale[0] + (self.scale[1] - self.scale[0]) * rng.random()
            fx = fy = s
            # cv::resize(fx, fy) output dims (cvRound), for the crop draws
            h, w = _cv_round(h * s), _cv_round(w * s)
        has_rotate, angle = 0, 0.0
        if self.rotate is not None and rng.random() < self.rotate_p:
            has_rotate = 1
            angle = self.rotate[0] + (
                self.rotate[1] - self.rotate[0]
            ) * rng.random()
        blur = 1 if (self.blur_p > 0 and rng.random() < self.blur_p) else 0
        flip = 1 if (self.flip_p > 0 and rng.random() < self.flip_p) else 0

        pad_h = max(self.crop_h - h, 0)
        pad_w = max(self.crop_w - w, 0)
        ph, pw = h + pad_h, w + pad_w
        if self.crop_type == "rand":
            h_off = rng.randint(0, ph - self.crop_h)
            w_off = rng.randint(0, pw - self.crop_w)
        else:
            h_off = (ph - self.crop_h) // 2
            w_off = (pw - self.crop_w) // 2

        std = self.std or [1.0, 1.0, 1.0]
        norm_mean = self.mean if self.normalize else [0.0, 0.0, 0.0]
        has_std = 1 if (self.normalize and self.std is not None) else 0
        return _hostpipe.augment(
            img, lab, fx, fy, has_rotate, angle, blur, flip,
            self.crop_h, self.crop_w, h_off, w_off,
            self.mean[0], self.mean[1], self.mean[2], self.ignore_label,
            norm_mean[0], norm_mean[1], norm_mean[2],
            std[0], std[1], std[2], has_std,
        )
