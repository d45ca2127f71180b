"""Multi-scale sliding-window inference engine.

Numerics-compatible with the reference pipeline (``tool/test.py:122-223``):
per scale, the long side is resized to ``round(scale * base_size)`` (cv2
bilinear, host), the image is mean-padded to the crop size, overlapping
crop windows on a ``ceil(crop * 2/3)`` stride are evaluated, per-window
class probabilities are accumulated and count-normalized, un-padded,
resized (cv2) back to the original resolution, and averaged over scales.

TPU-native redesign of the hot path: where the reference runs one window
(plus its flip) per forward, windows are **batched** — all crops of an
image (and their horizontal flips) are stacked into fixed-size device
batches so the jitted forward sees one static shape per crop size and the
MXU stays saturated. Normalization, flip TTA averaging, logit resize and
softmax all run on device.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Sequence

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from semseg_tpu.ops import resize_bilinear_align_corners


class SlidingWindowEvaluator:
    def __init__(
        self,
        model,
        variables,
        *,
        classes: int,
        crop_h: int,
        crop_w: int,
        mean: Sequence[float],
        std: Optional[Sequence[float]],
        base_size: int,
        scales: Sequence[float],
        flip: bool = True,
        stride_rate: float = 2 / 3,
        window_batch: int = 8,
    ):
        self.model = model
        self.variables = variables
        self.classes = classes
        self.crop_h, self.crop_w = crop_h, crop_w
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = None if std is None else np.asarray(std, dtype=np.float32)
        self.base_size = base_size
        self.scales = list(scales)
        self.flip = flip
        self.stride_rate = stride_rate
        self.window_batch = window_batch
        self._forward = jax.jit(self._forward_impl)

    def _forward_impl(self, variables, images):
        """images: [B, crop_h, crop_w, 3] raw 0-255 RGB -> probs [B,...,C]."""
        x = images - jnp.asarray(self.mean)
        if self.std is not None:
            x = x / jnp.asarray(self.std)
        logits = self.model.apply(variables, x, train=False)
        if logits.shape[1:3] != images.shape[1:3]:
            logits = resize_bilinear_align_corners(
                logits, (images.shape[1], images.shape[2])
            )
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def _run_windows(self, windows: np.ndarray) -> np.ndarray:
        """Run [N, crop_h, crop_w, 3] windows through the model in fixed-size
        chunks (padding the tail so every launch has the same shape)."""
        n = windows.shape[0]
        wb = self.window_batch
        probs = np.empty(
            (n, self.crop_h, self.crop_w, self.classes), dtype=np.float32
        )
        for start in range(0, n, wb):
            chunk = windows[start : start + wb]
            pad = wb - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0
                )
            out = np.asarray(self._forward(self.variables, jnp.asarray(chunk)))
            probs[start : start + wb] = out[: wb - pad if pad else wb]
        return probs

    def net_process(self, image: np.ndarray) -> np.ndarray:
        """Single-crop probabilities with optional flip TTA
        (reference ``tool/test.py:122-146``)."""
        batch = image[None]
        if self.flip:
            batch = np.concatenate([batch, batch[:, :, ::-1]], axis=0)
        probs = self._run_windows(batch)
        if self.flip:
            return (probs[0] + probs[1][:, ::-1]) / 2
        return probs[0]

    def scale_process(self, image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        """Sliding-window prediction of one scaled image, resized to
        (out_h, out_w) (reference ``tool/test.py:149-178``)."""
        ori_h, ori_w, _ = image.shape
        pad_h = max(self.crop_h - ori_h, 0)
        pad_w = max(self.crop_w - ori_w, 0)
        pad_h_half, pad_w_half = pad_h // 2, pad_w // 2
        if pad_h > 0 or pad_w > 0:
            image = cv2.copyMakeBorder(
                image, pad_h_half, pad_h - pad_h_half, pad_w_half,
                pad_w - pad_w_half, cv2.BORDER_CONSTANT,
                value=self.mean.tolist(),
            )
        new_h, new_w, _ = image.shape
        stride_h = int(np.ceil(self.crop_h * self.stride_rate))
        stride_w = int(np.ceil(self.crop_w * self.stride_rate))
        grid_h = int(np.ceil(float(new_h - self.crop_h) / stride_h) + 1)
        grid_w = int(np.ceil(float(new_w - self.crop_w) / stride_w) + 1)

        # Gather every window of the grid, then batch them through the model.
        coords = []
        for ih in range(grid_h):
            for iw in range(grid_w):
                e_h = min(ih * stride_h + self.crop_h, new_h)
                s_h = e_h - self.crop_h
                e_w = min(iw * stride_w + self.crop_w, new_w)
                s_w = e_w - self.crop_w
                coords.append((s_h, e_h, s_w, e_w))
        windows = np.stack(
            [image[s_h:e_h, s_w:e_w] for (s_h, e_h, s_w, e_w) in coords]
        )
        if self.flip:
            windows = np.concatenate([windows, windows[:, :, ::-1]], axis=0)
        probs = self._run_windows(windows)
        if self.flip:
            k = len(coords)
            probs = (probs[:k] + probs[k:][:, :, ::-1]) / 2

        prediction = np.zeros((new_h, new_w, self.classes), dtype=np.float64)
        count = np.zeros((new_h, new_w, 1), dtype=np.float64)
        for win_probs, (s_h, e_h, s_w, e_w) in zip(probs, coords):
            prediction[s_h:e_h, s_w:e_w] += win_probs
            count[s_h:e_h, s_w:e_w] += 1
        prediction /= count
        prediction = prediction[
            pad_h_half : pad_h_half + ori_h, pad_w_half : pad_w_half + ori_w
        ]
        return cv2.resize(
            prediction, (out_w, out_h), interpolation=cv2.INTER_LINEAR
        )

    def predict_probs(self, image: np.ndarray) -> np.ndarray:
        """Full multi-scale probabilities for one RGB float32 HWC image
        (reference ``tool/test.py:187-203``)."""
        h, w, _ = image.shape
        prediction = np.zeros((h, w, self.classes), dtype=np.float64)
        for scale in self.scales:
            long_size = round(scale * self.base_size)
            new_h = new_w = long_size
            if h > w:
                new_w = round(long_size / float(h) * w)
            else:
                new_h = round(long_size / float(w) * h)
            image_scale = cv2.resize(
                image, (new_w, new_h), interpolation=cv2.INTER_LINEAR
            )
            prediction += self.scale_process(image_scale, h, w)
        return prediction / len(self.scales)

    def predict(self, image: np.ndarray) -> np.ndarray:
        """argmax class map for one image."""
        return np.argmax(self.predict_probs(image), axis=2).astype(np.uint8)
