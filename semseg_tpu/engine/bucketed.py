"""Bucketed device-resident sliding-window evaluation.

The exact-shape device pipeline (``evaluator.py``) compiles one program per
(image shape, scale) — ideal when every image has the same size
(Cityscapes), a compile storm when sizes vary (ADE20K/VOC). This module
keeps the whole per-scale pipeline on device while bounding compiled
program count by *bucketing* the static shapes and passing everything
shape-dependent as runtime data:

- the original image is zero-padded to an output bucket [OHB, OWB];
- the scale resize and the final prob resize are separable half-pixel
  interpolations whose index/weight vectors are built on host per image
  and turned into one-hot matmul matrices on device — static bucket
  shapes, dynamic true sizes (zero rows beyond the live region);
- mean padding of the canvas is a validity mask built from traced size
  scalars;
- window coordinates / weights / count map are traced inputs, with the
  chunk count bucketed (zero-weight padding chunks).

Program cache key: (canvas bucket, out bucket, chunk bucket) — a handful
of programs for a whole dataset. Per image the host uploads the uint8
image once plus a few KB of indices; one uint8 argmax map is read back.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from semseg_tpu.engine.evaluator import _grid_coords, _scaled_size

BUCKET = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chunk_bucket(n: int) -> int:
    b = 1
    while b < n:
        b *= 2
    return b


def _half_pixel_vectors(in_size: int, out_size: int, in_cap: int,
                        shift: int = 0):
    """Host-built (lo, hi, w_lo, valid) vectors of length ``out_cap`` rows
    are produced by the caller slicing/padding; here exact ``out_size``
    rows mapping into ``in_size`` source samples (clamped), with ``shift``
    added to the destination row index by the caller."""
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, in_size - 1)
    lo = np.clip(np.floor(coords).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    w_lo = (1.0 - (coords - lo)).astype(np.float32)
    assert in_size <= in_cap
    return lo, hi, w_lo


def _interp_payload(in_size: int, out_size: int, in_cap: int, out_cap: int,
                    dst_offset: int = 0):
    """Runtime payload for a [out_cap, in_cap] one-hot interp matrix whose
    live block is rows [dst_offset, dst_offset+out_size)."""
    lo = np.zeros(out_cap, np.int32)
    hi = np.zeros(out_cap, np.int32)
    w_lo = np.zeros(out_cap, np.float32)
    valid = np.zeros(out_cap, np.float32)
    l, h, w = _half_pixel_vectors(in_size, out_size, in_cap)
    sl = slice(dst_offset, dst_offset + out_size)
    lo[sl], hi[sl], w_lo[sl] = l, h, w
    valid[sl] = 1.0
    return lo, hi, w_lo, valid


def _matrix_from_payload(lo, hi, w_lo, valid, in_cap: int):
    """Device-side [out_cap, in_cap] matrix from index/weight vectors."""
    src = jnp.arange(in_cap)[None, :]
    m = (
        (lo[:, None] == src) * w_lo[:, None]
        + (hi[:, None] == src) * (1.0 - w_lo)[:, None]
    )
    return m * valid[:, None]


class BucketedPipeline:
    """Per-scale bucketed program factory + runner. Used by
    SlidingWindowEvaluator in ``device_bucketed`` mode.

    ``bucket`` trades compiled-program count against padded-canvas waste:
    smaller buckets fit shapes tighter (less wasted forward work on pad
    rows) but compile more programs on a shape-diverse dataset. 128 is
    the measured sweet spot for ADE20K-like shape mixes (see PARITY.md
    bucket sweep); it is also one TPU lane tile, so canvas dims stay
    layout-aligned."""

    def __init__(self, evaluator, bucket: int = BUCKET):
        self.ev = evaluator
        self.bucket = int(bucket)
        self._programs = {}

    def _build(self, key):
        (chb, cwb, ohb, owb, nchunks, wb) = key
        ev = self.ev
        crop_h, crop_w = ev.crop_h, ev.crop_w
        classes = ev.classes
        mean = jnp.asarray(ev.mean)
        flip = ev.flip
        forward = ev._forward_impl
        constrain = ev._constrain_batch

        def program(variables, image_pad, down_payload, up_payload,
                    coords, weights, count):
            """One scale of one image.

            image_pad: [OHB, OWB, 3] original image zero-padded (any dtype)
            down_payload: 8 vectors building the (orig -> canvas) matrices
            up_payload:   8 vectors building the (canvas -> out) matrices
            coords: [nchunks, wb, 2] window origins; weights [nchunks, wb]
            count: [CHB, CWB, 1] per-pixel window coverage (0 outside)
            """
            img = image_pad.astype(jnp.float32)
            dh_lo, dh_hi, dh_w, dh_v, dw_lo, dw_hi, dw_w, dw_v = down_payload
            mh = _matrix_from_payload(dh_lo, dh_hi, dh_w, dh_v, ohb)
            mw = _matrix_from_payload(dw_lo, dw_hi, dw_w, dw_v, owb)
            # canvas = mh @ img @ mw^T ; rows/cols beyond the live block are 0
            canvas = jnp.einsum(
                "ch,hwk->cwk", mh, img, precision="highest"
            )
            canvas = jnp.einsum(
                "dw,cwk->cdk", mw, canvas, precision="highest"
            )
            # mean-fill everywhere outside the live (centered/padded) region
            live = (dh_v[:, None] * dw_v[None, :])[..., None]
            canvas = canvas * live + mean * (1.0 - live)

            def chunk_body(acc, xs):
                cs, wt = xs

                def take(c):
                    return jax.lax.dynamic_slice(
                        canvas, (c[0], c[1], 0), (crop_h, crop_w, 3)
                    )

                wins = jax.vmap(take)(cs)
                batch = (
                    jnp.concatenate([wins, wins[:, :, ::-1]], axis=0)
                    if flip else wins
                )
                probs = forward(variables, constrain(batch))
                if flip:
                    probs = (probs[:wb] + probs[wb:][:, :, ::-1]) / 2

                def put(i, a):
                    c = cs[i]
                    patch = jax.lax.dynamic_slice(
                        a, (c[0], c[1], 0), (crop_h, crop_w, classes)
                    )
                    return jax.lax.dynamic_update_slice(
                        a, patch + probs[i] * wt[i], (c[0], c[1], 0)
                    )

                return jax.lax.fori_loop(0, wb, put, acc), None

            acc0 = jnp.zeros((chb, cwb, classes), jnp.float32)
            acc, _ = jax.lax.scan(chunk_body, acc0, (coords, weights))
            acc = acc / jnp.maximum(count, 1.0)

            uh_lo, uh_hi, uh_w, uh_v, uw_lo, uw_hi, uw_w, uw_v = up_payload
            uh = _matrix_from_payload(uh_lo, uh_hi, uh_w, uh_v, chb)
            uw = _matrix_from_payload(uw_lo, uw_hi, uw_w, uw_v, cwb)
            out = jnp.einsum("oc,cdk->odk", uh, acc, precision="highest")
            out = jnp.einsum("pd,odk->opk", uw, out, precision="highest")
            return out  # [OHB, OWB, classes]

        return jax.jit(program)

    def scale_probs(self, image_pad_dev, h: int, w: int, scale: float,
                    ohb: int, owb: int):
        """Dispatch one scale; returns device probs [OHB, OWB, classes]."""
        ev = self.ev
        crop_h, crop_w = ev.crop_h, ev.crop_w
        nh, nw = _scaled_size(h, w, scale, ev.base_size)
        pad_h = max(crop_h - nh, 0)
        pad_w = max(crop_w - nw, 0)
        pad_h_half, pad_w_half = pad_h // 2, pad_w // 2
        canvas_h, canvas_w = nh + pad_h, nw + pad_w
        chb = _round_up(canvas_h, self.bucket)
        cwb = _round_up(canvas_w, self.bucket)

        coords = _grid_coords(canvas_h, canvas_w, crop_h, crop_w,
                              ev.stride_rate)
        wb = max(1, ev.window_batch // (2 if ev.flip else 1))
        nchunks = _chunk_bucket(-(-len(coords) // wb))
        n_pad = nchunks * wb - len(coords)
        coords_arr = np.asarray(
            coords + [(0, 0)] * n_pad, np.int32
        ).reshape(nchunks, wb, 2)
        weights_arr = np.asarray(
            [1.0] * len(coords) + [0.0] * n_pad, np.float32
        ).reshape(nchunks, wb)

        count = np.zeros((chb, cwb, 1), np.float32)
        for (s_h, s_w) in coords:
            count[s_h:s_h + crop_h, s_w:s_w + crop_w] += 1.0

        # (orig h,w) -> scaled (nh, nw), written into the canvas at the
        # centered pad offset.
        down_h = _interp_payload(h, nh, ohb, chb, dst_offset=pad_h_half)
        down_w = _interp_payload(w, nw, owb, cwb, dst_offset=pad_w_half)
        # canvas live region (nh, nw) at pad offset -> orig (h, w). The
        # interp source coordinates must be offset by the pad: fold the
        # offset into the index vectors.
        up_h = _interp_payload(nh, h, chb, ohb)
        up_h = (up_h[0] + pad_h_half, up_h[1] + pad_h_half, up_h[2], up_h[3])
        up_w = _interp_payload(nw, w, cwb, owb)
        up_w = (up_w[0] + pad_w_half, up_w[1] + pad_w_half, up_w[2], up_w[3])

        key = (chb, cwb, ohb, owb, nchunks, wb)
        if key not in self._programs:
            self._programs[key] = self._build(key)
        program = self._programs[key]

        to_dev = lambda t: tuple(jnp.asarray(v) for v in t)
        return program(
            ev.variables, image_pad_dev,
            to_dev(down_h) + to_dev(down_w),
            to_dev(up_h) + to_dev(up_w),
            jnp.asarray(coords_arr), jnp.asarray(weights_arr),
            jnp.asarray(count),
        )

    def predict_probs(self, image: np.ndarray):
        """Multi-scale device probs for one image; returns (probs_dev,
        (h, w)) where probs_dev is [OHB, OWB, classes] on device."""
        h, w, _ = image.shape
        ohb, owb = _round_up(h, self.bucket), _round_up(w, self.bucket)
        image_pad = np.zeros((ohb, owb, 3), image.dtype)
        image_pad[:h, :w] = image
        img_dev = jnp.asarray(image_pad)
        total = None
        for scale in self.ev.scales:
            probs = self.scale_probs(img_dev, h, w, scale, ohb, owb)
            total = probs if total is None else total + probs
        return total / len(self.ev.scales), (h, w)
