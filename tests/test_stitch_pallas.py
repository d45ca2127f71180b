"""Fused upsample+softmax+flip kernel vs the XLA reference path.

Runs in Pallas interpreter mode on CPU; on real TPU hardware the same
kernel is exercised by the ms-eval pipeline (tool/ms_attrib.py ladder)
and by the device-vs-host agreement tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from semseg_tpu.ops.stitch_pallas import (
    supported,
    upsample_softmax_flip,
    upsample_softmax_flip_reference,
)


def _pairs(rs, p, hs, c, ws, dtype):
    x = rs.randn(p, 2, c, hs, ws).astype(np.float32) * 3.0
    return jnp.asarray(x, dtype)


@pytest.mark.parametrize("hs,out_h", [(13, 97), (12, 89), (7, 48)])
def test_kernel_matches_reference_f32(hs, out_h):
    """f32 operands: the kernel must match the XLA path to accumulation
    noise (same matmul-based interpolation, same f32 softmax)."""
    rs = np.random.RandomState(0)
    ws, out_w = hs, out_h
    lp = _pairs(rs, 3, hs, 5, ws, jnp.float32)
    got = upsample_softmax_flip(lp, (out_h, out_w), interpret=True)
    want = upsample_softmax_flip_reference(lp, (out_h, out_w))
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_kernel_matches_reference_bf16():
    """bf16 operands: identical container policy to the evaluator's
    existing path; tolerance covers the W-then-H rounding order."""
    rs = np.random.RandomState(1)
    hs = ws = 13
    out_h = out_w = 97
    lp = _pairs(rs, 2, hs, 4, ws, jnp.bfloat16)
    got = upsample_softmax_flip(lp, (out_h, out_w), interpret=True)
    want = upsample_softmax_flip_reference(lp, (out_h, out_w))
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0, atol=2e-2,
    )
    # probabilities: rows sum to ~1 and averaging keeps them in [0, 1]
    s = np.asarray(got, np.float32).sum(axis=1)
    np.testing.assert_allclose(s, 1.0, atol=2e-2)


def test_flip_fold_is_exact_mirror():
    """The reversed-interp-matrix fold must equal mirror-after-softmax:
    feed a pair whose flipped half is the W-mirror of the original —
    the averaged output then equals the original half's probabilities."""
    rs = np.random.RandomState(2)
    hs = ws = 9
    out = 65
    base = rs.randn(1, 6, hs, ws).astype(np.float32)
    lp = jnp.asarray(
        np.stack([base, base[..., ::-1]], axis=1)
    )  # half 1 = mirrored logits, as a flipped input would produce
    got = upsample_softmax_flip(lp, (out, out), interpret=True)
    single = upsample_softmax_flip_reference(
        jnp.asarray(np.stack([base, base[..., ::-1]], axis=1)), (out, out)
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(single), rtol=1e-5, atol=1e-6
    )
    # analytic check: with half1 = mirror(half0), mirror-after-softmax
    # undoes itself, so the average equals softmax(up(base)) alone
    from semseg_tpu.ops.resize import resize_bilinear_align_corners_cf

    up = resize_bilinear_align_corners_cf(jnp.asarray(base), (out, out))
    only = jax.nn.softmax(up.astype(jnp.float32), axis=1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(only), rtol=1e-4, atol=1e-5
    )


class _ZoomModel:
    """Minimal model stub with the attributes the fused dispatch reads:
    bf16 compute dtype, a zoom_factor!=1 head, and clone()."""

    def __init__(self, zoom_factor=8, classes=3):
        self.zoom_factor = zoom_factor
        self.classes = classes
        self.dtype = jnp.bfloat16

    def clone(self, zoom_factor):
        return _ZoomModel(zoom_factor, self.classes)

    def apply(self, variables, x, train=False):
        from semseg_tpu.ops.resize import resize_bilinear_align_corners

        h, w = x.shape[1], x.shape[2]
        f = x[:, ::8, ::8].astype(self.dtype)  # feature grid (h-1)//8+1
        m = jnp.mean(f, axis=-1, keepdims=True)
        logits = jnp.concatenate([m, 0.5 - m, 0.25 * m + 0.1], axis=-1)
        if self.zoom_factor != 1:
            out = ((h - 1) // 8 * self.zoom_factor + 1,
                   (w - 1) // 8 * self.zoom_factor + 1)
            logits = resize_bilinear_align_corners(logits, out)
        return logits


@pytest.mark.parametrize("mode", ["device", "device_bucketed"])
def test_evaluator_fused_matches_unfused(mode):
    """End-to-end: the fused Pallas window path must reproduce the XLA
    window path through the full sliding-window + multi-scale pipeline
    (device and bucketed modes; interpreter on CPU)."""
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator

    rs = np.random.RandomState(4)
    image = (rs.rand(41, 57, 3) * 2.0).astype(np.float32)
    kwargs = dict(
        classes=3, crop_h=17, crop_w=17, mean=[0.5, 0.5, 0.5],
        std=[1.0, 1.0, 1.0], base_size=57, scales=[0.75, 1.0],
        flip=True, window_batch=4, mode=mode,
    )
    # auto-dispatch is TPU-only; force the fused path on the CPU test
    # backend (runs in the Pallas interpreter)
    fused = SlidingWindowEvaluator(
        _ZoomModel(), {}, fused_stitch=True, **kwargs
    )
    assert fused.fused_stitch
    plain = SlidingWindowEvaluator(
        _ZoomModel(), {}, fused_stitch=False, **kwargs
    )
    p_f = fused.predict_probs(image)
    p_p = plain.predict_probs(image)
    np.testing.assert_allclose(p_f, p_p, atol=2e-2, rtol=1e-2)
    agree = (np.argmax(p_f, -1) == np.argmax(p_p, -1)).mean()
    assert agree > 0.995, agree


def test_strip_rows_and_dispatch():
    from semseg_tpu.ops.stitch_pallas import _padded_rows, vmem_bytes

    # Mosaic block sublane constraint: strips are 32 rows, crops (8k+1,
    # odd) pad up and the caller slices the pad off
    assert _padded_rows(713) == 736
    assert _padded_rows(473) == 480
    assert _padded_rows(97) == 128
    assert supported(713, 713, jnp.bfloat16, c=19)  # Cityscapes ms
    assert supported(705, 705, jnp.bfloat16, c=19)  # Cityscapes PSA
    assert not supported(713, 713, jnp.float32)  # f32 keeps XLA path
    # ADE's 150 classes blow the strip working set -> XLA path
    assert not supported(473, 473, jnp.bfloat16, c=150)
    # the VMEM model stays under the 12 MB dispatch budget for the
    # shapes that dispatch (16 MB scoped limit minus stack headroom)
    assert vmem_bytes(19, 90, 90, 713) < 12 * 2**20
