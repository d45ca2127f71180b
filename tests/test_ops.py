"""Op-level golden tests against PyTorch / numpy oracles.

The psamask oracle is an independent numpy reimplementation of the scatter
semantics documented in the reference C++ kernels
(``lib/psa/src/cpu/psamask.cpp:11-61``): per position, the valid window of
the relative mask is written into a pre-zeroed dense buffer.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from semseg_tpu.ops import (
    adaptive_avg_pool2d,
    max_pool2d,
    psa_attention_matrix,
    psa_mask,
    resize_bilinear_align_corners,
)


# ---------------------------------------------------------------------------
# resize
# ---------------------------------------------------------------------------
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((8, 8), (16, 16)),
        ((6, 6), (60, 60)),
        ((60, 60), (473, 473)),
        ((30, 30), (59, 59)),       # PSA shrink inverse
        ((59, 59), (30, 30)),       # PSA shrink (downsample)
        ((119, 119), (60, 60)),     # label downscale path
        ((5, 9), (13, 7)),          # non-square, mixed up/down
        ((4, 4), (1, 1)),           # degenerate output
        ((1, 1), (5, 5)),           # degenerate input
    ],
)
def test_resize_align_corners_matches_torch(rng, in_hw, out_hw):
    n, c = 2, 3
    x = rng.randn(n, *in_hw, c).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), out_hw))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_hw,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((20, 30), (40, 60)),     # upscale
        ((41, 61), (20, 30)),     # downscale
        ((1024, 64), (512, 32)),  # long-side halving
        ((13, 17), (29, 23)),     # odd mixed
    ],
)
def test_resize_half_pixel_matches_cv2(rng, in_hw, out_hw):
    import cv2

    from semseg_tpu.ops.resize import resize_bilinear_half_pixel

    x = (rng.rand(*in_hw, 3) * 255).astype(np.float32)
    got = np.asarray(resize_bilinear_half_pixel(jnp.asarray(x), out_hw))
    want = cv2.resize(x, out_hw[::-1], interpolation=cv2.INTER_LINEAR)
    # cv2 uses 11-bit fixed-point interpolation weights; allow that slack.
    np.testing.assert_allclose(got, want, atol=0.5, rtol=1e-3)


@pytest.mark.parametrize("half_pixel", [False, True])
@pytest.mark.parametrize(
    "in_out",
    [(90, 713), (713, 90), (1024, 1792), (3584, 2048), (1, 5), (4, 1),
     (59, 30), (257, 193)],
)
def test_device_interp_matrix_bit_identical_to_host(in_out, half_pixel):
    """The on-device one-hot assembly (which keeps dense [out, in]
    interpolation matrices out of the HLO proto — large fused programs
    exceeded the compile relay's request-size limit) must reproduce the
    host-built matrix BIT-exactly: every resize golden in this file, and
    the export byte-identity pins, ride on it."""
    from semseg_tpu.ops.resize import (
        _device_matrix,
        _interp_matrix,
        _interp_matrix_half_pixel,
    )

    in_size, out_size = in_out
    host = (_interp_matrix_half_pixel if half_pixel else _interp_matrix)(
        in_size, out_size
    )
    dev = np.asarray(_device_matrix(in_size, out_size, half_pixel,
                                    jnp.float32))
    np.testing.assert_array_equal(dev, host)


def test_resize_identity_is_noop(rng):
    x = rng.randn(1, 7, 7, 2).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (7, 7)))
    np.testing.assert_array_equal(got, x)


def test_resize_hwc_rank3(rng):
    x = rng.randn(5, 5, 4).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (9, 9)))
    assert got.shape == (9, 9, 4)


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("bins", [1, 2, 3, 6])
@pytest.mark.parametrize("in_hw", [(60, 60), (59, 59), (13, 17), (6, 6)])
def test_adaptive_avg_pool_matches_torch(rng, bins, in_hw):
    x = rng.randn(2, *in_hw, 5).astype(np.float32)
    got = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), bins))
    want = (
        F.adaptive_avg_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), bins)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw", [(237, 237), (233, 233), (12, 15)])
def test_max_pool_matches_torch(rng, in_hw):
    x = rng.randn(2, *in_hw, 4).astype(np.float32)
    got = np.asarray(max_pool2d(jnp.asarray(x), 3, 2, 1))
    want = (
        F.max_pool2d(torch.from_numpy(x).permute(0, 3, 1, 2), 3, 2, 1)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# psamask
# ---------------------------------------------------------------------------
def psamask_oracle(mask_nchw, psa_type, mask_h, mask_w):
    """Numpy port of the reference kernel semantics (psamask.cpp:11-61)."""
    n, c, feat_h, feat_w = mask_nchw.shape
    assert c == mask_h * mask_w
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    buf = np.zeros((n, feat_h * feat_w, feat_h, feat_w), dtype=mask_nchw.dtype)
    for b in range(n):
        for h in range(feat_h):
            for w in range(feat_w):
                hstart = max(0, half_h - h)
                hend = min(mask_h, feat_h + half_h - h)
                wstart = max(0, half_w - w)
                wend = min(mask_w, feat_w + half_w - w)
                for hidx in range(hstart, hend):
                    for widx in range(wstart, wend):
                        other = (hidx + h - half_h) * feat_w + (widx + w - half_w)
                        val = mask_nchw[b, hidx * mask_w + widx, h, w]
                        if psa_type == 0:  # collect
                            buf[b, other, h, w] = val
                        else:  # distribute
                            buf[b, h * feat_w + w].reshape(-1)[other] = val
    return buf


@pytest.mark.parametrize("psa_type", [0, 1])
@pytest.mark.parametrize(
    "feat_hw,mask_hw",
    [
        ((6, 6), (11, 11)),   # default mask = 2H-1 (fully dense)
        ((5, 7), (9, 13)),    # non-square, default
        ((6, 6), (5, 5)),     # small mask: structural zeros remain
        ((4, 4), (3, 5)),     # asymmetric small mask
        ((1, 1), (1, 1)),     # degenerate
    ],
)
def test_psa_mask_matches_reference_semantics(rng, psa_type, feat_hw, mask_hw):
    feat_h, feat_w = feat_hw
    mask_h, mask_w = mask_hw
    n, c = 2, mask_h * mask_w
    mask_nchw = rng.randn(n, c, feat_h, feat_w).astype(np.float32)
    want = psamask_oracle(mask_nchw, psa_type, mask_h, mask_w)

    y_nhwc = jnp.asarray(mask_nchw.transpose(0, 2, 3, 1))
    got = np.asarray(psa_mask(y_nhwc, psa_type, mask_h, mask_w))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_psa_mask_at_flagship_scale(rng):
    """Real ADE20K PSA dims: 30x30 features, 59x59 mask (fully dense)."""
    feat_h = feat_w = 30
    mask_h = mask_w = 59
    mask_nchw = rng.randn(1, mask_h * mask_w, feat_h, feat_w).astype(np.float32)
    want = psamask_oracle(mask_nchw, 0, mask_h, mask_w)
    got = np.asarray(
        psa_mask(jnp.asarray(mask_nchw.transpose(0, 2, 3, 1)), 0, mask_h, mask_w)
    )
    np.testing.assert_array_equal(got, want)
    # fully dense: no structural zeros at default mask extent
    assert (got != 0).all() or (mask_nchw == 0).any() is False


def test_psa_attention_matrix_matches_buffer_view(rng):
    feat_h = feat_w = 5
    mask_h = mask_w = 2 * feat_h - 1
    mask_nchw = rng.randn(1, mask_h * mask_w, feat_h, feat_w).astype(np.float32)
    y = jnp.asarray(mask_nchw.transpose(0, 2, 3, 1))
    a = np.asarray(psa_attention_matrix(y, 0, mask_h, mask_w))
    buf = psamask_oracle(mask_nchw, 0, mask_h, mask_w)
    np.testing.assert_array_equal(a, buf.reshape(1, feat_h * feat_w, -1))


def test_psa_mask_gradient_matches_transpose_gather(rng):
    """VJP must equal the reference backward: an exact gather of the
    cotangent at the scattered locations (psamask.cpp:63-113)."""
    import jax

    feat_h = feat_w = 4
    mask_h = mask_w = 5  # smaller than 2H-1: exercises clipping
    y = jnp.asarray(
        rng.randn(1, feat_h, feat_w, mask_h * mask_w).astype(np.float32)
    )
    g = rng.randn(1, feat_h * feat_w, feat_h, feat_w).astype(np.float32)

    _, vjp = jax.vjp(lambda m: psa_mask(m, 0, mask_h, mask_w), y)
    (dy,) = vjp(jnp.asarray(g))
    dy = np.asarray(dy)

    # Oracle gradient: for each written (query, offset) pair, the gradient
    # is the cotangent at the written buffer position; unwritten are zero.
    half = (mask_h - 1) // 2
    want = np.zeros_like(np.asarray(y))
    for h in range(feat_h):
        for w in range(feat_w):
            for hidx in range(max(0, half - h), min(mask_h, feat_h + half - h)):
                for widx in range(max(0, half - w), min(mask_w, feat_w + half - w)):
                    other = (hidx + h - half) * feat_w + (widx + w - half)
                    want[0, h, w, hidx * mask_w + widx] = g[0, other, h, w]
    np.testing.assert_array_equal(dy, want)
