"""Point-wise Spatial Attention mask expansion (relative → absolute).

The reference implements this as handwritten C++/CUDA scatter kernels
(``lib/psa/src/cpu/psamask.cpp:11-113``, ``lib/psa/src/gpu/psamask_cuda.cu``):
per position ``(h, w)`` the network predicts a ``mask_h × mask_w`` grid of
relative attention logits, which are scattered into a dense
``(H·W) × (H·W)`` matrix clipped at image borders, with unwritten entries
staying exactly zero (the zeros participate in the subsequent softmax).

TPU-native design: the dense matrix is **block-Toeplitz** in the relative
offset — ``A[(h2,w2),(h,w)] = rel[h, w, h2-h+half_h, w2-w+half_w]`` — so it
can be materialized with the *skew* trick (pad + reshape + slice, the same
relative→absolute conversion used in relative-attention Transformers)
instead of a gather/scatter. Every step is a cheap XLA data-movement op
with an exact linear transpose, so autodiff produces the reference's
transpose-gather backward for free. No custom kernel is required for
correctness; the fused attention kernel (mask→softmax→aggregation) lives in
``semseg_tpu.ops.psa_pallas``.

Modes (reference ``lib/psa/functions/psamask.py:8-25``,
``model/psanet.py:53-98``):
- ``psa_type=0`` (COLLECT): ``buffer[n, src=(h2,w2), h, w] = rel@query (h,w)``
- ``psa_type=1`` (DISTRIBUTE): ``buffer[n, own=(h,w), h2, w2] = rel@query (h,w)``
"""

from __future__ import annotations

import jax.numpy as jnp

COLLECT = 0
DISTRIBUTE = 1
BI_DIRECTION = 2


def _skew(x: jnp.ndarray) -> jnp.ndarray:
    """Relative→absolute along the trailing axis pair.

    Input ``x[..., q, r]`` with ``r`` of size ``2Q-1`` holding relative
    offsets ``r - (Q-1) = k - q``; returns ``a[..., q, k]`` of size
    ``[..., Q, Q]`` with ``a[..., q, k] = x[..., q, k - q + Q - 1]``.
    """
    *batch, q, r = x.shape
    assert r == 2 * q - 1, (q, r)
    if q == 1:
        return x
    flat = x.reshape(*batch, q * (2 * q - 1))
    # a[q, k] = flat[(Q-1) + q*(2Q-2) + k]; realign by dropping the first
    # Q-1 elements, then rows of stride 2Q-2 put k in the leading columns.
    flat = flat[..., q - 1 : q - 1 + q * (2 * q - 2)]
    a = flat.reshape(*batch, q, 2 * q - 2)
    return a[..., :q]


def _pad_relative(rel: jnp.ndarray, full_h: int, full_w: int) -> jnp.ndarray:
    """Zero-pad ``rel[..., mask_h, mask_w]`` to ``[..., full_h, full_w]``.

    Padding is placed so relative offset 0 stays centered: the reference
    clips the mask window at borders and leaves unwritten buffer entries
    zero (``psamask.cpp:20-29``), which is exactly what centered zero
    padding reproduces for mask sizes below ``2H-1 × 2W-1``.
    """
    *_, mask_h, mask_w = rel.shape
    if mask_h > full_h or mask_w > full_w:
        raise ValueError(
            f"mask ({mask_h}x{mask_w}) exceeds the full relative extent "
            f"({full_h}x{full_w}) for this feature size"
        )
    half_h, half_w = (mask_h - 1) // 2, (mask_w - 1) // 2
    pad_top = (full_h - 1) // 2 - half_h
    pad_left = (full_w - 1) // 2 - half_w
    pad = [(0, 0)] * (rel.ndim - 2) + [
        (pad_top, full_h - mask_h - pad_top),
        (pad_left, full_w - mask_w - pad_left),
    ]
    return jnp.pad(rel, pad)


def _relative_to_absolute(y: jnp.ndarray, mask_h: int, mask_w: int) -> jnp.ndarray:
    """Expand NHWC relative logits to the absolute tensor T.

    ``y``: ``[N, H, W, mask_h*mask_w]`` (channel = relative offset,
    row-major ``(dh, dw)``). Returns ``T[N, H, W, H, W]`` with
    ``T[n, h, w, h2, w2] = y[n, h, w, (h2-h+half_h, w2-w+half_w)]`` for
    in-range offsets and 0 elsewhere.
    """
    n, h, w, c = y.shape
    assert c == mask_h * mask_w, (c, mask_h, mask_w)
    assert mask_h % 2 == 1 and mask_w % 2 == 1, (mask_h, mask_w)
    rel = y.reshape(n, h, w, mask_h, mask_w)
    rel = _pad_relative(rel, 2 * h - 1, 2 * w - 1)
    # Skew (w, dw) -> (w, w2): bring the pair to the trailing axes.
    t = rel.transpose(0, 1, 3, 2, 4)  # [N, H, dh, W, dw]
    t = _skew(t)  # [N, H, dh, W, W2]
    # Skew (h, dh) -> (h, h2).
    t = t.transpose(0, 3, 4, 1, 2)  # [N, W, W2, H, dh]
    t = _skew(t)  # [N, W, W2, H, H2]
    return t.transpose(0, 3, 1, 4, 2)  # [N, H, W, H2, W2]


def psa_attention_matrix(
    y: jnp.ndarray, psa_type: int, mask_h: int, mask_w: int
) -> jnp.ndarray:
    """Dense attention matrix ``A[N, HW, HW]`` in bmm orientation.

    Matches ``psa_mask(y).view(n, h*w, h*w)`` of the reference: softmax
    should be taken over axis 1 and aggregation contracts features against
    axis 1 (``out[c, j] = sum_i x[c, i] * A[i, j]``).
    """
    n, h, w, _ = y.shape
    t = _relative_to_absolute(y, mask_h, mask_w)  # [N, h, w, h2, w2]
    if psa_type == COLLECT:
        # A[src=(h2,w2), query=(h,w)]
        a = t.transpose(0, 3, 4, 1, 2)
    elif psa_type == DISTRIBUTE:
        # A[own=(h,w), target=(h2,w2)]
        a = t
    else:
        raise ValueError(f"psa_type must be 0 or 1, got {psa_type}")
    return a.reshape(n, h * w, h * w)


def psa_mask(
    y: jnp.ndarray, psa_type: int, mask_h: int, mask_w: int
) -> jnp.ndarray:
    """Reference-layout buffer ``[N, H*W, H, W]`` (NCHW channel-first).

    Per-pixel parity surface with ``lib.psa.functional.psa_mask``; ``y`` here
    is NHWC ``[N, H, W, mask_h*mask_w]``.
    """
    n, h, w, _ = y.shape
    return psa_attention_matrix(y, psa_type, mask_h, mask_w).reshape(n, h * w, h, w)


class PSAMask:
    """Callable module-style wrapper (parity with the reference
    ``lib.psa.modules.PSAMask``); defaults derive mask dims from input."""

    def __init__(self, psa_type: int = COLLECT, mask_h: int | None = None,
                 mask_w: int | None = None):
        if psa_type not in (COLLECT, DISTRIBUTE):
            raise ValueError(f"psa_type must be 0 or 1, got {psa_type}")
        if (mask_h is None) != (mask_w is None):
            raise ValueError("mask_h and mask_w must both be set or unset")
        self.psa_type = psa_type
        self.mask_h = mask_h
        self.mask_w = mask_w

    def __call__(self, y: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = y.shape
        mask_h = self.mask_h if self.mask_h is not None else 2 * h - 1
        mask_w = self.mask_w if self.mask_w is not None else 2 * w - 1
        if c != mask_h * mask_w:
            raise ValueError(
                f"channels {c} != mask_h*mask_w {mask_h * mask_w}"
            )
        return psa_mask(y, self.psa_type, mask_h, mask_w)
