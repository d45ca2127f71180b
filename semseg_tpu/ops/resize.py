"""Bilinear resize with align_corners=True semantics, as MXU matmuls.

The reference model upsamples logits and PPM/PSA features with
``F.interpolate(mode='bilinear', align_corners=True)`` (reference
``model/pspnet.py:25,95``, ``model/psanet.py:61,97,169``). align_corners
sampling maps output index ``i`` to input coordinate ``i * (in-1)/(out-1)``
(output size 1 maps to coordinate 0), which differs from both
``jax.image.resize`` (half-pixel centers) and cv2.

Bilinear interpolation is separable, so the resize is expressed as two
dense matrix products — ``out = M_h @ x @ M_w^T`` — which XLA tiles onto
the MXU instead of emitting gathers.

The [out, in] matrices are assembled ON DEVICE from three [out] vectors
(floor index, ceil index, fraction) via one-hots: embedding them as
dense HLO constants made large fused programs tens of MB of proto — the
six-scale Cityscapes ms program carries ~100 MB of interpolation
matrices and exceeded the compile relay's request-size limit (HTTP 413)
when compiled fresh. The assembly ``one_hot(lo)·(1−frac) +
one_hot(hi)·frac`` is bit-identical to the host-built matrix (products
with 0/1 and the lo==hi edge sum are exact in f32) and costs one fused
VPU pass that XLA overlaps with the surrounding matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] row-stochastic align-corners interpolation matrix."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1 or in_size == 1:
        # align_corners with a single output (or input) sample: coordinate 0.
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    coords = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (coords - lo).astype(np.float32)
    rows = np.arange(out_size)
    m[rows, lo] += 1.0 - frac
    m[rows, hi] += frac
    return m


@functools.lru_cache(maxsize=None)
def _interp_matrix_half_pixel(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] half-pixel-centers bilinear matrix (cv2 INTER_LINEAR grid):
    ``src = (dst + 0.5) * in/out - 0.5`` with edge clamping."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, in_size - 1)
    lo = np.floor(coords).astype(np.int64)
    lo = np.clip(lo, 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (coords - lo).astype(np.float32)
    rows = np.arange(out_size)
    m[rows, lo] += 1.0 - frac
    m[rows, hi] += frac
    return m


@functools.lru_cache(maxsize=None)
def _interp_vectors(in_size: int, out_size: int, half_pixel: bool):
    """Decompose the (cached) 2-nonzero-per-row interpolation matrix into
    (lo, hi, frac) [out] vectors for on-device assembly. Exact: rows of
    the matrix are ``(1-frac)·e_lo + frac·e_hi`` by construction (lo==hi
    rows carry a single 1.0 and decompose as frac=0)."""
    m = (_interp_matrix_half_pixel if half_pixel else _interp_matrix)(
        in_size, out_size
    )
    lo = np.zeros(out_size, np.int32)
    hi = np.zeros(out_size, np.int32)
    frac = np.zeros(out_size, np.float32)
    for r in range(out_size):
        nz = np.nonzero(m[r])[0]
        if len(nz) == 1:
            lo[r] = hi[r] = nz[0]
        else:
            lo[r], hi[r] = nz[0], nz[-1]
            frac[r] = m[r, nz[-1]]
    return lo, hi, frac


def _device_matrix(in_size: int, out_size: int, half_pixel: bool,
                   dtype) -> jnp.ndarray:
    """Assemble the [out, in] matrix on device from [out] vectors so the
    jitted program embeds ~KB of constants instead of the dense matrix."""
    lo, hi, frac = _interp_vectors(in_size, out_size, half_pixel)
    fr = jnp.asarray(frac, dtype)
    mat = (
        jax.nn.one_hot(jnp.asarray(lo), in_size, dtype=dtype)
        * (jnp.asarray(1.0, dtype) - fr)[:, None]
        + jax.nn.one_hot(jnp.asarray(hi), in_size, dtype=dtype)
        * fr[:, None]
    )
    return mat


def _resize_precision(src_dtype):
    """Matmul precision policy for the resize einsums — same rule as the
    PSA kernel's ``_precision_for`` (ops/psa_pallas.py): float32 sources
    keep precision='highest' (JAX's default truncates f32 operands to
    bfloat16; interpolation weights must apply at full f32), while
    bfloat16 sources take the native single-pass MXU path: the operand
    carries no extra mantissa for extra passes to preserve, and the
    6-pass 'highest' decomposition costs 6x the MXU work — measured on
    the ms-eval ladder, where the per-window bf16 logit upsample is a
    top non-forward cost. Note the single-pass path ALSO truncates the
    f32 interpolation-weight matrix to bf16, so a row's (1-frac, frac)
    pair, rounded independently, may not sum to exactly 1 — up to ~0.2%
    per-pixel drift even on constant inputs. The error is class-uniform
    per pixel (argmax-invariant) and inside the bf16 path's existing
    rounding license. Accumulation stays f32 either way
    (``preferred_element_type``). Any dtype OTHER than bfloat16 (f32,
    f16, f64) keeps the exact 'highest' path."""
    return None if src_dtype == jnp.bfloat16 else "highest"


def _apply_separable(x, mh, mw, squeeze, compute_dtype):
    precision = _resize_precision(x.dtype)
    y = jnp.einsum(
        "oh,nhwc->nowc", mh, x.astype(compute_dtype),
        preferred_element_type=compute_dtype, precision=precision,
    )
    y = jnp.einsum(
        "pw,nowc->nopc", mw, y,
        preferred_element_type=compute_dtype, precision=precision,
    )
    y = y.astype(x.dtype)
    return y[0] if squeeze else y


def _apply_separable_cf(x, mh, mw, compute_dtype):
    # Channels-first: resize over the LAST TWO axes of [..., H, W].
    # Same row-then-column application order as ``_apply_separable`` —
    # each output element is the same 2-nonzero-per-row weighted sum
    # (zero terms add exactly), so values match the NHWC form bit-for-
    # bit in f32. The payoff is layout: TPU tiles the two minor dims as
    # (8, 128), so a class-minor [H, W, C<128] f32 map pads C to 128
    # lanes and every elementwise pass pays 128/C the HBM traffic;
    # with W minor the padding is W -> ceil(W/128)*128 (~7% at 713).
    precision = _resize_precision(x.dtype)
    y = jnp.einsum(
        "oh,...hw->...ow", mh, x.astype(compute_dtype),
        preferred_element_type=compute_dtype, precision=precision,
    )
    y = jnp.einsum(
        "pw,...ow->...op", mw, y,
        preferred_element_type=compute_dtype, precision=precision,
    )
    return y.astype(x.dtype)


def resize_bilinear_align_corners_cf(x: jnp.ndarray, size) -> jnp.ndarray:
    """``resize_bilinear_align_corners`` for channels-first ``[..., H, W]``
    input (any number of leading batch/channel axes)."""
    out_h, out_w = int(size[0]), int(size[1])
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (out_h, out_w):
        return x
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = _device_matrix(h, out_h, False, compute_dtype)
    mw = _device_matrix(w, out_w, False, compute_dtype)
    return _apply_separable_cf(x, mh, mw, compute_dtype)


def resize_bilinear_half_pixel_cf(x: jnp.ndarray, size) -> jnp.ndarray:
    """``resize_bilinear_half_pixel`` for channels-first ``[..., H, W]``
    input (any number of leading batch/channel axes)."""
    out_h, out_w = int(size[0]), int(size[1])
    h, w = x.shape[-2], x.shape[-1]
    if (h, w) == (out_h, out_w):
        return x
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = _device_matrix(h, out_h, True, compute_dtype)
    mw = _device_matrix(w, out_w, True, compute_dtype)
    return _apply_separable_cf(x, mh, mw, compute_dtype)


def resize_bilinear_align_corners(x: jnp.ndarray, size) -> jnp.ndarray:
    """Resize NHWC (or HWC) ``x`` to ``size=(out_h, out_w)``.

    Equivalent to ``torch.nn.functional.interpolate(x_nchw, size,
    mode='bilinear', align_corners=True)``. Works for both up- and
    down-sampling (align_corners bilinear point-samples in both regimes).
    """
    out_h, out_w = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze else x
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = _device_matrix(h, out_h, False, compute_dtype)
    mw = _device_matrix(w, out_w, False, compute_dtype)
    return _apply_separable(x, mh, mw, squeeze, compute_dtype)


def resize_bilinear_half_pixel(x: jnp.ndarray, size) -> jnp.ndarray:
    """Resize NHWC (or HWC) ``x`` with half-pixel sample centers — the
    device equivalent of ``cv2.resize(..., interpolation=INTER_LINEAR)``
    (modulo cv2's 11-bit fixed-point weights). Lets the whole sliding-
    window pipeline stay on device."""
    out_h, out_w = int(size[0]), int(size[1])
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x[0] if squeeze else x
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    mh = _device_matrix(h, out_h, True, compute_dtype)
    mw = _device_matrix(w, out_w, True, compute_dtype)
    return _apply_separable(x, mh, mw, squeeze, compute_dtype)
