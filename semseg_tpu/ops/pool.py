"""Pooling ops with PyTorch-equivalent semantics, NHWC layout.

- ``adaptive_avg_pool2d``: ``nn.AdaptiveAvgPool2d`` pooling regions
  (``start = floor(i*H/bins)``, ``end = ceil((i+1)*H/bins)``), expressed as
  two averaging matmuls so XLA maps it onto the MXU (used by the PPM,
  reference ``model/pspnet.py:14``).
- ``max_pool2d``: ``nn.MaxPool2d(kernel, stride, padding)`` with floor
  output sizing (used by the ResNet stem, reference ``model/resnet.py:115``).
"""

from __future__ import annotations

import functools

import jax.lax as lax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _pool_matrix(in_size: int, bins: int) -> np.ndarray:
    """[bins, in_size] averaging matrix with adaptive pooling regions."""
    m = np.zeros((bins, in_size), dtype=np.float32)
    for i in range(bins):
        start = (i * in_size) // bins
        end = -((-(i + 1) * in_size) // bins)  # ceil((i+1)*in/bins)
        m[i, start:end] = 1.0 / (end - start)
    return m


def adaptive_avg_pool2d(x: jnp.ndarray, output_size) -> jnp.ndarray:
    """Adaptive average pooling of NHWC ``x`` to ``(bins_h, bins_w)``."""
    if isinstance(output_size, int):
        bins_h = bins_w = output_size
    else:
        bins_h, bins_w = output_size
    n, h, w, c = x.shape
    compute_dtype = jnp.promote_types(x.dtype, jnp.float32)
    ph = jnp.asarray(_pool_matrix(h, bins_h), dtype=compute_dtype)
    pw = jnp.asarray(_pool_matrix(w, bins_w), dtype=compute_dtype)
    # precision='highest': avoid the default bf16-truncated matmul path.
    y = jnp.einsum(
        "bh,nhwc->nbwc", ph, x.astype(compute_dtype),
        preferred_element_type=compute_dtype, precision="highest",
    )
    y = jnp.einsum(
        "dw,nbwc->nbdc", pw, y,
        preferred_element_type=compute_dtype, precision="highest",
    )
    return y.astype(x.dtype)


def max_pool2d(
    x: jnp.ndarray, kernel_size: int = 3, stride: int = 2, padding: int = 1
) -> jnp.ndarray:
    """Max pooling of NHWC ``x``; padded positions never win (-inf pad).

    The init value must be a Python scalar: JAX's reverse-mode rule for
    reduce-window pattern-matches (max, -inf) and an array init defeats it.
    """
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = -float("inf")
    else:
        init = int(jnp.iinfo(x.dtype).min)
    return lax.reduce_window(
        x,
        init,
        lax.max,
        window_dimensions=(1, kernel_size, kernel_size, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
