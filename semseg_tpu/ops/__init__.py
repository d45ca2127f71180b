"""TPU-native compute ops (XLA + Pallas)."""

from semseg_tpu.ops.resize import resize_bilinear_align_corners
from semseg_tpu.ops.pool import adaptive_avg_pool2d, max_pool2d
from semseg_tpu.ops.psamask import psa_mask, psa_attention_matrix

__all__ = [
    "resize_bilinear_align_corners",
    "adaptive_avg_pool2d",
    "max_pool2d",
    "psa_mask",
    "psa_attention_matrix",
]
