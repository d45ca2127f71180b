"""semseg_tpu: a TPU-native (JAX/XLA/Pallas) semantic segmentation framework.

Provides the full capability surface of the hszhao/semseg reference stack
(PSPNet / PSANet scene parsing) re-designed TPU-first:

- ``semseg_tpu.config``   — YAML experiment config system (flattened namespace,
  ``KEY VALUE`` CLI overrides), schema-compatible with the reference configs.
- ``semseg_tpu.ops``      — XLA/Pallas compute ops: align-corners bilinear
  resize as MXU matmuls, adaptive average pooling, the PSA mask
  relative→absolute attention expansion and its fused attention kernel.
- ``semseg_tpu.models``   — flax.linen model zoo: deep-base dilated ResNet
  50/101/152 backbones, PSPNet (pyramid pooling) and PSANet (point-wise
  spatial attention) heads, plus a PyTorch checkpoint converter.
- ``semseg_tpu.data``     — cv2/numpy paired augmentation pipeline and
  list-file dataset with a prefetching host loader.
- ``semseg_tpu.engine``   — jit/shard_map training step (cross-replica
  BatchNorm, torch-equivalent SGD + poly LR), sliding-window multi-scale
  evaluation engine, checkpointing.
- ``semseg_tpu.parallel`` — device mesh construction and sharding helpers.
"""

__version__ = "0.1.0"
