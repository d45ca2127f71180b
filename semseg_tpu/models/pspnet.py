"""PSPNet: dilated ResNet + Pyramid Pooling Module + segmentation heads.

Capability-parity with the reference (``model/pspnet.py``), NHWC/flax:
- PPM: adaptive average pooling to bins (1,2,3,6), 1x1 ConvBN(2048->512)
  per bin, align-corners bilinear upsample back, concat -> 4096 channels
  (``model/pspnet.py:8-26``);
- main head: 3x3 ConvBN(->512) + Dropout2d(0.1) + 1x1 conv to classes
  (``:64-70``); aux head from layer3 (1024->256->classes, ``:71-78``);
- input constraint ``(H-1) % 8 == 0``; logits upsampled to
  ``(H-1)/8*zoom_factor+1`` (``:82-84,94-95``).

In train mode returns ``(logits, aux_logits)``; loss lives in the engine
(``semseg_tpu.engine.losses``) rather than inside the model.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from semseg_tpu.models.layers import (
    ConvBN,
    Dropout2d,
    default_precision,
    torch_default_bias_init,
    torch_default_conv_init,
)
from semseg_tpu.models.resnet import SEG_DILATIONS, SEG_STRIDES, ResNet
from semseg_tpu.ops import adaptive_avg_pool2d, resize_bilinear_align_corners


class PPM(nn.Module):
    """Pyramid Pooling Module."""

    reduction_dim: int
    bins: Sequence[int] = (1, 2, 3, 6)
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        h, w = x.shape[1], x.shape[2]
        out = [x]
        for i, bin_size in enumerate(self.bins):
            y = adaptive_avg_pool2d(x, bin_size)
            y = ConvBN(
                self.reduction_dim, 1, kernel_init=torch_default_conv_init,
                axis_name=self.axis_name, dtype=self.dtype,
                name=f"branch{i}",
            )(y, train)
            out.append(resize_bilinear_align_corners(y, (h, w)))
        return jnp.concatenate(out, axis=-1)


class SegHead(nn.Module):
    """3x3 ConvBN -> Dropout2d -> 1x1 conv to class logits."""

    mid_channels: int
    classes: int
    dropout: float = 0.1
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = ConvBN(
            self.mid_channels, 3, padding=1,
            kernel_init=torch_default_conv_init,
            axis_name=self.axis_name, dtype=self.dtype, name="cb",
        )(x, train)
        x = Dropout2d(self.dropout)(x, train)
        return nn.Conv(
            self.classes, (1, 1), use_bias=True,
            kernel_init=torch_default_conv_init,
            bias_init=torch_default_bias_init(self.mid_channels),
            dtype=self.dtype, param_dtype=jnp.float32,
            precision=default_precision(self.dtype), name="conv_logits",
        )(x)


class PSPNet(nn.Module):
    layers: int = 50
    bins: Tuple[int, ...] = (1, 2, 3, 6)
    dropout: float = 0.1
    classes: int = 2
    zoom_factor: int = 8
    use_ppm: bool = True
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.layers in (50, 101, 152)
        assert 2048 % len(self.bins) == 0
        assert self.classes > 1
        assert self.zoom_factor in (1, 2, 4, 8)
        h_in, w_in = x.shape[1], x.shape[2]
        assert (h_in - 1) % 8 == 0 and (w_in - 1) % 8 == 0, (h_in, w_in)
        out_h = (h_in - 1) // 8 * self.zoom_factor + 1
        out_w = (w_in - 1) // 8 * self.zoom_factor + 1

        _, _, c3, c4 = ResNet(
            depth=self.layers,
            stage_strides=SEG_STRIDES,
            stage_dilations=SEG_DILATIONS,
            remat=self.remat,
            axis_name=self.axis_name,
            dtype=self.dtype,
            name="backbone",
        )(x, train)

        feat = c4
        if self.use_ppm:
            feat = PPM(
                2048 // len(self.bins), self.bins, axis_name=self.axis_name,
                dtype=self.dtype, name="ppm",
            )(feat, train)
        logits = SegHead(
            512, self.classes, self.dropout, axis_name=self.axis_name,
            dtype=self.dtype, name="cls",
        )(feat, train)
        if self.zoom_factor != 1:
            logits = resize_bilinear_align_corners(logits, (out_h, out_w))
        logits = logits.astype(jnp.float32)

        if train:
            aux = SegHead(
                256, self.classes, self.dropout, axis_name=self.axis_name,
                dtype=self.dtype, name="aux",
            )(c3, train)
            if self.zoom_factor != 1:
                aux = resize_bilinear_align_corners(aux, (out_h, out_w))
            return logits, aux.astype(jnp.float32)
        return logits
