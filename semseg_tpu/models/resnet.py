"""Deep-base ResNet backbones (NHWC, flax.linen).

Capability-parity with the reference backbone (``model/resnet.py``):
- deep-base stem: three 3x3 convs (3->64 s2, 64->64, 64->128) + maxpool
  instead of the single 7x7 conv (``model/resnet.py:106-113``);
- BasicBlock (18/34) and Bottleneck (50/101/152) residual blocks;
- per-stage (stride, dilation) so segmentation models apply the
  dilation surgery (stage3: stride 1 dilation 2, stage4: stride 1
  dilation 4 => output stride 8, reference ``model/pspnet.py:49-58``)
  without mutating modules;
- kaiming fan_out init for convs, BN gamma=1 beta=0.

Layout is NHWC with HWIO conv kernels — the TPU-native layout — and all
convs run through XLA's conv_general_dilated (MXU). A classification head
(global avgpool + fc) is included for ImageNet-style use.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from semseg_tpu.models.layers import (
    ConvBN,
    default_precision,
    torch_default_bias_init,
    torch_default_conv_init,
)
from semseg_tpu.ops import max_pool2d


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool):
        common = dict(axis_name=self.axis_name, dtype=self.dtype)
        residual = x
        out = ConvBN(
            self.planes, 3, strides=self.stride, padding=self.dilation,
            dilation=self.dilation, name="cb1", **common,
        )(x, train)
        out = ConvBN(
            self.planes, 3, padding=self.dilation, dilation=self.dilation,
            relu=False, name="cb2", **common,
        )(out, train)
        if self.use_downsample:
            residual = ConvBN(
                self.planes * self.expansion, 1, strides=self.stride,
                relu=False, name="downsample", **common,
            )(x, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool):
        common = dict(axis_name=self.axis_name, dtype=self.dtype)
        residual = x
        out = ConvBN(self.planes, 1, name="cb1", **common)(x, train)
        # The 3x3 conv carries the stride and dilation (the reference's
        # dilation surgery rewrites exactly this conv, pspnet.py:49-58).
        out = ConvBN(
            self.planes, 3, strides=self.stride, padding=self.dilation,
            dilation=self.dilation, name="cb2", **common,
        )(out, train)
        out = ConvBN(
            self.planes * self.expansion, 1, relu=False, name="cb3", **common,
        )(out, train)
        if self.use_downsample:
            residual = ConvBN(
                self.planes * self.expansion, 1, strides=self.stride,
                relu=False, name="downsample", **common,
            )(x, train)
        return nn.relu(out + residual)


_ARCH = {
    18: (BasicBlock, (2, 2, 2, 2)),
    34: (BasicBlock, (3, 4, 6, 3)),
    50: (Bottleneck, (3, 4, 6, 3)),
    101: (Bottleneck, (3, 4, 23, 3)),
    152: (Bottleneck, (3, 8, 36, 3)),
}


class ResNet(nn.Module):
    """ResNet backbone returning per-stage feature maps.

    Attributes:
      depth: one of 18/34/50/101/152.
      deep_base: three-conv stem (the segmentation default).
      stage_strides / stage_dilations: per-stage (layer1..layer4) settings.
        Classification default: strides (1, 2, 2, 2), dilations (1, 1, 1, 1).
        Segmentation (output stride 8): strides (1, 2, 1, 1),
        dilations (1, 1, 2, 4).
    """

    depth: int = 50
    deep_base: bool = True
    stage_strides: Tuple[int, int, int, int] = (1, 2, 2, 2)
    stage_dilations: Tuple[int, int, int, int] = (1, 1, 1, 1)
    # Rematerialize each residual block in the backward pass (trades ~30%
    # FLOPs for activation memory — enables big crops / batches per chip).
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Returns (c1, c2, c3, c4): outputs of layer1..layer4."""
        block_cls, counts = _ARCH[self.depth]
        common = dict(axis_name=self.axis_name, dtype=self.dtype)

        # Stem ("layer0").
        if self.deep_base:
            x = ConvBN(64, 3, strides=2, padding=1, name="stem_cb1", **common)(x, train)
            x = ConvBN(64, 3, padding=1, name="stem_cb2", **common)(x, train)
            x = ConvBN(128, 3, padding=1, name="stem_cb3", **common)(x, train)
        else:
            x = ConvBN(64, 7, strides=2, padding=3, name="stem_cb1", **common)(x, train)
        x = max_pool2d(x, 3, 2, 1)

        feats = []
        in_planes = 128 if self.deep_base else 64
        for stage, (planes, blocks) in enumerate(
            zip((64, 128, 256, 512), counts)
        ):
            stride = self.stage_strides[stage]
            dilation = self.stage_dilations[stage]
            for b in range(blocks):
                first = b == 0
                needs_ds = first and (
                    stride != 1 or in_planes != planes * block_cls.expansion
                )
                block = block_cls(
                    planes=planes,
                    stride=stride if first else 1,
                    dilation=dilation,
                    use_downsample=needs_ds,
                    name=f"layer{stage + 1}_block{b}",
                    **common,
                )
                if self.remat:
                    x = nn.remat(
                        lambda mdl, h: mdl(h, train), prevent_cse=False
                    )(block, x)
                else:
                    x = block(x, train)
                if first:
                    in_planes = planes * block_cls.expansion
            feats.append(x)
        return tuple(feats)

class ResNetClassifier(nn.Module):
    """ImageNet-style classifier: backbone + global avgpool + fc."""

    depth: int = 50
    num_classes: int = 1000
    deep_base: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        _, _, _, c4 = ResNet(
            depth=self.depth, deep_base=self.deep_base, dtype=self.dtype,
            name="backbone",
        )(x, train)
        pooled = jnp.mean(c4, axis=(1, 2))
        # The reference's kaiming loop covers only Conv2d/BatchNorm
        # (model/resnet.py:123-128); nn.Linear fc keeps torch defaults.
        return nn.Dense(
            self.num_classes, kernel_init=torch_default_conv_init,
            bias_init=torch_default_bias_init(pooled.shape[-1]),
            param_dtype=jnp.float32, dtype=self.dtype,
            precision=default_precision(self.dtype), name="fc",
        )(pooled)


SEG_STRIDES = (1, 2, 1, 1)
SEG_DILATIONS = (1, 1, 2, 4)


def _make(depth):
    def ctor(seg: bool = True, **kwargs) -> ResNet:
        if seg:
            kwargs.setdefault("stage_strides", SEG_STRIDES)
            kwargs.setdefault("stage_dilations", SEG_DILATIONS)
        return ResNet(depth=depth, **kwargs)

    ctor.__name__ = f"resnet{depth}"
    return ctor


resnet18 = _make(18)
resnet34 = _make(34)
resnet50 = _make(50)
resnet101 = _make(101)
resnet152 = _make(152)
