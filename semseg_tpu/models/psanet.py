"""PSANet: dilated ResNet + Point-wise Spatial Attention + seg heads.

Capability-parity with the reference (``model/psanet.py:9-98``), NHWC/flax.
The PSA module:
- 1x1 ConvBN reduce 2048->512 per direction;
- optional spatial shrink to ``(h-1)//shrink+1`` via align-corners bilinear;
- attention branch: 1x1 ConvBN(512) + 1x1 conv to ``mask_h*mask_w``
  relative-attention logits;
- relative->absolute expansion (``semseg_tpu.ops.psamask`` — skew-based,
  replacing the reference's CUDA collect/distribute scatter kernels) or the
  ``compact`` pure-reshape path;
- softmax over source positions, then aggregation
  ``out[c, j] = (1/norm) * sum_i x[c, i] * A[i, j]`` — a batched MXU matmul;
- bi-direction mode runs collect + distribute branches and concatenates;
- 1x1 ConvBN proj back to 2048, unshrink, concat with module input -> 4096.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from semseg_tpu.models.layers import (
    ConvBN,
    default_precision,
    torch_default_conv_init,
)
from semseg_tpu.models.pspnet import SegHead
from semseg_tpu.models.resnet import SEG_DILATIONS, SEG_STRIDES, ResNet
from semseg_tpu.ops import psa_attention_matrix, resize_bilinear_align_corners
from semseg_tpu.ops.psa_pallas import psa_softmax_bmm_auto
from semseg_tpu.ops.psamask import BI_DIRECTION, COLLECT, DISTRIBUTE


def _on_tpu() -> bool:
    import jax

    return jax.default_backend() in ("tpu", "axon")


# Fused-attention dispatch: True/False force the Pallas/XLA path; None =
# auto, which is simply "fused on TPU". Which Pallas kernel runs (resident
# whole-x vs flash source-tiled online softmax) is then chosen per static
# shape by ops/psa_pallas.select_psa_kernel from the resident kernel's
# scoped-VMEM model — the flash kernel's per-grid-step VMEM is
# hw-independent, so no shape falls back to XLA anymore. (Round 2's opaque
# batch>=8 Cityscapes-PSA compile failure was a 19.3 MB scoped allocation
# in the then-monolithic resident backward; round 3 split it; round 4's
# flash kernel removes the envelope entirely.)


def use_fused_attention(fused_attention) -> bool:
    """Resolve the fused-kernel choice for one attention branch.

    ``fused_attention``: True/False forces; None = auto — fused whenever
    running on TPU (the flash kernel covers every hw, so there is no
    size-based fallback; kernel *selection* lives in ops/psa_pallas).
    """
    if fused_attention is not None:
        return bool(fused_attention)
    return _on_tpu()


class PSA(nn.Module):
    in_channels: int = 2048
    mid_channels: int = 512
    psa_type: int = BI_DIRECTION
    compact: bool = False
    shrink_factor: int = 2
    mask_h: int = 59
    mask_w: int = 59
    normalization_factor: float = 1.0
    psa_softmax: bool = True
    # None = auto: fused Pallas softmax+aggregation on TPU (see
    # use_fused_attention; kernel choice is per-shape in ops/psa_pallas).
    fused_attention: Optional[bool] = None
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def _branch(self, x, psa_type: int, suffix: str, train: bool):
        """One attention direction: reduce, shrink, attend, aggregate."""
        xr = ConvBN(
            self.mid_channels, 1, kernel_init=torch_default_conv_init,
            axis_name=self.axis_name, dtype=self.dtype,
            name=f"reduce{suffix}",
        )(x, train)
        h, w = xr.shape[1], xr.shape[2]
        if self.shrink_factor != 1:
            h = (h - 1) // self.shrink_factor + 1
            w = (w - 1) // self.shrink_factor + 1
            xr = resize_bilinear_align_corners(xr, (h, w))
        y = ConvBN(
            self.mid_channels, 1, kernel_init=torch_default_conv_init,
            axis_name=self.axis_name, dtype=self.dtype,
            name=f"attention{suffix}_cb",
        )(xr, train)
        y = nn.Conv(
            self.mask_h * self.mask_w, (1, 1), use_bias=False,
            kernel_init=torch_default_conv_init,
            dtype=self.dtype, param_dtype=jnp.float32,
            precision=default_precision(self.dtype),
            name=f"attention{suffix}_conv",
        )(y)

        n = xr.shape[0]
        hw = h * w
        if self.compact:
            # channels directly index absolute positions (model/psanet.py:63-66,82-83)
            y_flat = y.reshape(n, hw, hw)  # [n, position, channel]
            if psa_type == COLLECT:
                a = jnp.transpose(y_flat, (0, 2, 1))
            else:
                a = y_flat
        else:
            a = psa_attention_matrix(y, psa_type, self.mask_h, self.mask_w)

        use_fused = use_fused_attention(self.fused_attention)
        x_flat = xr.reshape(n, hw, -1)
        if use_fused and self.psa_softmax:
            # Fused Pallas kernel: softmax(dim=i) + aggregation in VMEM
            # (resident or flash variant, picked per shape by the VMEM
            # model in ops/psa_pallas). A stays in the compute dtype: its
            # values come from the attention conv through pure data
            # movement, so a bf16 container loses nothing and halves A's
            # HBM traffic (the dominant cost of this op); in-kernel math
            # is f32.
            agg = psa_softmax_bmm_auto(
                jnp.transpose(x_flat, (0, 2, 1)), a,
                self.normalization_factor,
            )
            agg = jnp.transpose(agg, (0, 2, 1))
        else:
            a = a.astype(jnp.float32)
            if self.psa_softmax:
                a = nn.softmax(a, axis=1)
            # out[n, j, c] = sum_i xr[n, i, c] * a[n, i, j] (torch.bmm analog)
            agg = jnp.einsum(
                "nic,nij->njc", x_flat.astype(jnp.float32), a,
                preferred_element_type=jnp.float32,
                precision=default_precision(self.dtype),
            )
            agg = agg * (1.0 / self.normalization_factor)
        return agg.reshape(n, h, w, -1).astype(self.dtype), (h, w)

    @nn.compact
    def __call__(self, x, train: bool):
        assert self.psa_type in (COLLECT, DISTRIBUTE, BI_DIRECTION)
        out = x
        if self.psa_type in (COLLECT, DISTRIBUTE):
            feat, (h, w) = self._branch(x, self.psa_type, "", train)
        else:
            col, (h, w) = self._branch(x, COLLECT, "", train)
            dis, _ = self._branch(x, DISTRIBUTE, "_p", train)
            feat = jnp.concatenate([col, dis], axis=-1)
        feat = ConvBN(
            self.in_channels, 1, kernel_init=torch_default_conv_init,
            axis_name=self.axis_name, dtype=self.dtype,
            name="proj",
        )(feat, train)
        if self.shrink_factor != 1:
            h = (h - 1) * self.shrink_factor + 1
            w = (w - 1) * self.shrink_factor + 1
            feat = resize_bilinear_align_corners(feat, (h, w))
        return jnp.concatenate([out, feat], axis=-1)


class PSANet(nn.Module):
    layers: int = 50
    dropout: float = 0.1
    classes: int = 2
    zoom_factor: int = 8
    use_psa: bool = True
    psa_type: int = BI_DIRECTION
    compact: bool = False
    shrink_factor: int = 2
    mask_h: int = 59
    mask_w: int = 59
    normalization_factor: float = 1.0
    psa_softmax: bool = True
    fused_attention: Optional[bool] = None
    remat: bool = False
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.layers in (50, 101, 152)
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
        if self.use_psa:
            feat = PSA(
                in_channels=2048,
                mid_channels=512,
                psa_type=self.psa_type,
                compact=self.compact,
                shrink_factor=self.shrink_factor,
                mask_h=self.mask_h,
                mask_w=self.mask_w,
                normalization_factor=self.normalization_factor,
                psa_softmax=self.psa_softmax,
                fused_attention=self.fused_attention,
                axis_name=self.axis_name,
                dtype=self.dtype,
                name="psa",
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
