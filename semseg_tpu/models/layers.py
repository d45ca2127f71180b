"""Core layers: cross-replica BatchNorm and conv helpers (NHWC).

The BatchNorm here is a real framework component, not a wrapper: it
reproduces PyTorch BatchNorm2d numerics (biased variance for
normalization, unbiased for the running estimate, ``running = (1-m)*running
+ m*batch``) and generalizes to cross-replica ("Sync") statistics with a
single mesh-axis reduction — the TPU-native replacement for
``nn.SyncBatchNorm.convert_sync_batchnorm`` (reference ``tool/train.py:141``).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

# PyTorch kaiming_normal_(mode='fan_out', nonlinearity='relu') equivalent
# (reference model/resnet.py:123-128).
kaiming_normal_fan_out = nn.initializers.variance_scaling(
    2.0, "fan_out", "normal"
)

# PyTorch's default Conv2d/Linear weight init (kaiming_uniform_ with
# a=sqrt(5)) reduces to U(+-sqrt(1/fan_in)). In the reference the explicit
# kaiming init runs only inside ResNet.__init__ (model/resnet.py:123-128);
# every conv created at the PSPNet/PSANet level (PPM branches, seg heads,
# PSA reduce/attention/proj — model/pspnet.py:15-78, model/psanet.py:20-51)
# keeps this torch default, so new-module call sites here pass it
# explicitly for init-distribution parity.
torch_default_conv_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


def torch_default_bias_init(fan_in: int):
    """PyTorch Conv2d/Linear default bias init: U(+-1/sqrt(fan_in))."""
    bound = float(fan_in) ** -0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(
            key, shape, dtype, minval=-bound, maxval=bound
        )

    return init


# Optional global precision override (config `matmul_precision`): lets a
# float32-compute run trade exactness for MXU passes — 'high' on TPU is
# the 3-pass bfloat16 decomposition (~f32-grade accuracy at a fraction of
# native-f32 cost), 'highest' is full float32. None = per-dtype default.
_precision_override = None


def set_precision_override(precision):
    global _precision_override
    if precision not in (None, "default", "high", "highest"):
        raise ValueError(f"matmul_precision must be default/high/highest, "
                         f"got {precision}")
    _precision_override = None if precision in (None, "default") else precision


def default_precision(dtype):
    """Matmul/conv precision policy.

    JAX's default matmul precision truncates operands to bfloat16. That is
    the intended fast path when the compute dtype *is* bfloat16, but in
    float32 mode (eval parity against reference checkpoints) operands must
    stay full precision — unless explicitly overridden (above).
    """
    if dtype == jnp.float32:
        return _precision_override or "highest"
    return None


class BatchNorm(nn.Module):
    """BatchNorm2d with PyTorch numerics and optional cross-replica stats.

    Attributes:
      momentum: PyTorch-convention momentum ``m``:
        ``running = (1 - m) * running + m * batch``.
      epsilon: added to variance.
      axis_name: mesh axis to reduce batch statistics over. When set (and
        the module runs inside shard_map/pmap over that axis), batch
        mean/variance are computed over the *global* batch — SyncBN.
      dtype: compute dtype of the normalized output (statistics are always
        accumulated in float32).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, use_running_average: bool) -> jnp.ndarray:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
            local_count = 1
            for ax in reduce_axes:
                local_count *= x.shape[ax]
            count = local_count
            if self.axis_name is not None:
                # Cross-replica statistics: every replica holds an
                # equal-size shard, so pmean of the moments is exact.
                mean = jax.lax.pmean(mean, self.axis_name)
                mean_sq = jax.lax.pmean(mean_sq, self.axis_name)
                count = local_count * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                # PyTorch stores the *unbiased* variance estimate.
                unbiased = var * (count / max(count - 1, 1))
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BatchNorm + optional ReLU, NHWC.

    ``kernel_init`` defaults to the backbone's kaiming fan_out; modules
    the reference builds outside ResNet.__init__ pass
    ``torch_default_conv_init`` instead (see note above).
    """

    features: int
    kernel_size: Union[int, Sequence[int]] = 1
    strides: int = 1
    padding: int = 0
    dilation: int = 1
    relu: bool = True
    kernel_init: Callable = kaiming_normal_fan_out
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        k = self.kernel_size
        k = (k, k) if isinstance(k, int) else tuple(k)
        x = nn.Conv(
            self.features,
            kernel_size=k,
            strides=(self.strides, self.strides),
            padding=[(self.padding, self.padding)] * 2,
            kernel_dilation=(self.dilation, self.dilation),
            use_bias=False,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            precision=default_precision(self.dtype),
            name="conv",
        )(x)
        x = BatchNorm(axis_name=self.axis_name, dtype=self.dtype, name="bn")(
            x, use_running_average=not train
        )
        if self.relu:
            x = nn.relu(x)
        return x


class Dropout2d(nn.Module):
    """Channel-wise (spatial) dropout: zeroes whole channels per sample,
    matching ``nn.Dropout2d`` (reference ``model/pspnet.py:68``)."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool) -> jnp.ndarray:
        return nn.Dropout(rate=self.rate, broadcast_dims=(1, 2))(
            x, deterministic=not train
        )
