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
import numpy as np
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


# Ambient BN group count (see BatchNorm.groups): 1 = global-batch moments
# (SyncBN under GSPMD); N = per-replica-group moments (the reference's
# ``sync_bn: False`` per-GPU BatchNorm2d). Set by build_model from the
# config; read at trace time.
_bn_groups_override = 1


def set_bn_groups(groups: int):
    global _bn_groups_override
    if groups < 1:
        raise ValueError(f"bn groups must be >= 1, got {groups}")
    _bn_groups_override = int(groups)


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
      groups: number of equal batch groups that compute *independent*
        moments. 1 (default) reduces over the whole traced batch — under
        GSPMD batch sharding that IS SyncBatchNorm (``jnp.mean`` over the
        sharded axis compiles to a local reduce + all-reduce). Setting it
        to the replica count reproduces the reference's ``sync_bn: False``
        per-GPU ``BatchNorm2d`` under DDP (reference ``tool/train.py:
        141-142`` converts to SyncBN only conditionally): each group
        normalizes with its own local-batch moments, and the running
        stats track group 0's moments — DDP's default
        ``broadcast_buffers=True`` re-broadcasts rank 0's buffers every
        forward, so rank 0's EMA is the surviving estimate.
      axis_name: mesh axis to reduce batch statistics over. When set (and
        the module runs inside shard_map/pmap over that axis), batch
        mean/variance are computed over the *global* batch — SyncBN.
      dtype: compute dtype of the normalized output (statistics are always
        accumulated in float32).
    """

    momentum: float = 0.1
    epsilon: float = 1e-5
    groups: int = 1
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    def _resolved_groups(self) -> int:
        # Like the precision override: build_model sets the ambient value
        # from `sync_bn` so every BN in a model tree switches without
        # threading an attribute through all module classes. An explicit
        # per-module `groups` wins.
        return self.groups if self.groups != 1 else _bn_groups_override

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
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
            return (y * scale + bias).astype(self.dtype)

        groups = self._resolved_groups()
        if groups > 1:
            return self._grouped(groups, x, scale, bias, ra_mean, ra_var)

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

    def _grouped(self, g, x, scale, bias, ra_mean, ra_var):
        """Per-group moments (non-sync BN). The reshape keeps the sharded
        batch axis outermost, so under GSPMD each group's reduce stays
        replica-local — no cross-replica collective, like torch per-GPU BN."""
        b = x.shape[0]
        assert b % g == 0, (b, g)
        features = x.shape[-1]
        xf = x.astype(jnp.float32).reshape(g, b // g, *x.shape[1:])
        reduce_axes = tuple(range(1, xf.ndim - 1))
        mean = jnp.mean(xf, axis=reduce_axes)  # [g, C]
        mean_sq = jnp.mean(jnp.square(xf), axis=reduce_axes)
        var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
        if not self.is_initializing():
            count = (b // g) * int(np.prod(x.shape[1:-1]))
            m = self.momentum
            unbiased = var[0] * (count / max(count - 1, 1))
            ra_mean.value = (1.0 - m) * ra_mean.value + m * mean[0]
            ra_var.value = (1.0 - m) * ra_var.value + m * unbiased
        stat_shape = (g,) + (1,) * (xf.ndim - 2) + (features,)
        y = (xf - mean.reshape(stat_shape)) * jax.lax.rsqrt(
            var.reshape(stat_shape) + self.epsilon
        )
        y = y * scale + bias
        return y.reshape(x.shape).astype(self.dtype)


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
    bn_groups: int = 1
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
        x = BatchNorm(groups=self.bn_groups, axis_name=self.axis_name,
                      dtype=self.dtype, name="bn")(
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
