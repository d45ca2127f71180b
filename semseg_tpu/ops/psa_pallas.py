"""Fused PSA attention aggregation: Pallas TPU kernel.

Computes ``out[c, j] = (1/norm) * sum_i x[c, i] * softmax_i(A[i, j])``
— the softmax(dim=1) + bmm hot spot of the PSA module (reference
``model/psanet.py:68-70``, O((H·W)²·C)) — in one kernel, so the softmaxed
(H·W)×(H·W) attention never round-trips HBM: each query tile's column
softmax is computed in VMEM and immediately contracted against ``x`` on
the MXU.

Grid: ``(N, HW/TJ)`` over batch and query tiles. Per step the kernel holds
``x`` ([C, HW]) and one attention tile ([HW, TJ]) in VMEM; for the
flagship shapes (C=512, HW≤2048 padded) that is ~4 MB + ~1 MB — well
inside the 16 MB budget. A custom VJP recomputes the softmax tile in the
backward kernels instead of saving it (flash-attention-style remat).

Inputs are padded to lane/sublane multiples outside the kernel; padded
attention columns are masked with -inf so they contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
# 16 covers both f32 (min sublane tile 8) and bf16 (16) operands.
SUBLANE = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fwd_kernel(x_ref, a_ref, norm_ref, out_ref, *, hw: int, precision):
    """One (batch, query-tile) step.

    x_ref:   [C, HWp]   features (source-position major)
    a_ref:   [HWp, TJ]  attention logits for this query tile
    norm_ref:[1, 1]     1/normalization_factor (SMEM)
    out_ref: [C, TJ]
    """
    a = a_ref[0].astype(jnp.float32)
    hwp = a.shape[0]
    if hwp != hw:  # mask padded source rows out of the softmax
        row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        a = jnp.where(row < hw, a, -jnp.inf)
    col_max = jnp.max(a, axis=0, keepdims=True)
    e = jnp.exp(a - col_max)
    denom = jnp.sum(e, axis=0, keepdims=True)
    p = e / denom
    out_ref[0] = (
        jnp.dot(
            x_ref[0].astype(jnp.float32), p,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        * norm_ref[0, 0]
    )


def _precision_for(x, a):
    """f32 operands keep full-precision MXU passes (the reference-numerics
    training default); bf16 operands take the fast path (they carry no
    extra mantissa to preserve)."""
    if x.dtype == jnp.float32 and a.dtype == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return None


def _fwd(x: jnp.ndarray, a: jnp.ndarray, norm: float, tile_j: int,
         interpret: bool = False):
    n, c, hw = x.shape
    assert a.shape == (n, hw, hw), (x.shape, a.shape)
    hwp = _round_up(hw, SUBLANE)
    jp = _round_up(hw, tile_j)
    cp = _round_up(c, SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, cp - c), (0, hwp - hw)))
    ap = jnp.pad(a, ((0, 0), (0, hwp - hw), (0, jp - hw)))
    norm_arr = jnp.full((1, 1), 1.0 / norm, jnp.float32)

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, hw=hw, precision=_precision_for(x, a)),
        grid=(n, jp // tile_j),
        in_specs=[
            pl.BlockSpec((1, cp, hwp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hwp, tile_j), lambda b, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, cp, tile_j), lambda b, j: (b, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cp, jp), jnp.float32),
        interpret=interpret,
    )(xp, ap, norm_arr)
    return out[:, :c, :hw]


def _softmax_tile(a_ref, hw: int):
    """Column softmax of one [HWp, TJ] tile, masking padded source rows."""
    a = a_ref[0].astype(jnp.float32)
    hwp = a.shape[0]
    if hwp != hw:
        row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0)
        a = jnp.where(row < hw, a, -jnp.inf)
    col_max = jnp.max(a, axis=0, keepdims=True)
    e = jnp.exp(a - col_max)
    return e / jnp.sum(e, axis=0, keepdims=True)


def _bwd_da_kernel(x_ref, a_ref, g_ref, norm_ref, da_ref, *, hw: int,
                   precision):
    """da for one (batch, query-tile) step.

      dP[i, j] = sum_c x[c, i] * g[c, j] * inv_norm      (x^T @ g)
      da[i, j] = p * (dP - sum_i p * dP)                  (softmax vjp)
    """
    p = _softmax_tile(a_ref, hw)
    g = g_ref[0].astype(jnp.float32) * norm_ref[0, 0]
    x = x_ref[0].astype(jnp.float32)
    dp = jnp.dot(x.T, g, preferred_element_type=jnp.float32,
                 precision=precision)
    da_ref[0] = p * (dp - jnp.sum(p * dp, axis=0, keepdims=True))


def _bwd_dx_kernel(a_ref, g_ref, norm_ref, dx_ref, *, hw: int, precision):
    """dx for one (batch, query-tile) step, accumulated across query
    tiles (grid dim 1 revisits the block):

      dx[c, i] += sum_j g[c, j] * p[i, j] * inv_norm      (dx = g @ p^T)

    Split from the da kernel so neither holds x AND the [C, HWp] f32
    accumulator at once: the combined kernel's scoped VMEM reached
    19.3 MB at the Cityscapes-PSA extent (hw=2025) — over the 16 MB
    budget — which is exactly the round-2 whole-program compile failure
    (the relay surfaced it as an opaque HTTP 500). Separated, each
    kernel double-buffers comfortably under the limit and batch-16
    Cityscapes-PSA compiles on the fused path.
    """
    p = _softmax_tile(a_ref, hw)
    g = g_ref[0].astype(jnp.float32) * norm_ref[0, 0]
    dx_tile = jnp.dot(g, p.T, preferred_element_type=jnp.float32,
                      precision=precision)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dx_ref[0] = dx_tile

    @pl.when(pl.program_id(1) != 0)
    def _acc():
        dx_ref[0] = dx_ref[0] + dx_tile


def _bwd(tile_j: int, norm: float, interpret: bool, residuals, grad):
    x, a = residuals
    n, c, hw = x.shape
    hwp = _round_up(hw, SUBLANE)
    jp = _round_up(hw, tile_j)
    cp = _round_up(c, SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, cp - c), (0, hwp - hw)))
    ap = jnp.pad(a, ((0, 0), (0, hwp - hw), (0, jp - hw)))
    gp = jnp.pad(grad, ((0, 0), (0, cp - c), (0, jp - hw)))
    norm_arr = jnp.full((1, 1), 1.0 / norm, jnp.float32)
    precision = _precision_for(x, a)

    a_spec = pl.BlockSpec((1, hwp, tile_j), lambda b, j: (b, 0, j),
                          memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, cp, tile_j), lambda b, j: (b, 0, j),
                          memory_space=pltpu.VMEM)
    da = pl.pallas_call(
        functools.partial(_bwd_da_kernel, hw=hw, precision=precision),
        grid=(n, jp // tile_j),
        in_specs=[
            pl.BlockSpec((1, cp, hwp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            a_spec, g_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=a_spec,
        out_shape=jax.ShapeDtypeStruct((n, hwp, jp), jnp.float32),
        interpret=interpret,
    )(xp, ap, gp, norm_arr)
    dx = pl.pallas_call(
        functools.partial(_bwd_dx_kernel, hw=hw, precision=precision),
        grid=(n, jp // tile_j),
        in_specs=[
            a_spec, g_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, cp, hwp), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, cp, hwp), jnp.float32),
        interpret=interpret,
    )(ap, gp, norm_arr)
    # custom_vjp cotangents must match the primal dtypes (bf16 operands
    # keep bf16 gradients, like the rest of the bf16 compute path).
    return (
        dx[:, :c, :hw].astype(x.dtype),
        da[:, :hw, :hw].astype(a.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def psa_softmax_bmm(x, a, norm: float = 1.0, tile_j: int = LANE,
                    interpret: bool = False):
    """``(1/norm) * x @ softmax(a, axis=1)`` fused on TPU.

    x: [N, C, HW] features; a: [N, HW, HW] attention logits (softmax over
    axis 1). f32 or bf16 operands (bf16 halves the HBM traffic of A, the
    dominant cost; all in-VMEM math is f32 either way). Returns
    [N, C, HW] float32. ``interpret=True`` runs the kernel in the Pallas
    interpreter (CPU testing).
    """
    return _fwd(x, a, norm, tile_j, interpret)


def _vjp_fwd(x, a, norm, tile_j, interpret):
    return _fwd(x, a, norm, tile_j, interpret), (x, a)


def _vjp_bwd(norm, tile_j, interpret, residuals, grad):
    return _bwd(tile_j, norm, interpret, residuals, grad)


psa_softmax_bmm.defvjp(_vjp_fwd, _vjp_bwd)


def psa_softmax_bmm_reference(x, a, norm: float = 1.0):
    """Plain-XLA reference implementation (used on CPU and in tests)."""
    p = jax.nn.softmax(a.astype(jnp.float32), axis=1)
    return (
        jnp.einsum(
            "nci,nij->ncj", x.astype(jnp.float32), p,
            preferred_element_type=jnp.float32, precision="highest",
        )
        / norm
    )
