"""Fused PSA attention aggregation: Pallas TPU kernel.

Computes ``out[c, j] = (1/norm) * sum_i x[c, i] * softmax_i(A[i, j])``
— the softmax(dim=1) + bmm hot spot of the PSA module (reference
``model/psanet.py:68-70``, O((H·W)²·C)) — in one kernel, so the softmaxed
(H·W)×(H·W) attention never round-trips HBM: each query tile's column
softmax is computed in VMEM and immediately contracted against ``x`` on
the MXU.

Two kernels, picked automatically by :func:`psa_softmax_bmm_auto`:

- **resident** (:func:`psa_softmax_bmm`): grid ``(N, HW/TJ)``; per step
  holds all of ``x`` ([C, HW]) plus one attention tile ([HW, TJ]) in
  VMEM. Minimal HBM traffic (x is fetched once per batch row), but the
  footprint grows with HW — it fits the shipped shrink_factor=2 recipes
  (C=512, HW≤2048 padded: ~4 MB + ~1 MB).
- **flash** (:func:`psa_softmax_bmm_flash`): additionally tiles the
  source axis with an online softmax (running max/denominator), so
  per-grid-step VMEM is independent of HW — covers f32 operands at the
  Cityscapes-PSA eval extent and shrink_factor=1 recipes (HW≥7000),
  matching the reference CUDA kernel's hw-unboundedness
  (``lib/psa/src/gpu/psamask_cuda.cu:8-106``).

Custom VJPs recompute softmax tiles in the backward kernels instead of
saving the (H·W)² attention (flash-attention-style remat). Inputs are
padded to lane/sublane multiples outside the kernels; padded source rows
are masked with -inf so they contribute nothing.
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


# ---------------------------------------------------------------------------
# Flash variant: source-tiled online softmax.
#
# The resident kernel above holds the whole [C, HWp] feature block in VMEM
# per grid step, so its footprint grows with hw and the auto rule had to
# fall back to XLA exactly where dense attention hurts most (f32 operands at
# the Cityscapes-PSA eval extent hw=2025; any shrink_factor=1 recipe with
# hw>=7000, where XLA materializes a multi-hundred-MB softmaxed attention in
# HBM). This variant additionally tiles the source-position axis i with a
# running max/denominator (flash-attention style), so per-grid-step VMEM is
# independent of hw — matching the hw-unbounded reference CUDA kernel
# (lib/psa/src/gpu/psamask_cuda.cu:8-106) on TPU.
#
# Forward grid (N, J, I), I innermost: the output tile, running max m and
# running denominator l live in revisited output blocks (index maps ignore
# i), rescaled by exp(m_old - m_new) as new source tiles arrive, finalized
# (x inv_norm / l) at the last i step. m and l are returned and saved as
# residuals so the backward recomputes softmax tiles without a second
# online pass; the per-column softmax-VJP reduction uses the flash identity
#   sum_i p[i,j] * dp[i,j] = sum_c g[c,j] * out[c,j]
# (delta), computed from the saved output in plain XLA. Backward grid
# (N, I, J), J innermost: da tiles are written per (i, j); dx accumulates
# over j in a revisited [Cp, TI] block.
# ---------------------------------------------------------------------------

# Default tile caps. Forward: [Cp, TI] + [TI, TJ] + [Cp, TJ] f32 blocks at
# C=512 are 3 MB/step, ~8 MB double-buffered with temporaries (Mosaic's
# own accounting rejects 1024-tiles at f32: 17.4-22.4 MB scoped). Backward
# holds five blocks (x, g, a, da, dx) plus softmax temporaries; tile size
# trades per-grid-step overhead (small tiles = many steps) against scoped
# VMEM — SEMSEG_FLASH_BWD_TILE overrides for probing.
FLASH_TILE_I = 512
FLASH_TILE_J = 512


def _flash_bwd_tile() -> int:
    import os

    # 384 measured fastest at the shrink-1 extent (v5e, b1 hw=7921 f32
    # grad: 32.5 ms vs 50.7 at 256); 512 exceeds scoped VMEM (18.27M).
    return int(os.environ.get("SEMSEG_FLASH_BWD_TILE", 384))


def _flash_tiles(hw: int, cap_i: int, cap_j: int):
    ti = min(cap_i, _round_up(hw, SUBLANE))
    tj = min(cap_j, _round_up(hw, LANE))
    return ti, tj


def _flash_fwd_kernel(x_ref, a_ref, norm_ref, out_ref, m_ref, l_ref, *,
                      hw: int, ti: int, precision):
    """One (batch, query-tile, source-tile) step of the online softmax.

    x_ref:   [Cp, TI]  feature tile for source positions i
    a_ref:   [TI, TJ]  attention-logit tile
    out/m/l: revisited blocks for query tile j — [Cp, TJ], [1, TJ], [1, TJ]
    """
    i = pl.program_id(2)
    a = a_ref[0].astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + i * ti
    a = jnp.where(row < hw, a, -jnp.inf)  # mask padded source rows
    tile_max = jnp.max(a, axis=0, keepdims=True)
    x = x_ref[0].astype(jnp.float32)

    @pl.when(i == 0)
    def _init():
        e = jnp.exp(a - tile_max)
        m_ref[0] = tile_max
        l_ref[0] = jnp.sum(e, axis=0, keepdims=True)
        out_ref[0] = jnp.dot(x, e, preferred_element_type=jnp.float32,
                             precision=precision)

    @pl.when(i != 0)
    def _acc():
        m_old = m_ref[0]
        m_new = jnp.maximum(m_old, tile_max)
        alpha = jnp.exp(m_old - m_new)
        e = jnp.exp(a - m_new)
        m_ref[0] = m_new
        l_ref[0] = l_ref[0] * alpha + jnp.sum(e, axis=0, keepdims=True)
        out_ref[0] = out_ref[0] * alpha + jnp.dot(
            x, e, preferred_element_type=jnp.float32, precision=precision)

    @pl.when(i == pl.num_programs(2) - 1)
    def _fin():
        out_ref[0] = out_ref[0] * (norm_ref[0, 0] / l_ref[0])


def _flash_fwd(x, a, norm: float, cap_i: int, cap_j: int,
               interpret: bool = False):
    n, c, hw = x.shape
    assert a.shape == (n, hw, hw), (x.shape, a.shape)
    ti, tj = _flash_tiles(hw, cap_i, cap_j)
    hwp = _round_up(hw, ti)
    jp = _round_up(hw, tj)
    cp = _round_up(c, SUBLANE)
    xp = jnp.pad(x, ((0, 0), (0, cp - c), (0, hwp - hw)))
    ap = jnp.pad(a, ((0, 0), (0, hwp - hw), (0, jp - hw)))
    norm_arr = jnp.full((1, 1), 1.0 / norm, jnp.float32)

    out, m, l = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, hw=hw, ti=ti,
                          precision=_precision_for(x, a)),
        grid=(n, jp // tj, hwp // ti),
        in_specs=[
            pl.BlockSpec((1, cp, ti), lambda b, j, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, tj), lambda b, j, i: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cp, tj), lambda b, j, i: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tj), lambda b, j, i: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tj), lambda b, j, i: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, cp, jp), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, jp), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, jp), jnp.float32),
        ),
        interpret=interpret,
    )(xp, ap, norm_arr)
    return out[:, :c, :hw], m[:, 0, :hw], l[:, 0, :hw]


def _flash_bwd_kernel(x_ref, g_ref, a_ref, m_ref, l_ref, d_ref, norm_ref,
                      da_ref, dx_ref, *, hw: int, ti: int, precision):
    """One (batch, source-tile, query-tile) backward step.

      p        = exp(a - m) / l                     (recomputed tile)
      da[i,j]  = p * (inv * (x^T @ g) - delta[j])   (softmax VJP)
      dx[c,i] += inv * (g @ p^T)                     (accumulated over j)
    """
    i = pl.program_id(1)
    j = pl.program_id(2)
    a = a_ref[0].astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, 0) + i * ti
    a = jnp.where(row < hw, a, -jnp.inf)  # padded source rows -> p == 0
    p = jnp.exp(a - m_ref[0]) / l_ref[0]
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    inv = norm_ref[0, 0]
    dp = jnp.dot(x.T, g, preferred_element_type=jnp.float32,
                 precision=precision) * inv
    da_ref[0] = p * (dp - d_ref[0])
    dx_tile = jnp.dot(g, p.T, preferred_element_type=jnp.float32,
                      precision=precision) * inv

    @pl.when(j == 0)
    def _init():
        dx_ref[0] = dx_tile

    @pl.when(j != 0)
    def _acc():
        dx_ref[0] = dx_ref[0] + dx_tile


def _flash_bwd(norm: float, interpret: bool, cap_i: int, cap_j: int,
               residuals, grad):
    x, a, m, l, out = residuals
    n, c, hw = x.shape
    bwd_tile = _flash_bwd_tile()
    ti, tj = _flash_tiles(hw, min(cap_i, bwd_tile), min(cap_j, bwd_tile))
    hwp = _round_up(hw, ti)
    jp = _round_up(hw, tj)
    cp = _round_up(c, SUBLANE)
    # Flash identity: sum_i p[i,j] dp[i,j] == sum_c g[c,j] out[c,j].
    delta = jnp.einsum("ncj,ncj->nj", grad.astype(jnp.float32), out,
                       preferred_element_type=jnp.float32,
                       precision="highest")
    xp = jnp.pad(x, ((0, 0), (0, cp - c), (0, hwp - hw)))
    ap = jnp.pad(a, ((0, 0), (0, hwp - hw), (0, jp - hw)))
    gp = jnp.pad(grad, ((0, 0), (0, cp - c), (0, jp - hw)))
    mp = jnp.pad(m, ((0, 0), (0, jp - hw)))[:, None, :]
    # l pads with 1 so padded query columns never divide by zero.
    lp = jnp.pad(l, ((0, 0), (0, jp - hw)), constant_values=1.0)[:, None, :]
    dp_ = jnp.pad(delta, ((0, 0), (0, jp - hw)))[:, None, :]
    norm_arr = jnp.full((1, 1), 1.0 / norm, jnp.float32)

    vec_spec = pl.BlockSpec((1, 1, tj), lambda b, i, j: (b, 0, j),
                            memory_space=pltpu.VMEM)
    da, dx = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, hw=hw, ti=ti,
                          precision=_precision_for(x, a)),
        grid=(n, hwp // ti, jp // tj),
        in_specs=[
            pl.BlockSpec((1, cp, ti), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp, tj), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti, tj), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            vec_spec, vec_spec, vec_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, ti, tj), lambda b, i, j: (b, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cp, ti), lambda b, i, j: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hwp, jp), jnp.float32),
            jax.ShapeDtypeStruct((n, cp, hwp), jnp.float32),
        ),
        interpret=interpret,
    )(xp, gp, ap, mp, lp, dp_, norm_arr)
    return (
        dx[:, :c, :hw].astype(x.dtype),
        da[:, :hw, :hw].astype(a.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def psa_softmax_bmm_flash(x, a, norm: float = 1.0, interpret: bool = False,
                          cap_i: int = FLASH_TILE_I,
                          cap_j: int = FLASH_TILE_J):
    """Flash ``(1/norm) * x @ softmax(a, axis=1)``: hw-unbounded VMEM.

    Same contract as :func:`psa_softmax_bmm` but tiles the source axis with
    an online softmax, so per-grid-step VMEM is independent of hw. Prefer
    :func:`psa_softmax_bmm_auto`, which picks the resident kernel (less HBM
    traffic — x stays in VMEM) when it fits and this one when it doesn't.
    ``cap_i``/``cap_j`` bound the source/query tile sizes (tests shrink
    them to exercise multi-tile paths on tiny shapes).
    """
    out, _, _ = _flash_fwd(x, a, norm, cap_i, cap_j, interpret)
    return out


def _flash_vjp_fwd(x, a, norm, interpret, cap_i, cap_j):
    out, m, l = _flash_fwd(x, a, norm, cap_i, cap_j, interpret)
    return out, (x, a, m, l, out)


def _flash_vjp_bwd(norm, interpret, cap_i, cap_j, residuals, grad):
    return _flash_bwd(norm, interpret, cap_i, cap_j, residuals, grad)


psa_softmax_bmm_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


# ---------------------------------------------------------------------------
# Kernel selection: resident when its VMEM model fits, flash otherwise.
# ---------------------------------------------------------------------------

def vmem_budget() -> int:
    """Per-core VMEM budget (16 MB on v4/v5e/v5p); SEMSEG_VMEM_BYTES
    overrides for other TPU generations."""
    import os

    return int(os.environ.get("SEMSEG_VMEM_BYTES", 16 * 2 ** 20))


def resident_vmem_bytes(c: int, hw: int, operand_bytes: int = 2) -> int:
    """Scoped-VMEM estimate of the worst resident-kernel grid step at
    (channels, positions): max over {fwd, da, dx} of the per-grid-step
    block set, x2 for double buffering, plus the f32 softmax scratch."""
    cp = _round_up(c, SUBLANE)
    hwp = _round_up(hw, SUBLANE)
    fwd = (cp * hwp * operand_bytes          # x block
           + hwp * LANE * operand_bytes      # a tile
           + cp * LANE * 4)                  # out tile (f32)
    da = (cp * hwp * operand_bytes           # x block
          + hwp * LANE * operand_bytes       # a tile
          + cp * LANE * 4                    # g tile
          + hwp * LANE * 4)                  # da tile
    dx = (hwp * LANE * operand_bytes         # a tile
          + cp * LANE * 4                    # g tile
          + cp * hwp * 4)                    # dx accumulator (f32)
    scratch = 2 * hwp * LANE * 4             # softmax exp/p f32 temporaries
    return 2 * max(fwd, da, dx) + scratch


def select_psa_kernel(c: int, hw: int, operand_bytes: int = 2) -> str:
    """'resident' when the whole-x kernel fits the VMEM budget — it reads
    x once per batch row and keeps it in VMEM, and it measured fastest
    everywhere it compiles (v5e, b16 hw=2025 fwd+grad: resident 103.7 ms
    f32 / 62.8 bf16 vs flash 122.8 / 67.2) — else 'flash', whose
    per-grid-step VMEM is hw-independent (b1 hw=7921 f32: flash fwd 5.2 ms
    vs XLA 6.0; resident unbuildable). The model compares directly against
    the chip budget: it already over-counts (it double-buffers every
    block), and Mosaic accepted the model's 15.1 MB estimate at f32
    hw=2025 — the round-3 0.75 margin wrongly exiled exactly that shape."""
    if resident_vmem_bytes(c, hw, operand_bytes) <= vmem_budget():
        return "resident"
    return "flash"


def psa_softmax_bmm_auto(x, a, norm: float = 1.0, interpret: bool = False):
    """Fused PSA aggregation with automatic kernel choice by static shape."""
    _, c, hw = x.shape
    ob = 2 if (x.dtype == jnp.bfloat16 and a.dtype == jnp.bfloat16) else 4
    if select_psa_kernel(c, hw, ob) == "resident":
        return psa_softmax_bmm(x, a, norm, LANE, interpret)
    return psa_softmax_bmm_flash(x, a, norm, interpret)
