"""Fused per-window upsample + softmax + flip-average Pallas kernel.

The ms-eval attribution ladder (``tool/ms_attrib.py``, PARITY.md) showed
the largest post-forward leg of the multi-scale sliding-window pipeline
is the per-window logit upsample (feature res -> crop res, align-corners
— the model's own ``zoom_factor`` resize, reference ``model/pspnet.py:94-95``)
followed by the f32 softmax and the flip-TTA average (reference
``tool/test.py:135-143``): 219 ms/image on the Cityscapes 6-scale
protocol, dominated by HBM round-trips of the [B, C, 713, 713]
intermediates (the upsampled logits, the softmax passes, the flip-read).

This kernel computes the whole leg per window PAIR (original + flipped
forward) with every intermediate resident in VMEM, writing ONLY the
final averaged probabilities:

    probs = (softmax(up(L_orig)) + mirror(softmax(up(L_flip)))) / 2

Two exactness-preserving rewrites make it fuseable:

- ``mirror``/``up``/``softmax`` commute in the right order:
  ``mirror(softmax(up(L))) == softmax(up_mirrored(L))`` where
  ``up_mirrored`` is the same align-corners interpolation with its
  output columns reversed — a PERMUTATION of the precomputed interp
  matrix, exact to the bit. The flipped half therefore uses
  ``Rw[:, ::-1]`` and no data movement at crop resolution.
- The separable upsample runs H-first PER ROW STRIP: ``Rh_strip @ L``
  gives a [th, ws] sliver, rounded to bf16 (the XLA path rounds the
  resize result to bf16 before its softmax; rounding between the two
  separable passes instead is inside the same bf16 license — f32
  models keep the exact XLA path, the kernel only dispatches for
  bf16), then ``@ Rw`` widens it. H-first and W-first cost identical
  FLOPs (``out_h*hs*ws + out_h*ws*out_w`` vs
  ``hs*ws*out_w + out_h*hs*out_w`` — equal for square crops), but
  H-first needs NO persistent W-upsampled scratch, which is what kept
  the previous layout over the 16 MB scoped-VMEM budget.

Grid: ``(pairs, row_strips)``, both sequential. Each strip-flip is TWO
big dots — H-pass ``[th, hs] @ [hs, C*wsp]`` over all classes at once
(the caller pre-flattens the logits with ws zero-padded to the 128-lane
boundary wsp, so no in-kernel reshape merges a padded sublane dim,
which Mosaic rejects), then a rank-3 W-pass
``[C, th, wsp] @ [wsp, out_w]`` landing directly in the [C, th, out_w]
output layout. The first cut of this kernel used 2·C per-class 2D dots
instead; its per-op overhead ate the fusion win (on-chip A/B: 29 ms/img
saved of the 219 ms leg). The two flip halves share ONE
[C, th, out_w] f32 scratch: half 0's softmax is written to the output
block, half 1's is accumulated into it (read-modify-write on the same
grid step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semseg_tpu.ops.resize import _device_matrix


STRIP = 32  # Mosaic: a block's sublane dim must be divisible by 8


def _padded_rows(out_h: int, th: int = STRIP) -> int:
    """Crops are 8k+1 (odd), so no multiple-of-8 strip tiles out_h
    exactly; the kernel computes ceil(out_h/th)*th rows (the pad
    rows upsample zero logits -> uniform softmax) and the caller slices
    the pad off — XLA fuses the slice into the consumer."""
    return -(-out_h // th) * th


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def vmem_bytes(c: int, hs: int, ws: int, out_w: int, th: int = STRIP) -> int:
    """Scoped-VMEM model for one grid step, with (sublane, lane) tile
    padding — bf16 tiles are (16, 128), f32 (8, 128) — and double
    buffering on the pipelined blocks. The T*PU scoped budget is 16 MB;
    ``supported`` dispatches only under 12 MB to leave stack headroom
    for the softmax temporaries (Mosaic counts those against the same
    budget: the round-4 OOM was 'allocating on stack')."""
    lane = lambda n: _ceil_to(n, 128)
    wsp = lane(ws)
    b = 0
    # input logits block (1, 2, hs, c*wsp) bf16, double-buffered
    b += 2 * 2 * _ceil_to(hs, 16) * c * wsp * 2
    # rh strip (th, hs) f32, double-buffered
    b += 2 * th * lane(hs) * 4
    # rw (2, wsp, out_w) bf16, double-buffered
    b += 2 * 2 * wsp * lane(out_w) * 2
    # output block (1, c, th, out_w) bf16, double-buffered
    b += 2 * c * th * lane(out_w) * 2
    # f32 softmax scratch (c, th, out_w), single copy shared by both halves
    b += c * th * lane(out_w) * 4
    # H-pass intermediates: t1 [th, c*wsp] f32 + its mid-dtype round +
    # the swapped [c, th, wsp] copy (stack allocations, same budget)
    b += th * c * wsp * (4 + 2 + 2)
    return b


_VMEM_BUDGET = 12 * 2**20


def supported(out_h, out_w, dtype, c=19, feat_h=None, feat_w=None) -> bool:
    """Dispatch rule: bf16 compute only (f32 keeps the exact
    reference-numerics XLA path) and the strip's working set must fit
    the scoped-VMEM model (large class counts — ADE's 150 — blow the
    budget and keep the XLA path). Feature dims default to the
    zoom_factor=8 relation crops obey ((crop-1)/8+1, reference
    model/pspnet.py:34-40)."""
    if dtype != jnp.bfloat16:
        return False
    hs = feat_h if feat_h is not None else (out_h - 1) // 8 + 1
    ws = feat_w if feat_w is not None else (out_w - 1) // 8 + 1
    return vmem_bytes(c, hs, ws, out_w) <= _VMEM_BUDGET


def _align_corners_matrix(in_size: int, out_size: int, dtype):
    """[in, out] interp matrix (transposed layout: source-major so the
    W-pass contracts the minor axis). THE ``ops/resize._device_matrix``
    align-corners weights — assembled f32 then rounded once, so the
    grid golden tests pin this kernel's weights too."""
    mat = _device_matrix(in_size, out_size, half_pixel=False,
                         dtype=jnp.float32)  # [out, in]
    return mat.T.astype(dtype)  # [in, out]


def _kernel(l_ref, rh_ref, rw_ref, out_ref, x_ref, *, hs, ws, c,
            out_w, th, wsp, mid_dtype, out_dtype):
    # Two BIG matmuls per strip-flip instead of 2*C small ones. Mosaic
    # rejects reshapes that merge padded sublane dims, so the logits
    # arrive pre-flattened by the caller as [hs, C*wsp] (ws zero-padded
    # to the 128-lane boundary wsp in plain XLA, where the reshape is
    # free): the H-pass is ONE [th, hs] @ [hs, C*wsp] dot for all
    # classes, the lane dim then splits at the 128-aligned class
    # boundary (layout-preserving) and a minor-dim-preserving swap
    # yields [C, th, wsp], and the W-pass is ONE rank-3
    # [C, th, wsp] @ [wsp, out_w] dot landing directly in the
    # [C, th, out_w] output layout — softmax reduces over the major
    # axis, no transpose of anything at crop resolution. The zero pad
    # is exact: padded lanes of t1 are rh @ 0 = 0 and the matching rw
    # rows are 0.
    rh = rh_ref[...]  # [th, hs]
    for f in range(2):
        t1 = jax.lax.dot_general(
            rh, l_ref[0, f],  # [th, hs] @ [hs, C*wsp]
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(mid_dtype)
        t3 = jnp.swapaxes(t1.reshape(th, c, wsp), 0, 1)  # [C, th, wsp]
        x_ref[...] = jax.lax.dot_general(
            t3, rw_ref[f],  # [C, th, wsp] @ [wsp, out_w]
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t = x_ref[...]  # [C, th, out_w] f32
        m = jnp.max(t, axis=0, keepdims=True)
        e = jnp.exp(t - m)
        p = (e / jnp.sum(e, axis=0, keepdims=True)) * 0.5
        if f == 0:
            out_ref[0] = p.astype(out_dtype)
        else:
            out_ref[0] += p.astype(out_dtype)


def upsample_softmax_flip(logits_pairs, out_hw, interpret: bool = False):
    """Fused zoom-upsample + softmax + flip-TTA average.

    NOT jitted here: callers are already inside a jitted scale program,
    and a nested jit wrapping a pallas_call trips an MLIR
    cached-lowering KeyError ('closed_call') when the same kernel is
    instantiated at several scales of one outer program (observed on
    jax 0.8 lowering the 6-scale ms program).

    ``logits_pairs``: [P, 2, C, hs, ws] window-pair logits at feature
    resolution — half 0 the original window's forward, half 1 the
    horizontally-flipped window's forward (un-mirrored logits, exactly
    as the model emits them). Returns [P, C, out_h, out_w] averaged
    probabilities in the container dtype the stitch pipeline uses
    (bf16 for bf16 inputs — the evaluator's existing policy).
    """
    p_n, two, c, hs, ws = logits_pairs.shape
    assert two == 2, logits_pairs.shape
    out_h, out_w = out_hw
    th = STRIP
    out_h_pad = _padded_rows(out_h, th)
    dt = logits_pairs.dtype
    out_dtype = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32
    # Between the two separable passes the bf16 path rounds to bf16
    # (inside the license: the XLA path's resize rounds its result to
    # bf16 before the softmax). f32 inputs stay f32 end-to-end — the
    # interpret-mode tests pin exact f32 semantics.
    mid_dtype = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32

    rh = _align_corners_matrix(hs, out_h, dt).T  # [out_h, hs]
    rh = jnp.pad(rh, ((0, out_h_pad - out_h), (0, 0)))
    wsp = _ceil_to(ws, 128)
    rw = _align_corners_matrix(ws, out_w, dt)    # [ws, out_w]
    rw = jnp.stack([rw, rw[:, ::-1]])            # [2, ws, out_w]
    rw = jnp.pad(rw, ((0, 0), (0, wsp - ws), (0, 0)))
    # Pre-flatten the logits to [P, 2, hs, C*wsp] in plain XLA (free
    # reshape; zero lane pad matches rw's zero rows exactly) so the
    # kernel's H-pass covers every class in one dot.
    lp = jnp.swapaxes(logits_pairs, 2, 3)        # [P, 2, hs, C, ws]
    lp = jnp.pad(lp, ((0, 0),) * 3 + ((0, 0), (0, wsp - ws)))
    lp = lp.reshape(p_n, 2, hs, c * wsp)

    grid = (p_n, out_h_pad // th)
    kernel = functools.partial(
        _kernel, hs=hs, ws=ws, c=c, out_w=out_w, th=th, wsp=wsp,
        mid_dtype=mid_dtype, out_dtype=out_dtype,
    )
    flops = p_n * 2 * c * out_h_pad * (hs * wsp + wsp * out_w) * 2
    padded = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, hs, c * wsp), lambda i, s: (i, 0, 0, 0)),
            pl.BlockSpec((th, hs), lambda i, s: (s, 0)),
            pl.BlockSpec((2, wsp, out_w), lambda i, s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, c, th, out_w), lambda i, s: (i, 0, s, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (p_n, c, out_h_pad, out_w), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((c, th, out_w), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=logits_pairs.size * dt.itemsize
            + p_n * c * out_h_pad * out_w * 2, transcendentals=p_n * c
            * out_h_pad * out_w * 2,
        ),
        interpret=interpret,
    )(lp, rh, rw)
    return padded[:, :, :out_h, :]


def upsample_softmax_flip_reference(logits_pairs, out_hw):
    """Pure-XLA mirror of the kernel (the evaluator's historical path):
    align-corners channels-first resize, f32 softmax, post-softmax
    mirror of the flipped half, average. For tests and as the
    documentation of the exact semantics being fused."""
    from semseg_tpu.ops.resize import resize_bilinear_align_corners_cf

    p_n, two, c, hs, ws = logits_pairs.shape
    up = resize_bilinear_align_corners_cf(
        logits_pairs.reshape(p_n * 2, c, hs, ws), out_hw
    ).reshape(p_n, 2, c, *out_hw)
    probs = jax.nn.softmax(up.astype(jnp.float32), axis=2)
    if logits_pairs.dtype == jnp.bfloat16:
        probs = probs.astype(jnp.bfloat16)
    return (probs[:, 0] + probs[:, 1][..., ::-1]) / 2
