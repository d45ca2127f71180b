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
- The separable upsample is W-first (once per pair, into a bf16 VMEM
  scratch) then H per row-strip. The current XLA path rounds the
  resize result to bf16 before the softmax; rounding between the two
  passes instead is inside the same bf16 license (f32 models keep the
  exact XLA path — the kernel only dispatches for bf16).

Grid: ``(pairs, row_strips)``, both sequential; the W-upsampled pair
scratch persists across its strips. MXU shapes: W-pass
``[hs*C, ws] @ [ws, out_w]``; H-pass ``[th, hs] @ [hs, C, out_w]``
(batched over C by dot_general).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from semseg_tpu.ops.resize import _interp_vectors


def _strip_rows(out_h: int) -> int:
    """Row-strip height: a divisor of out_h in [16, 64] (largest), else
    the whole extent for small outputs. Returns 0 when no clean strip
    exists (caller falls back to the XLA path)."""
    divs = [d for d in range(16, 65) if out_h % d == 0]
    if divs:
        return max(divs)
    if out_h <= 256:
        return out_h
    return 0


def supported(out_h: int, out_w: int, dtype) -> bool:
    """Dispatch rule: bf16 compute only (f32 keeps the exact
    reference-numerics XLA path) and a clean row-strip factor."""
    return dtype == jnp.bfloat16 and _strip_rows(out_h) > 0


def _align_corners_matrix(in_size: int, out_size: int, dtype):
    """[in, out] interp matrix (transposed layout: source-major so the
    W-pass contracts the minor axis). Same weights as
    ``ops/resize._device_matrix`` (align-corners grid)."""
    lo, hi, frac = _interp_vectors(in_size, out_size, half_pixel=False)
    fr = jnp.asarray(frac, jnp.float32)
    mat = (
        jax.nn.one_hot(jnp.asarray(lo), in_size, dtype=jnp.float32)
        * (1.0 - fr)[:, None]
        + jax.nn.one_hot(jnp.asarray(hi), in_size, dtype=jnp.float32)
        * fr[:, None]
    )  # [out, in]
    return mat.T.astype(dtype)  # [in, out]


def _kernel(l_ref, rh_ref, rw_ref, out_ref, u_ref, *, hs, ws, c, out_w,
            th, out_dtype):
    strip = pl.program_id(1)

    @pl.when(strip == 0)
    def _():
        # W-upsample both halves of the pair once; the flipped half's
        # matrix has reversed output columns (exact mirror fold).
        for f in range(2):
            lf = l_ref[0, f]  # [hs, C, ws]
            u = jax.lax.dot_general(
                lf.reshape(hs * c, ws), rw_ref[f],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [hs*C, out_w]
            u_ref[f] = u.reshape(hs, c, out_w).astype(u_ref.dtype)

    rh = rh_ref[...]  # [th, hs]
    acc = None
    for f in range(2):
        t = jax.lax.dot_general(
            rh, u_ref[f],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [th, C, out_w] f32
        m = jnp.max(t, axis=1, keepdims=True)
        e = jnp.exp(t - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        acc = p if acc is None else acc + p
    probs = acc * 0.5
    out_ref[0] = jnp.transpose(probs, (1, 0, 2)).astype(out_dtype)


def upsample_softmax_flip(logits_pairs, out_hw, interpret: bool = False):
    """Fused zoom-upsample + softmax + flip-TTA average.

    NOT jitted here: callers are already inside a jitted scale program,
    and a nested jit wrapping a pallas_call trips an MLIR
    cached-lowering KeyError ('closed_call') when the same kernel is
    instantiated at several scales of one outer program (observed on
    jax 0.8 lowering the 6-scale ms program).

    ``logits_pairs``: [P, 2, hs, C, ws] window-pair logits at feature
    resolution — half 0 the original window's forward, half 1 the
    horizontally-flipped window's forward (un-mirrored logits, exactly
    as the model emits them). Returns [P, C, out_h, out_w] averaged
    probabilities in the container dtype the stitch pipeline uses
    (bf16 for bf16 inputs — the evaluator's existing policy).
    """
    p_n, two, hs, c, ws = logits_pairs.shape
    assert two == 2, logits_pairs.shape
    out_h, out_w = out_hw
    th = _strip_rows(out_h)
    assert th > 0, f"no strip factor for out_h={out_h}"
    dt = logits_pairs.dtype
    out_dtype = jnp.bfloat16 if dt == jnp.bfloat16 else jnp.float32

    rh = _align_corners_matrix(hs, out_h, dt).T  # [out_h, hs]
    rw = _align_corners_matrix(ws, out_w, dt)    # [ws, out_w]
    rw = jnp.stack([rw, rw[:, ::-1]])            # [2, ws, out_w]

    grid = (p_n, out_h // th)
    kernel = functools.partial(
        _kernel, hs=hs, ws=ws, c=c, out_w=out_w, th=th, out_dtype=out_dtype
    )
    flops = p_n * 2 * (hs * c * ws * out_w + th * hs * c * out_w * grid[1]) * 2
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 2, hs, c, ws), lambda i, s: (i, 0, 0, 0, 0)),
            pl.BlockSpec((th, hs), lambda i, s: (s, 0)),
            pl.BlockSpec((2, ws, out_w), lambda i, s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, c, th, out_w), lambda i, s: (i, 0, s, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((p_n, c, out_h, out_w), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, hs, c, out_w), out_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=logits_pairs.size * dt.itemsize
            + p_n * c * out_h * out_w * 2, transcendentals=p_n * c
            * out_h * out_w * 2,
        ),
        interpret=interpret,
    )(logits_pairs, rh, rw)


def upsample_softmax_flip_reference(logits_pairs, out_hw):
    """Pure-XLA mirror of the kernel (the evaluator's historical path):
    align-corners channels-first resize, f32 softmax, post-softmax
    mirror of the flipped half, average. For tests and as the
    documentation of the exact semantics being fused."""
    from semseg_tpu.ops.resize import resize_bilinear_align_corners_cf

    p_n, two, hs, c, ws = logits_pairs.shape
    l = jnp.transpose(logits_pairs, (0, 1, 3, 2, 4))  # [P,2,C,hs,ws]
    up = resize_bilinear_align_corners_cf(
        l.reshape(p_n * 2, c, hs, ws), out_hw
    ).reshape(p_n, 2, c, *out_hw)
    probs = jax.nn.softmax(up.astype(jnp.float32), axis=2)
    if logits_pairs.dtype == jnp.bfloat16:
        probs = probs.astype(jnp.bfloat16)
    return (probs[:, 0] + probs[:, 1][..., ::-1]) / 2
