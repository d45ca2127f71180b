"""Attribute multi-scale eval wall time on the real chip.

The fused all-scales sliding-window program (engine/evaluator.py::
_build_ms_argmax_raw) runs the full Cityscapes ms protocol (6 scales +
flip, reference ``tool/test.py:149-178``) in one dispatch. The headline
sits below the window-forward roofline; this harness attributes the gap
by timing ablated variants of the same program, outermost leg first:

  pipelined        predict_async over n images incl. the uint8 upload and
                   the uint8 argmax readback (the tool/test.py driver
                   path; the PARITY.md headline methodology)
  resident         the same fused program on a pre-staged device image
                   (removes the per-image 6 MB host upload leg)
  resident_scalar  fused program reduced to a scalar on device (also
                   removes the 2 MB argmax readback leg)
  no_final_resize  per-scale stitch + count divide + un-pad, but the
                   final half-pixel prob resize to (h, w) + ms argmax
                   replaced by a scalar reduce (isolates the six
                   [new_h, new_w, C] -> [h, w, C] f32 'highest' matmuls)
  fwd_probs        window extraction + full per-window forward
                   (align-corners logit resize + f32 softmax + flip
                   average) with the stitch scatter removed
  fwd_probs_fused  same, but through the production fused Pallas window
                   path (ops/stitch_pallas.py) instead of the XLA leg
  fwd_logits       window extraction + raw model logits only (drops the
                   transpose + f32 softmax + flip average; the model's
                   own zoom upsample stays INSIDE this variant — the
                   round-4 ladder prose mis-read the fwd_probs delta as
                   "upsample+softmax" when the upsample was never ablated)
  extract_only     per-scale image resize + canvas + window gather with
                   the forward removed (pins the extraction/prep leg)
  peak_windows     one standalone [B, 713, 713, 3] forward chained
                   back-to-back — the window-throughput ceiling this
                   model sustains, independent of the eval pipeline

Differences between adjacent rows attribute: host upload, argmax
readback, final resizes, stitch scatter + count divide, per-window
resize+softmax, and the residual forward-efficiency gap vs peak.

Variant builders mirror engine/evaluator.py::_build_scale_raw stage by
stage (same grids, same padding-free chunking); the ``pipelined`` /
``resident`` rows run the evaluator's own production program.

Usage: python tool/ms_attrib.py [variant ...]   (default: all)
Env: MS_LAYERS (50), MS_ITERS (6), MS_WINDOW_BATCH (8 — the measured
     batch-rate sweet spot; see _chunk).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from semseg_tpu.engine.evaluator import (
    SlidingWindowEvaluator,
    _grid_coords,
    _scaled_size,
)
from semseg_tpu.models import PSPNet
from semseg_tpu.ops.resize import (
    resize_bilinear_half_pixel,
    resize_bilinear_half_pixel_cf,
)

SCALES = [0.5, 0.75, 1.0, 1.25, 1.5, 1.75]
H, W = 1024, 2048


def _emit(name, **kv):
    print(json.dumps({"variant": name, **kv}), flush=True)


def _chunk(coords, wb_max):
    """The evaluator's chunk selection (same logic): fixed batch-aligned
    chunks, padding the last one — the per-window forward rate is
    strongly batch-dependent (see _build_scale_raw)."""
    n_win = len(coords)
    wb = min(wb_max, n_win)
    n_pad = (-n_win) % wb
    coords_arr = np.asarray(
        coords + [(0, 0)] * n_pad, dtype=np.int32
    ).reshape(-1, wb, 2)
    weights_arr = np.asarray(
        [1.0] * n_win + [0.0] * n_pad, dtype=np.float32
    ).reshape(-1, wb)
    return coords_arr, weights_arr, wb


def build_variant_ms(ev, h, w, stage):
    """One jitted program over all scales at ablation ``stage``; returns
    fn(variables, image) -> f32 scalar (sum over scales)."""
    crop_h, crop_w = ev.crop_h, ev.crop_w
    mean = jnp.asarray(ev.mean)
    flip = ev.flip
    wb_max = max(1, ev.window_batch // (2 if flip else 1))

    scale_fns = []
    for scale in ev.scales:
        new_h, new_w = _scaled_size(h, w, scale, ev.base_size)
        pad_h = max(crop_h - new_h, 0)
        pad_w = max(crop_w - new_w, 0)
        pad_h_half, pad_w_half = pad_h // 2, pad_w // 2
        canvas_h, canvas_w = new_h + pad_h, new_w + pad_w
        coords = _grid_coords(canvas_h, canvas_w, crop_h, crop_w,
                              ev.stride_rate)
        coords_arr, weights_arr, wb = _chunk(coords, wb_max)
        count_rows = np.zeros((canvas_h, 1), dtype=np.float32)
        count_cols = np.zeros((canvas_w, 1), dtype=np.float32)
        for s_h in sorted({c[0] for c in coords}):
            count_rows[s_h : s_h + crop_h] += 1.0
        for s_w in sorted({c[1] for c in coords}):
            count_cols[s_w : s_w + crop_w] += 1.0

        def scale_fn(variables, image, *, new_h=new_h, new_w=new_w,
                     pad_h_half=pad_h_half, pad_w_half=pad_w_half,
                     canvas_h=canvas_h, canvas_w=canvas_w, wb=wb,
                     coords_arr=coords_arr, weights_arr=weights_arr,
                     count_rows=count_rows, count_cols=count_cols):
            image = image.astype(jnp.float32)
            img = resize_bilinear_half_pixel(image, (new_h, new_w))
            canvas_img = jnp.broadcast_to(
                mean, (canvas_h, canvas_w, 3)
            ).astype(jnp.float32)
            canvas_img = jax.lax.dynamic_update_slice(
                canvas_img, img, (pad_h_half, pad_w_half, 0)
            )

            def fwd_chunk(cs):
                def take(c):
                    return jax.lax.dynamic_slice(
                        canvas_img, (c[0], c[1], 0), (crop_h, crop_w, 3)
                    )

                wins = jax.vmap(take)(cs)
                batch = (
                    jnp.concatenate([wins, wins[:, :, ::-1]], axis=0)
                    if flip else wins
                )
                if stage == "extract_only":
                    # image prep + window gather only (no forward): pins
                    # the per-scale resize/canvas/dynamic_slice leg.
                    return batch
                if stage == "fwd_logits":
                    return ev.model.apply(
                        ev.variables, ev._normalize(batch), train=False
                    ).astype(jnp.float32)
                if stage == "fwd_probs_fused":
                    # the production fused window path (Pallas kernel)
                    # inside the same scan/extraction structure.
                    return ev._forward_fused_pairs(variables, batch, wb)
                probs = ev._forward_cf(variables, batch)  # [B, C, ch, cw]
                if flip:
                    probs = (probs[:wb] + probs[wb:][..., ::-1]) / 2
                return probs

            if stage in ("extract_only", "fwd_logits", "fwd_probs",
                         "fwd_probs_fused"):
                def body(acc, xs):
                    cs, _ = xs
                    return acc + jnp.sum(fwd_chunk(cs)), None

                total, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    (jnp.asarray(coords_arr), jnp.asarray(weights_arr)),
                )
                return total

            def chunk_body(acc, xs):
                cs, wt = xs
                probs = fwd_chunk(cs)  # [wb, C, crop_h, crop_w]

                def put(i, a):
                    c = cs[i]
                    patch = jax.lax.dynamic_slice(
                        a, (0, c[0], c[1]), (probs.shape[1], crop_h, crop_w)
                    )
                    return jax.lax.dynamic_update_slice(
                        a, patch + probs[i] * wt[i], (0, c[0], c[1])
                    )

                return jax.lax.fori_loop(0, wb, put, acc), None

            acc0 = jnp.zeros((ev.classes, canvas_h, canvas_w), jnp.float32)
            acc, _ = jax.lax.scan(
                chunk_body, acc0,
                (jnp.asarray(coords_arr), jnp.asarray(weights_arr)),
            )
            acc = acc / (
                jnp.asarray(count_rows) * jnp.asarray(count_cols).T
            )[None]
            acc = jax.lax.dynamic_slice(
                acc, (0, pad_h_half, pad_w_half), (ev.classes, new_h, new_w)
            )
            if stage == "no_final_resize":
                return jnp.sum(acc)
            return resize_bilinear_half_pixel_cf(acc, (h, w))

        scale_fns.append(scale_fn)

    def ms_fn(variables, image):
        if stage in ("extract_only", "fwd_logits", "fwd_probs",
                     "fwd_probs_fused", "no_final_resize"):
            return sum(fn(variables, image) for fn in scale_fns)
        total = None
        for fn in scale_fns:
            p = fn(variables, image)
            total = p if total is None else total + p
        # resident_scalar: the shipped program's argmax reduced on device.
        return jnp.sum(jnp.argmax(total, axis=0).astype(jnp.int32))

    return jax.jit(ms_fn)


def _time_chained(fn, args, iters):
    out = fn(*args)  # compile
    np.asarray(out).ravel()[0]
    start = time.perf_counter()
    pending = [fn(*args) for _ in range(iters)]
    results = [np.asarray(p) for p in pending]
    elapsed = time.perf_counter() - start
    assert len(results) == iters
    return elapsed / iters


def main():
    which = sys.argv[1:] or [
        "pipelined", "resident", "resident_scalar", "no_final_resize",
        "fwd_probs", "fwd_probs_fused", "fwd_logits", "extract_only",
        "peak_windows",
    ]
    layers = int(os.environ.get("MS_LAYERS", "50"))
    iters = int(os.environ.get("MS_ITERS", "6"))
    wbatch = int(os.environ.get("MS_WINDOW_BATCH", "8"))

    model = PSPNet(layers=layers, classes=19, zoom_factor=8,
                   dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=False)
    )(rng, jnp.zeros((1, 713, 713, 3), jnp.float32))
    value_scale = 255
    mean = [m * value_scale for m in (0.485, 0.456, 0.406)]
    std = [s * value_scale for s in (0.229, 0.224, 0.225)]
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "figure", "demo",
        "ADE_val_00001515.jpg")
    bgr = cv2.imread(demo, cv2.IMREAD_COLOR)
    image = cv2.cvtColor(
        cv2.resize(bgr, (W, H), interpolation=cv2.INTER_LINEAR),
        cv2.COLOR_BGR2RGB,
    )
    # MS_FUSED=0 forces the pre-round-5 XLA window path (A/B for the
    # fused upsample+softmax+flip Pallas kernel); MS_POOLED=0 forces the
    # per-scale scans (A/B for the pooled cross-scale window stream,
    # evaluator._build_ms_pooled_raw); default = auto for both.
    fused_env = os.environ.get("MS_FUSED")
    pooled_env = os.environ.get("MS_POOLED")
    ev = SlidingWindowEvaluator(
        model, variables, classes=19, crop_h=713, crop_w=713,
        mean=mean, std=std, base_size=2048, scales=SCALES,
        window_batch=wbatch, mode="device",
        fused_stitch=None if fused_env is None else fused_env == "1",
        pooled_ms=None if pooled_env is None else pooled_env == "1",
    )
    img_dev = jax.device_put(jnp.asarray(image))
    jax.block_until_ready(img_dev)

    n_windows = sum(
        len(_grid_coords(
            max(nh, 713), max(nw, 713), 713, 713, ev.stride_rate))
        for nh, nw in (_scaled_size(H, W, s, 2048) for s in SCALES)
    )

    for name in which:
        if name == "fwd_probs_fused" and ev._model_lowres is None:
            # fused path disabled (MS_FUSED=0, f32 model, or a non-TPU
            # backend): the variant would dereference a None lowres model
            _emit(name, skipped="fused_stitch disabled")
            continue
        if name == "pipelined":
            ev.predict(image)  # compile
            np.asarray(ev.predict_async(image))  # settle
            start = time.perf_counter()
            pending = [ev.predict_async(image) for _ in range(iters)]
            results = [np.asarray(p) for p in pending]
            sec = (time.perf_counter() - start) / iters
            assert all(r.shape == (H, W) for r in results)
        elif name == "resident":
            key = (H, W, "ms_argmax")
            if key not in ev._scale_fns:
                ev._scale_fns[key] = ev._build_ms_argmax_fn(H, W)
            fn = ev._scale_fns[key]
            sec = _time_chained(fn, (ev.variables, img_dev), iters)
        elif name == "peak_windows":
            fwd = jax.jit(ev._forward_cf)
            batch = jnp.zeros((wbatch, 713, 713, 3), jnp.float32)
            reduce = jax.jit(lambda v, b: jnp.sum(fwd(v, b)))
            per_call = _time_chained(
                reduce, (ev.variables, batch), iters * 4
            )
            _emit(name, window_batch=wbatch,
                  windows_per_sec=round(wbatch / per_call, 1),
                  ms_ceiling_images_per_sec=round(
                      wbatch / per_call / (2 * n_windows), 3),
                  note="ceiling = peak windows/s over the protocol's "
                       f"{2 * n_windows} flip-doubled forwards/image")
            continue
        else:
            fn = build_variant_ms(ev, H, W, name)
            sec = _time_chained(fn, (ev.variables, img_dev), iters)
        _emit(name, sec_per_image=round(sec, 3),
              images_per_sec=round(1.0 / sec, 3))


if __name__ == "__main__":
    main()
