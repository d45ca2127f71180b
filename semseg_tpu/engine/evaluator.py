"""Multi-scale sliding-window inference engine.

Numerics-compatible with the reference pipeline (``tool/test.py:122-223``):
per scale, the long side is resized to ``round(scale * base_size)``
(half-pixel bilinear), the image is mean-padded to the crop size,
overlapping crop windows on a ``ceil(crop * 2/3)`` stride are evaluated
(with horizontal-flip TTA), per-window class probabilities are accumulated
and count-normalized, un-padded, resized back to the original resolution,
and averaged over scales.

Two execution modes:

- ``device`` (default): the ENTIRE per-scale pipeline — scale resize, mean
  pad, window extraction, batched forwards, flip averaging, count-map
  stitching, un-pad, resize to original — is one jitted program per
  (image-shape, scale). The host uploads the raw image once and reads back
  one uint8 class map; nothing else crosses the host boundary. This is the
  TPU-native replacement for the reference's one-window-at-a-time loop
  (and avoids the multi-hundred-MB prob readbacks a host-stitched pipeline
  pays per image). Resizes run as MXU matmuls (cv2 half-pixel grid for the
  image/prob scaling, align-corners for logits, matching the reference's
  mixed-resize semantics).
- ``host``: cv2/numpy stitching faithful to the reference host code —
  useful for exactness cross-checks and for variable-shape datasets where
  per-shape compilation is not worth it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import cv2
import numpy as np

import jax
import jax.numpy as jnp

from semseg_tpu.ops import resize_bilinear_align_corners
from semseg_tpu.ops.resize import (
    resize_bilinear_align_corners_cf,
    resize_bilinear_half_pixel,
    resize_bilinear_half_pixel_cf,
)


def _grid_coords(new_h, new_w, crop_h, crop_w, stride_rate):
    """Static sliding-grid window origins (reference tool/test.py:158-171)."""
    stride_h = int(np.ceil(crop_h * stride_rate))
    stride_w = int(np.ceil(crop_w * stride_rate))
    grid_h = int(np.ceil(float(new_h - crop_h) / stride_h) + 1)
    grid_w = int(np.ceil(float(new_w - crop_w) / stride_w) + 1)
    coords = []
    for ih in range(grid_h):
        for iw in range(grid_w):
            e_h = min(ih * stride_h + crop_h, new_h)
            e_w = min(iw * stride_w + crop_w, new_w)
            coords.append((e_h - crop_h, e_w - crop_w))
    return coords


def _cv2_resize_mc(array: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """cv2.resize(INTER_LINEAR) for any channel count.

    cv2 5.x rejects >4-channel Mats (the reference ran on cv2 3/4 where
    ``cv2.resize(prediction_crop, ...)`` with C=classes worked,
    ``tool/test.py:177``); resizing in <=4-channel chunks is numerically
    identical since channels are independent.
    """
    c = array.shape[2] if array.ndim == 3 else 1
    if c <= 4:
        return cv2.resize(array, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    parts = [
        cv2.resize(array[:, :, i : i + 4], (out_w, out_h),
                   interpolation=cv2.INTER_LINEAR)
        for i in range(0, c, 4)
    ]
    parts = [p if p.ndim == 3 else p[:, :, None] for p in parts]
    return np.concatenate(parts, axis=2)


def _scaled_size(h, w, scale, base_size):
    long_size = round(scale * base_size)
    new_h = new_w = long_size
    if h > w:
        new_w = round(long_size / float(h) * w)
    else:
        new_h = round(long_size / float(w) * h)
    return new_h, new_w


class SlidingWindowEvaluator:
    def __init__(
        self,
        model,
        variables,
        *,
        classes: int,
        crop_h: int,
        crop_w: int,
        mean: Sequence[float],
        std: Optional[Sequence[float]],
        base_size: int,
        scales: Sequence[float],
        flip: bool = True,
        stride_rate: float = 2 / 3,
        window_batch: int = 8,
        mode: str = "device",
        bucket: int = 128,
        mesh=None,
        partition: str = "window",
        fused_stitch: Optional[bool] = None,
        pooled_ms: Optional[bool] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — run the jitted scale
        programs SPMD over multiple chips (single-process multi-chip eval;
        the reference's ``DataParallel`` eval splits images over GPUs at
        the process level, ``tool/test.py:34-36``+index sharding). Two
        partitioning strategies (GSPMD — purely declarative, XLA inserts
        the collectives/halo exchanges):

        - ``partition='window'``: the window batch shards over the
          ``data`` mesh axis — each chip runs a slice of the sliding-grid
          forwards (throughput: matches the reference's unit of work).
        - ``partition='spatial'``: each window's H axis shards over
          ``data`` — every conv runs spatially partitioned with XLA halo
          exchange (latency for ONE huge image; the TPU-native long-
          context analog of sliding-window inference).
        """
        self.model = model
        self.variables = variables
        self.classes = classes
        self.crop_h, self.crop_w = crop_h, crop_w
        self.mean = np.asarray(mean, dtype=np.float32)
        self.std = None if std is None else np.asarray(std, dtype=np.float32)
        self.base_size = base_size
        self.scales = list(scales)
        self.flip = flip
        self.stride_rate = stride_rate
        self.window_batch = max(2, window_batch)
        if mode not in ("device", "device_bucketed", "host"):
            raise ValueError(
                f"mode must be 'device', 'device_bucketed' or 'host', got {mode}"
            )
        self.mode = mode
        if partition not in ("window", "spatial"):
            raise ValueError(
                f"partition must be 'window' or 'spatial', got {partition}"
            )
        self.mesh = mesh
        self.partition = partition
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            from semseg_tpu.parallel.mesh import DATA_AXIS

            self._batch_spec = (
                PartitionSpec(DATA_AXIS)
                if partition == "window"
                else PartitionSpec(None, DATA_AXIS)
            )
            # Park the weights on the mesh once (replicated) so per-image
            # programs never re-transfer them.
            self.variables = jax.device_put(
                variables, NamedSharding(mesh, PartitionSpec())
            )
        # Fused per-window upsample+softmax+flip Pallas kernel
        # (ops/stitch_pallas.py): collapses the largest post-forward
        # ms-eval leg (the 219 ms/img attribution row) into one
        # VMEM-resident pass. ``None`` = auto: bf16 models with flip TTA
        # and a zoomed head, on the TPU backend only (on CPU the kernel
        # would run in the Pallas interpreter — correct but far slower
        # than XLA; tests force ``fused_stitch=True`` to exercise it).
        # f32 models always keep the exact reference-numerics XLA path.
        self._fused_interpret = jax.default_backend() != "tpu"
        if fused_stitch is None:
            from semseg_tpu.ops.stitch_pallas import supported

            fused_stitch = (
                flip
                and jax.default_backend() == "tpu"
                and getattr(model, "dtype", None) == jnp.bfloat16
                and getattr(model, "zoom_factor", 1) != 1
                and supported(crop_h, crop_w, jnp.bfloat16, c=classes)
                # multi-chip GSPMD eval keeps the XLA path (a pallas_call
                # does not partition under with_sharding_constraint)
                and mesh is None
            )
        self.fused_stitch = bool(fused_stitch)
        if self.fused_stitch and not flip:
            # the kernel averages (window, flipped-window) pairs; without
            # flip TTA the pair batch is malformed — fail at construction
            # with the real constraint, not a traced shape error later
            raise ValueError("fused_stitch=True requires flip=True "
                             "(the kernel fuses the flip average)")
        # Pooled cross-scale window stream for the fused ms program (see
        # _build_ms_pooled_raw). ``None`` = auto: OFF. Opt-in only: the
        # pooled program saves 4 of 88 window-pair slots on the
        # Cityscapes protocol, but its traced-scale gather/scatter over
        # max-padded stacked canvases did not finish the remote TPU
        # compile in 25 min (measured 2026-08-20; the per-scale program
        # compiles in minutes and runs 1.011-1.021 img/s link-free), so
        # a <5% upper-bound win is not worth an unbounded compile. The
        # GSPMD eval path always keeps per-scale scans so the window
        # batch shards cleanly over the mesh.
        if pooled_ms is None:
            pooled_ms = False
        self.pooled_ms = bool(pooled_ms) and mesh is None
        self._model_lowres = None
        if self.fused_stitch:
            # Same params, logits emitted at feature resolution: the
            # zoom upsample moves into the fused kernel (the model's
            # internal resize is the identical align-corners matrix).
            self._model_lowres = model.clone(zoom_factor=1)
        self._forward = jax.jit(self._forward_impl)
        self._scale_fns = {}
        # Cross-scale combiners run as ONE program each: summing K
        # [H,W,C] prob maps op-by-op would dispatch K separate HBM
        # round-trips (and a relay RTT per op when remote).
        # cross-scale sums accumulate in f32 even when the per-scale maps
        # are bf16-rounded (the final-resize bf16 license covers each
        # scale's own container, not compounding across the 6-scale sum)
        def _sum_f32(ps):
            ps = [p.astype(jnp.float32) for p in ps]
            return sum(ps[1:], ps[0])

        self._combine_mean = jax.jit(lambda ps: _sum_f32(ps) / len(ps))
        self._combine_argmax = jax.jit(
            lambda ps: jnp.argmax(_sum_f32(ps), axis=-1).astype(jnp.uint8)
        )
        self._bucketed = None
        if mode == "device_bucketed":
            from semseg_tpu.engine.bucketed import BucketedPipeline

            self._bucketed = BucketedPipeline(self, bucket=bucket)

    # ------------------------------------------------------------------
    # shared window forward (normalize -> model -> logit resize -> softmax)
    # ------------------------------------------------------------------
    def _normalize(self, images):
        x = images - jnp.asarray(self.mean)
        if self.std is not None:
            x = x / jnp.asarray(self.std)
        return x

    def _constrain_batch(self, batch):
        """Apply the multi-chip GSPMD sharding (window batch on 'data', or
        each window's H axis for spatial partitioning). No-op without a
        mesh. Trace-time only — call inside a jitted program."""
        if self.mesh is None:
            return batch
        from jax.sharding import NamedSharding

        return jax.lax.with_sharding_constraint(
            batch, NamedSharding(self.mesh, self._batch_spec)
        )

    def _forward_impl(self, variables, images):
        """images: [B, crop_h, crop_w, 3] raw 0-255 RGB -> probs [B,...,C]."""
        logits = self.model.apply(variables, self._normalize(images), train=False)
        if logits.shape[1:3] != images.shape[1:3]:
            logits = resize_bilinear_align_corners(
                logits, (images.shape[1], images.shape[2])
            )
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    def _forward_cf(self, variables, images):
        """Window forward emitting CHANNELS-FIRST probs ``[B, C, h, w]``.

        Same values as ``_forward_impl`` — the transpose is exact and the
        channels-first resize applies the identical row-then-column
        2-term weighted sums — but in the layout the stitch pipeline
        wants: TPU tiles the two minor dims as (8, 128), so class-minor
        ``[..., H, W, C]`` f32 maps pad C=19 to 128 lanes and every
        post-forward pass (logit upsample, softmax, flip average,
        stitch scatter, count divide, final resize) pays 6.7x the HBM
        bytes. Measured on the fused Cityscapes ms program: those legs
        cost 0.52 s/img class-minor (tool/ms_attrib.py ladder, 1.387 ->
        1.02 s between the full and forwards-only ablations).
        """
        logits = self.model.apply(variables, self._normalize(images), train=False)
        logits = jnp.transpose(logits, (0, 3, 1, 2))
        if logits.shape[2:4] != images.shape[1:3]:
            logits = resize_bilinear_align_corners_cf(
                logits, (images.shape[1], images.shape[2])
            )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=1)
        # On a bf16 model the per-window full-res probs are the dominant
        # post-forward intermediates (attribution: tool/ms_attrib.py);
        # carry them in the model's own compute dtype between the softmax
        # and the stitch — softmax reductions stay f32, the stitch
        # accumulator stays f32 (bf16 x f32 weight promotes), only the
        # [B, C, crop, crop] containers halve their HBM traffic. Probs
        # are in [0, 1]: bf16 rounding is ~3e-3 relative, inside the
        # bf16 path's existing numeric license (the logits themselves
        # carry bf16 noise). f32 models are untouched.
        if getattr(self.model, "dtype", None) == jnp.bfloat16:
            probs = probs.astype(jnp.bfloat16)
        return probs

    def _forward_fused_pairs(self, variables, batch, wb):
        """[2*wb, crop_h, crop_w, 3] (originals ++ flipped) -> averaged
        probs [wb, C, crop_h, crop_w] with the zoom upsample, f32
        softmax and flip average fused into one Pallas kernel — no
        crop-resolution intermediate ever round-trips HBM
        (ops/stitch_pallas.py; semantics = reference tool/test.py:135-143
        with the model's own zoom resize, model/pspnet.py:94-95)."""
        from semseg_tpu.ops.stitch_pallas import upsample_softmax_flip

        logits = self._model_lowres.apply(
            variables, self._normalize(batch), train=False
        )  # [2*wb, hs, ws, C]
        lt = jnp.transpose(logits, (0, 3, 1, 2))  # [2*wb, C, hs, ws]
        pairs = jnp.stack([lt[:wb], lt[wb:]], axis=1)
        return upsample_softmax_flip(
            pairs, (self.crop_h, self.crop_w),
            interpret=self._fused_interpret,
        )

    # ------------------------------------------------------------------
    # device mode: one jitted program per (image shape, scale)
    # ------------------------------------------------------------------
    def _build_ms_argmax_raw(self, h, w):
        """ALL scales + sum + argmax as ONE program: a multi-scale image
        costs one dispatch, one image upload and one uint8 readback. On
        a relay-attached chip each extra dispatch costs host RTT that
        caps pipelined throughput (measured: 6 per-scale dispatches +
        combiner ran at 0.7 img/s; the fused program removes that
        ceiling). Shares the per-scale pipeline builders."""
        if self.pooled_ms and len(self.scales) > 1:
            return self._build_ms_pooled_raw(h, w)
        raw_fns = [
            self._build_scale_raw(h, w, scale, channels_first=True)
            for scale in self.scales
        ]

        def ms_fn(variables, image):
            total = None
            for fn in raw_fns:
                # bf16-path scale programs return bf16-rounded probs (the
                # final-resize license); the CROSS-SCALE sum stays f32 so
                # accumulating 6 scales adds no further rounding
                probs = fn(variables, image).astype(jnp.float32)  # [C,h,w]
                total = probs if total is None else total + probs
            return jnp.argmax(total, axis=0).astype(jnp.uint8)

        return ms_fn

    def _build_ms_argmax_fn(self, h, w):
        return jax.jit(self._build_ms_argmax_raw(h, w))

    def _build_ms_pooled_raw(self, h, w):
        """The ms program with ONE pooled window stream across scales.

        Every scale's sliding window is the same ``[crop_h, crop_w]``
        crop — only the source canvas differs — so instead of six
        per-scale scans, each padding its own tail chunk to the
        batch-aligned width (and the 2-window 0.5x scale running a whole
        chunk at the slow half batch), the global window list pools into
        ONE scan with a single padded tail: 88 -> 84 window-pair slots
        on the Cityscapes protocol (the chunk-padding leg was the
        largest attributed residual in the tool/ms_attrib.py ladder),
        and the program inlines the window forward once instead of once
        per scale. Canvases and accumulators stack on a leading scale
        axis so the scan body gathers/scatters with a traced scale
        index. Numerics are bit-identical to the per-scale path: the
        pool keeps (scale, row-major) order, so each canvas sees the
        same windows added in the same sequence, and the per-window
        forward does not depend on which batch slot a window rides in.
        Protocol semantics: reference ``tool/test.py:149-178`` (same
        grid, count-divide, un-pad, half-pixel resize per scale)."""
        crop_h, crop_w = self.crop_h, self.crop_w
        classes = self.classes
        wb = max(1, self.window_batch // (2 if self.flip else 1))
        geoms = []
        pool = []  # (scale_idx, y, x) — static at trace time
        for si, scale in enumerate(self.scales):
            new_h, new_w = _scaled_size(h, w, scale, self.base_size)
            pad_h = max(crop_h - new_h, 0)
            pad_w = max(crop_w - new_w, 0)
            canvas_h, canvas_w = new_h + pad_h, new_w + pad_w
            coords = _grid_coords(canvas_h, canvas_w, crop_h, crop_w,
                                  self.stride_rate)
            count_rows = np.zeros((canvas_h, 1), dtype=np.float32)
            count_cols = np.zeros((canvas_w, 1), dtype=np.float32)
            for s_h in sorted({c[0] for c in coords}):
                count_rows[s_h : s_h + crop_h] += 1.0
            for s_w in sorted({c[1] for c in coords}):
                count_cols[s_w : s_w + crop_w] += 1.0
            geoms.append(dict(
                new_h=new_h, new_w=new_w,
                pad_h_half=pad_h // 2, pad_w_half=pad_w // 2,
                canvas_h=canvas_h, canvas_w=canvas_w,
                count_rows=count_rows, count_cols=count_cols,
            ))
            pool += [(si, s_h, s_w) for (s_h, s_w) in coords]
        wb = min(wb, len(pool))
        n_pad = (-len(pool)) % wb
        syx_arr = np.asarray(
            pool + [(0, 0, 0)] * n_pad, dtype=np.int32
        ).reshape(-1, wb, 3)
        weights_arr = np.asarray(
            [1.0] * len(pool) + [0.0] * n_pad, dtype=np.float32
        ).reshape(-1, wb)
        n_scales = len(self.scales)
        max_ch = max(g["canvas_h"] for g in geoms)
        max_cw = max(g["canvas_w"] for g in geoms)

        mean = jnp.asarray(self.mean)
        flip = self.flip
        fused = self.fused_stitch
        model_apply = self._forward_cf
        fused_apply = self._forward_fused_pairs
        is_bf16 = getattr(self.model, "dtype", None) == jnp.bfloat16

        def ms_fn(variables, image):
            image = image.astype(jnp.float32)
            # Stack every scale's mean-padded canvas along a leading
            # scale axis; regions past a scale's own extent are never
            # gathered (coords stay inside each canvas).
            canvases = jnp.zeros((n_scales, max_ch, max_cw, 3), jnp.float32)
            for si, g in enumerate(geoms):
                img = resize_bilinear_half_pixel(
                    image, (g["new_h"], g["new_w"])
                )
                c = jnp.broadcast_to(
                    mean, (g["canvas_h"], g["canvas_w"], 3)
                ).astype(jnp.float32)
                c = jax.lax.dynamic_update_slice(
                    c, img, (g["pad_h_half"], g["pad_w_half"], 0)
                )
                canvases = jax.lax.dynamic_update_slice(
                    canvases, c[None], (si, 0, 0, 0)
                )

            def chunk_body(acc, xs):
                cs, wt = xs  # [wb, 3] int32 (scale, y, x), [wb] f32

                def take(c):
                    return jax.lax.dynamic_slice(
                        canvases, (c[0], c[1], c[2], 0),
                        (1, crop_h, crop_w, 3),
                    )[0]

                wins = jax.vmap(take)(cs)
                batch = (
                    jnp.concatenate([wins, wins[:, :, ::-1]], axis=0)
                    if flip else wins
                )
                if fused:
                    probs = fused_apply(variables, batch, wb)
                else:
                    probs = model_apply(variables, batch)
                    if flip:
                        probs = (probs[:wb] + probs[wb:][..., ::-1]) / 2

                def put(i, a):
                    c = cs[i]
                    patch = jax.lax.dynamic_slice(
                        a, (c[0], 0, c[1], c[2]),
                        (1, classes, crop_h, crop_w),
                    )
                    return jax.lax.dynamic_update_slice(
                        a, patch + (probs[i] * wt[i])[None],
                        (c[0], 0, c[1], c[2]),
                    )

                return jax.lax.fori_loop(0, wb, put, acc), None

            acc0 = jnp.zeros(
                (n_scales, classes, max_ch, max_cw), jnp.float32
            )
            acc, _ = jax.lax.scan(
                chunk_body, acc0,
                (jnp.asarray(syx_arr), jnp.asarray(weights_arr)),
            )
            total = None
            for si, g in enumerate(geoms):
                a = jax.lax.slice(
                    acc, (si, 0, 0, 0),
                    (si + 1, classes, g["canvas_h"], g["canvas_w"]),
                )[0]
                a = a / (
                    jnp.asarray(g["count_rows"])
                    * jnp.asarray(g["count_cols"]).T
                )[None]
                a = jax.lax.dynamic_slice(
                    a, (0, g["pad_h_half"], g["pad_w_half"]),
                    (classes, g["new_h"], g["new_w"]),
                )
                # same bf16 final-resize license as _build_scale_raw
                if is_bf16:
                    a = a.astype(jnp.bfloat16)
                p = resize_bilinear_half_pixel_cf(a, (h, w))
                # cross-scale sum stays f32 (same as the per-scale path)
                p = p.astype(jnp.float32)
                total = p if total is None else total + p
            return jnp.argmax(total, axis=0).astype(jnp.uint8)

        return ms_fn

    def _build_scale_fn(self, h, w, scale, emit_argmax=False):
        return jax.jit(self._build_scale_raw(h, w, scale, emit_argmax))

    def _build_scale_raw(self, h, w, scale, emit_argmax=False,
                         channels_first=False):
        """One scale's full pipeline. Internals run CHANNELS-FIRST from
        the window forward onward (see ``_forward_cf``: class-minor f32
        maps pad C to 128 lanes in the TPU's (8,128) tiling and the
        softmax/flip/stitch/divide/resize passes pay 128/C the HBM
        bytes). ``channels_first=True`` returns ``[C, h, w]`` (the ms
        combiner's layout); default transposes back to the public
        ``[h, w, C]`` contract at the very end."""
        crop_h, crop_w = self.crop_h, self.crop_w
        new_h, new_w = _scaled_size(h, w, scale, self.base_size)
        pad_h = max(crop_h - new_h, 0)
        pad_w = max(crop_w - new_w, 0)
        pad_h_half, pad_w_half = pad_h // 2, pad_w // 2
        canvas_h, canvas_w = new_h + pad_h, new_w + pad_w
        coords = _grid_coords(canvas_h, canvas_w, crop_h, crop_w, self.stride_rate)

        # The per-pixel window-coverage map is separable (the grid is a
        # cartesian product of row/col origins): count = rows ⊗ cols.
        # Keeping it as two 1-D vectors instead of a [H, W] constant
        # matters remotely: a full Cityscapes 1.75x-scale count map is a
        # ~25 MB HLO constant, and the fused all-scales ms program with
        # six of them exceeded the compile-relay's request size limit.
        count_rows = np.zeros((canvas_h, 1), dtype=np.float32)
        count_cols = np.zeros((canvas_w, 1), dtype=np.float32)
        for s_h in sorted({c[0] for c in coords}):
            count_rows[s_h : s_h + crop_h] += 1.0
        for s_w in sorted({c[1] for c in coords}):
            count_cols[s_w : s_w + crop_w] += 1.0

        # Chunk windows; flip doubles the model batch. The chunk size is
        # FIXED at the configured window_batch (padding the last chunk)
        # rather than shrunk per scale to minimize padded slots: the
        # per-window forward rate is strongly batch-dependent (measured
        # on-chip, PSPNet50 @713^2 bf16: batch 4/8/12/16 -> 122/191/128/
        # 169 windows/s — the 8-sublane-aligned batches win), so padded
        # slots at the fast batch beat fewer slots at a slow one. The
        # round-4 slot-minimizing search assumed batch-independent cost;
        # the ladder showed its mixed batch-4..12 chunks ran the window
        # path ~15% below the batch-aligned rate.
        wb_max = max(1, self.window_batch // (2 if self.flip else 1))
        n_win = len(coords)
        wb = min(wb_max, n_win)
        n_pad = (-n_win) % wb
        coords_arr = np.asarray(
            coords + [(0, 0)] * n_pad, dtype=np.int32
        ).reshape(-1, wb, 2)
        weights_arr = np.asarray(
            [1.0] * n_win + [0.0] * n_pad, dtype=np.float32
        ).reshape(-1, wb)

        mean = jnp.asarray(self.mean)
        flip = self.flip
        model_apply = self._forward_cf
        constrain = self._constrain_batch
        fused = self.fused_stitch
        fused_apply = self._forward_fused_pairs

        def scale_fn(variables, image):
            # Accept uint8 uploads (4x less host->device traffic) and cast
            # on device; values are 0-255 either way.
            image = image.astype(jnp.float32)
            # 1) scale (half-pixel bilinear, cv2-equivalent)
            img = resize_bilinear_half_pixel(image, (new_h, new_w))
            # 2) mean-pad to at least the crop size
            canvas_img = jnp.broadcast_to(
                mean, (canvas_h, canvas_w, 3)
            ).astype(jnp.float32)
            canvas_img = jax.lax.dynamic_update_slice(
                canvas_img, img, (pad_h_half, pad_w_half, 0)
            )

            def chunk_body(acc, xs):
                cs, wt = xs  # [wb, 2] int32, [wb] f32

                def take(c):
                    return jax.lax.dynamic_slice(
                        canvas_img, (c[0], c[1], 0), (crop_h, crop_w, 3)
                    )

                wins = jax.vmap(take)(cs)
                batch = (
                    jnp.concatenate([wins, wins[:, :, ::-1]], axis=0)
                    if flip
                    else wins
                )
                if fused:
                    probs = fused_apply(variables, constrain(batch), wb)
                else:
                    probs = model_apply(variables, constrain(batch))
                    if flip:
                        # un-flip = reverse W, the minor axis here (lane
                        # reversal, one fused VPU pass on unpadded rows)
                        probs = (probs[:wb] + probs[wb:][..., ::-1]) / 2

                def put(i, a):
                    c = cs[i]
                    patch = jax.lax.dynamic_slice(
                        a, (0, c[0], c[1]), (probs.shape[1], crop_h, crop_w)
                    )
                    return jax.lax.dynamic_update_slice(
                        a, patch + probs[i] * wt[i], (0, c[0], c[1])
                    )

                acc = jax.lax.fori_loop(0, wb, put, acc)
                return acc, None

            acc0 = jnp.zeros((self.classes, canvas_h, canvas_w), jnp.float32)
            acc, _ = jax.lax.scan(
                chunk_body, acc0,
                (jnp.asarray(coords_arr), jnp.asarray(weights_arr)),
            )
            acc = acc / (
                jnp.asarray(count_rows) * jnp.asarray(count_cols).T
            )[None]
            # 3) un-pad, resize probs back to the original resolution
            acc = jax.lax.dynamic_slice(
                acc, (0, pad_h_half, pad_w_half),
                (self.classes, new_h, new_w),
            )
            # On the bf16 path carry the count-divided probs back to bf16
            # for the final resize: the windows' probs were already
            # bf16-rounded containers, so this stays inside the same
            # numeric license, and a bf16 source takes the single-pass
            # MXU resize instead of f32's 6-pass 'highest' decomposition
            # (the attribution ladder's final-resize leg). f32 models
            # keep exact f32 end to end.
            if getattr(self.model, "dtype", None) == jnp.bfloat16:
                acc = acc.astype(jnp.bfloat16)
            probs = resize_bilinear_half_pixel_cf(acc, (h, w))
            if emit_argmax:
                # Single-scale fast path: the uint8 class map comes out of
                # the same program — one dispatch + one 1-byte/px readback
                # per image (each extra dispatch costs a relay RTT).
                return jnp.argmax(probs, axis=0).astype(jnp.uint8)
            if channels_first:
                return probs
            return jnp.transpose(probs, (1, 2, 0))

        return scale_fn

    def _scale_probs_device(self, image: np.ndarray):
        """Dispatch every scale's program; returns the list of lazy
        per-scale prob maps (uploads the image once)."""
        h, w, _ = image.shape
        # Keep uint8 images uint8 for the transfer; cast happens on device.
        img = jnp.asarray(image)
        probs = []
        for scale in self.scales:
            key = (h, w, scale)
            if key not in self._scale_fns:
                self._scale_fns[key] = self._build_scale_fn(h, w, scale)
            probs.append(self._scale_fns[key](self.variables, img))
        return probs

    def _predict_probs_device(self, image: np.ndarray):
        probs = self._scale_probs_device(image)
        return probs[0] if len(probs) == 1 else self._combine_mean(probs)

    # ------------------------------------------------------------------
    # host mode (reference-faithful cv2/numpy stitching)
    # ------------------------------------------------------------------
    def _run_windows(self, windows: np.ndarray) -> np.ndarray:
        n = windows.shape[0]
        wb = self.window_batch
        probs = np.empty(
            (n, self.crop_h, self.crop_w, self.classes), dtype=np.float32
        )
        for start in range(0, n, wb):
            chunk = windows[start : start + wb]
            pad = wb - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0
                )
            out = np.asarray(self._forward(self.variables, jnp.asarray(chunk)))
            probs[start : start + wb] = out[: wb - pad if pad else wb]
        return probs

    def net_process(self, image: np.ndarray) -> np.ndarray:
        """Single-crop probabilities with optional flip TTA
        (reference ``tool/test.py:122-146``)."""
        batch = image[None]
        if self.flip:
            batch = np.concatenate([batch, batch[:, :, ::-1]], axis=0)
        probs = self._run_windows(batch)
        if self.flip:
            return (probs[0] + probs[1][:, ::-1]) / 2
        return probs[0]

    def scale_process(self, image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
        """Host-stitched prediction of one scaled image
        (reference ``tool/test.py:149-178``)."""
        ori_h, ori_w, _ = image.shape
        pad_h = max(self.crop_h - ori_h, 0)
        pad_w = max(self.crop_w - ori_w, 0)
        pad_h_half, pad_w_half = pad_h // 2, pad_w // 2
        if pad_h > 0 or pad_w > 0:
            image = cv2.copyMakeBorder(
                image, pad_h_half, pad_h - pad_h_half, pad_w_half,
                pad_w - pad_w_half, cv2.BORDER_CONSTANT,
                value=self.mean.tolist(),
            )
        new_h, new_w, _ = image.shape
        coords = _grid_coords(new_h, new_w, self.crop_h, self.crop_w,
                              self.stride_rate)
        windows = np.stack(
            [image[s_h : s_h + self.crop_h, s_w : s_w + self.crop_w]
             for (s_h, s_w) in coords]
        )
        if self.flip:
            windows = np.concatenate([windows, windows[:, :, ::-1]], axis=0)
        probs = self._run_windows(windows)
        if self.flip:
            k = len(coords)
            probs = (probs[:k] + probs[k:][:, :, ::-1]) / 2

        prediction = np.zeros((new_h, new_w, self.classes), dtype=np.float64)
        count = np.zeros((new_h, new_w, 1), dtype=np.float64)
        for win_probs, (s_h, s_w) in zip(probs, coords):
            prediction[s_h : s_h + self.crop_h, s_w : s_w + self.crop_w] += win_probs
            count[s_h : s_h + self.crop_h, s_w : s_w + self.crop_w] += 1
        prediction /= count
        prediction = prediction[
            pad_h_half : pad_h_half + ori_h, pad_w_half : pad_w_half + ori_w
        ]
        return _cv2_resize_mc(prediction, out_w, out_h)

    def _predict_probs_host(self, image: np.ndarray) -> np.ndarray:
        h, w, _ = image.shape
        prediction = np.zeros((h, w, self.classes), dtype=np.float64)
        for scale in self.scales:
            new_h, new_w = _scaled_size(h, w, scale, self.base_size)
            image_scale = cv2.resize(
                image, (new_w, new_h), interpolation=cv2.INTER_LINEAR
            )
            prediction += self.scale_process(image_scale, h, w)
        return prediction / len(self.scales)

    # ------------------------------------------------------------------
    # public API
    # ------------------------------------------------------------------
    def predict_probs(self, image: np.ndarray) -> np.ndarray:
        """Full multi-scale class probabilities for one RGB float32 HWC
        image (reference ``tool/test.py:187-203``)."""
        if self.mode == "device":
            return np.asarray(self._predict_probs_device(image))
        if self.mode == "device_bucketed":
            probs, (h, w) = self._bucketed.predict_probs(image)
            # device layout is channels-first; public contract is [h, w, C]
            return np.asarray(probs)[:, :h, :w].transpose(1, 2, 0)
        return self._predict_probs_host(image)

    def predict_async(self, image: np.ndarray):
        """Dispatch one image and return the (lazy) device uint8 class map
        plus the crop needed to trim bucket padding.

        JAX dispatch is asynchronous: callers can enqueue the next image's
        upload/compute while this one runs, and materialize results with
        ``np.asarray`` later — upload, compute and readback pipeline across
        images instead of serializing on every host sync.
        """
        if self.mode == "device":
            if len(self.scales) == 1:
                h, w, _ = image.shape
                key = (h, w, self.scales[0], "argmax")
                if key not in self._scale_fns:
                    self._scale_fns[key] = self._build_scale_fn(
                        h, w, self.scales[0], emit_argmax=True
                    )
                return self._scale_fns[key](self.variables, jnp.asarray(image))
            # ms: ONE fused all-scales program (single dispatch + upload
            # + uint8 readback per image; pipelines across images).
            h, w, _ = image.shape
            key = (h, w, "ms_argmax")
            if key not in self._scale_fns:
                self._scale_fns[key] = self._build_ms_argmax_fn(h, w)
            return self._scale_fns[key](self.variables, jnp.asarray(image))
        if self.mode == "device_bucketed":
            probs, (h, w) = self._bucketed.predict_probs(image)
            return jnp.argmax(probs, axis=0).astype(jnp.uint8)[:h, :w]
        raise ValueError("predict_async requires a device mode")

    def predict(self, image: np.ndarray) -> np.ndarray:
        """argmax class map for one image (uint8)."""
        if self.mode in ("device", "device_bucketed"):
            return np.asarray(self.predict_async(image))
        return np.argmax(self._predict_probs_host(image), axis=2).astype(np.uint8)
