"""Serving export: self-contained StableHLO deployment artifacts.

The reference has no deployment story beyond re-running ``tool/test.py``
with a checkpoint — serving requires the full framework plus the model
source (``/root/reference/tool/test.py:99-116`` rebuilds the nn.Module and
loads a ``.pth``). The TPU-native deployment unit is different: a
serialized, already-lowered StableHLO program (``jax.export``) with the
weights baked in as constants. The artifact is:

- **self-contained** — callable from any JAX process (or anything that can
  feed StableHLO to XLA) without this package, the model class, or the
  checkpoint;
- **batch-polymorphic** — exported over a symbolic leading batch dim, so
  one artifact serves any batch size without re-export;
- **portable across backends** — exported for a chosen platform list
  (default: the current one; pass ``platforms=("tpu", "cpu")`` for a
  cross-platform artifact). For portability the program must avoid
  backend-specific custom calls, so PSANet models should be built with
  ``fused_attention=False`` (pure-XLA attention) before export — the
  Pallas kernel serializes as a Mosaic TPU custom call that only a TPU
  runtime of a compatible version can consume. A **TPU-targeted**
  export (``platforms=("tpu",)`` + ``allow_tpu_custom_calls=True``)
  keeps the fused kernel: jax.export guarantees Mosaic custom-call
  compatibility only within its published backwards-compatibility
  window (~6 months of jaxlib/libtpu releases), so ship TPU-targeted
  artifacts with the exporting jax version pinned in deployment
  metadata and re-export when the serving runtime rolls past the
  window. The XLA-attention path stays the portable default.

The served function is the eval-forward contract of the sliding-window
engine's ``net_process`` (reference ``tool/test.py:122-146``): raw RGB
crops in [0,255] NHWC float32 → on-device normalize → eval-mode forward
→ softmax probabilities (or logits / uint8 argmax predictions).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def make_serving_fn(model, variables, *, mean: Sequence[float],
                    std: Optional[Sequence[float]], output: str = "probs"):
    """Eval-forward closure with weights + normalization baked in.

    ``output``: "probs" (softmax, float32), "logits" (float32), or
    "pred" (argmax class map, uint8 — the wire format the eval pipeline
    returns to the host).
    """
    assert output in ("probs", "logits", "pred"), output
    mean_a = jnp.asarray(np.asarray(mean, np.float32))
    std_a = None if std is None else jnp.asarray(np.asarray(std, np.float32))

    def fn(image):
        x = image - mean_a
        if std_a is not None:
            x = x / std_a
        logits = model.apply(variables, x, train=False)
        if output == "logits":
            return logits
        if output == "pred":
            return jnp.argmax(logits, axis=-1).astype(jnp.uint8)
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    return fn


def _export_kwargs(platforms, allow_tpu_custom_calls):
    from jax import export as jexport

    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    if allow_tpu_custom_calls:
        if platforms is not None and any(p != "tpu" for p in platforms):
            raise ValueError(
                "allow_tpu_custom_calls requires a tpu-only platform list: "
                f"a Mosaic custom call cannot run on {platforms}"
            )
        kwargs["disabled_checks"] = [
            jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")
        ]
    return kwargs


def export_serving(model, variables, *, crop_h: int, crop_w: int,
                   mean: Sequence[float], std: Optional[Sequence[float]],
                   output: str = "probs",
                   platforms: Optional[Sequence[str]] = None,
                   allow_tpu_custom_calls: bool = False):
    """Lower + export the serving function over a symbolic batch dim.

    ``allow_tpu_custom_calls``: permit Mosaic (Pallas) custom calls in
    the artifact — TPU-targeted exports that keep the fused PSA
    attention kernel (see the module docstring's version-compat note).
    Requires a tpu-only ``platforms``.

    Returns a ``jax.export.Exported``; ``.serialize()`` yields the
    deployable bytes.
    """
    from jax import export as jexport

    fn = make_serving_fn(model, variables, mean=mean, std=std, output=output)
    (batch,) = jexport.symbolic_shape("batch")
    spec = jax.ShapeDtypeStruct((batch, crop_h, crop_w, 3), jnp.float32)
    kwargs = _export_kwargs(platforms, allow_tpu_custom_calls)
    return jexport.export(jax.jit(fn), **kwargs)(spec)


def export_sliding_window(evaluator, h: int, w: int, *,
                          image_dtype=jnp.uint8,
                          platforms: Optional[Sequence[str]] = None,
                          allow_tpu_custom_calls: bool = False):
    """Export the evaluator's FULL fused sliding-window program for a
    fixed input shape (h, w): per-scale long-side resize → mean pad →
    window-grid forwards with flip TTA → count-normalized stitch →
    prob resize to (h, w) → multi-scale average → uint8 argmax — the
    complete ``tool/test.py`` deployment contract (reference
    ``tool/test.py:99-223``) as ONE self-contained StableHLO artifact,
    not just the per-crop ``net_process`` analog above.

    The served signature is ``fn(image[h, w, 3] image_dtype) ->
    uint8[h, w]`` with the weights, scales, grid and normalization baked
    in. Fixed (H, W) is inherent: the window grid is static per shape
    (same reason the in-framework engine compiles per shape).
    """
    from jax import export as jexport

    variables = evaluator.variables
    if len(evaluator.scales) == 1:
        raw = evaluator._build_scale_raw(
            h, w, evaluator.scales[0], emit_argmax=True)
    else:
        raw = evaluator._build_ms_argmax_raw(h, w)

    def fn(image):
        return raw(variables, image)

    spec = jax.ShapeDtypeStruct((h, w, 3), image_dtype)
    kwargs = _export_kwargs(platforms, allow_tpu_custom_calls)
    return jexport.export(jax.jit(fn), **kwargs)(spec)


def save_serving(path: str, exported) -> None:
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_serving(path: str):
    """Deserialize an artifact; returns a callable ``fn(image) -> output``.

    Needs only jax — not this package's model code — which is the point:
    the artifact is the deployment contract, not the framework.
    """
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(bytearray(f.read()))
    return jax.jit(exported.call)
