"""Probe the fused PSA kernel's TPU compile envelope at flagship scales.

Round-2 finding: the whole-program train step for Cityscapes-PSA (hw=2025,
mask 89^2) fails remote TPU compilation at batch >= 8 with an opaque
``tpu_compile_helper ... HTTP 500`` when the fused Pallas softmax+bmm is
in the graph, while batch 4 compiles and the XLA softmax+einsum path
compiles at batch 16. This script isolates WHERE the failure lives:

  stage kernel-fwd:   the pallas_call alone, forward only
  stage kernel-grad:  forward + custom-VJP backward kernels
  stage branch:       one PSA attention branch (reduce/attend/aggregate)
  stage train:        the full PSANet train step (the failing program)

at a sweep of batch sizes, printing compile wall time or the FULL error
(type + text) for each point — turning the HTTP 500 into a diagnosis.

Usage: python tool/psa_compile_probe.py [stage ...] [--hw 2025] [--batches 4,8,16]
"""

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _report(stage, batch, ok, seconds=None, err=None):
    line = {"stage": stage, "batch": batch, "ok": ok}
    if seconds is not None:
        line["compile_s"] = round(seconds, 1)
    if err is not None:
        line["error"] = err
    import json

    print(json.dumps(line), flush=True)


def _try(stage, batch, fn):
    t0 = time.time()
    try:
        fn()
        _report(stage, batch, True, time.time() - t0)
        return True
    except Exception as exc:
        tb = traceback.format_exc(limit=3)
        _report(stage, batch, False, time.time() - t0,
                err=f"{type(exc).__name__}: {str(exc)[:2000]} || {tb[-500:]}")
        return False


def _kernel_fn(kernel, caps=None):
    """Resolve the op under probe: resident / flash Pallas kernels, the
    shape-dispatched auto, or the plain-XLA softmax+einsum reference.
    ``caps``: optional (cap_i, cap_j) flash tile caps / resident tile_j."""
    from semseg_tpu.ops import psa_pallas as pp

    if kernel == "flash" and caps:
        return lambda x, a: pp.psa_softmax_bmm_flash(
            x, a, 1.0, False, caps[0], caps[1])
    if kernel == "resident" and caps:
        return lambda x, a: pp.psa_softmax_bmm(x, a, 1.0, caps[-1])
    return {
        "resident": lambda x, a: pp.psa_softmax_bmm(x, a, 1.0),
        "flash": lambda x, a: pp.psa_softmax_bmm_flash(x, a, 1.0),
        "auto": lambda x, a: pp.psa_softmax_bmm_auto(x, a, 1.0),
        "xla": lambda x, a: pp.psa_softmax_bmm_reference(x, a, 1.0),
    }[kernel]


def probe_kernel(batch, hw, c, dtype_name, grad=False, kernel="resident",
                 time_steps=0, caps=None):
    import jax
    import jax.numpy as jnp

    op = _kernel_fn(kernel, caps)
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(batch, c, hw).astype(np.float32)).astype(dtype)
    a = jnp.asarray(rs.randn(batch, hw, hw).astype(np.float32)).astype(dtype)
    if grad:
        f = jax.jit(jax.grad(
            lambda x_, a_: jnp.sum(op(x_, a_)), argnums=(0, 1)
        ))
    else:
        f = jax.jit(lambda x_, a_: jnp.sum(op(x_, a_)))
    f.lower(x, a).compile()
    if time_steps:
        # Chained dispatches + one scalar readback (the relay's
        # block_until_ready is unreliable; see CLAUDE.md).
        out = f(x, a)
        _force = (lambda o: float(np.asarray(jax.tree.leaves(o)[0]).ravel()[0]))
        _force(out)
        t0 = time.time()
        for _ in range(time_steps):
            out = f(x, a)
        _force(out)
        ms = (time.time() - t0) / time_steps * 1000
        import json

        print(json.dumps({
            "stage": f"time-{kernel}{'-grad' if grad else ''}",
            "batch": batch, "hw": hw, "dtype": dtype_name,
            "caps": caps, "ms_per_call": round(ms, 2),
        }), flush=True)


def probe_branch(batch, hw, c, dtype_name):
    """One attention aggregation at feature scale: softmax+bmm with the
    mask expansion feeding it, under grad (the branch the train step
    differentiates)."""
    import jax
    import jax.numpy as jnp

    from semseg_tpu.ops import psa_attention_matrix
    from semseg_tpu.ops.psa_pallas import psa_softmax_bmm

    h = w = int(round(hw ** 0.5))
    mask_h = mask_w = 2 * h - 1
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    xr = jnp.zeros((batch, h, w, c), dtype)
    y = jnp.zeros((batch, h, w, mask_h * mask_w), dtype)

    def fwd(xr_, y_):
        a = psa_attention_matrix(y_, 0, mask_h, mask_w).astype(dtype)
        x_flat = xr_.reshape(batch, h * w, c)
        agg = psa_softmax_bmm(jnp.transpose(x_flat, (0, 2, 1)), a, 1.0)
        return jnp.sum(agg)

    jax.jit(jax.grad(fwd, argnums=(0, 1))).lower(xr, y).compile()


def probe_train(batch, dtype_name, fused, crop=705):
    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.trainer import create_train_state, make_train_step
    from semseg_tpu.models import PSANet

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = PSANet(
        layers=50, classes=19, zoom_factor=8, psa_type=2, compact=False,
        shrink_factor=2, mask_h=89, mask_w=89, normalization_factor=1.0,
        psa_softmax=True, fused_attention=fused, dtype=dtype,
    )
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        jnp.zeros((batch, crop, crop, 3), jnp.float32),
    )
    step = make_train_step(
        model, classes=19, ignore_label=255, aux_weight=0.4, base_lr=0.01,
        max_iter=1000, power=0.9, momentum=0.9, weight_decay=1e-4,
        zoom_factor=8, num_replicas=1, donate=False,
    )
    images = jnp.zeros((batch, crop, crop, 3), jnp.float32)
    labels = jnp.zeros((batch, crop, crop), jnp.int32)
    step.lower(state, images, labels).compile()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="*",
                    default=["kernel-fwd", "kernel-grad", "branch", "train"])
    ap.add_argument("--hw", type=int, default=2025)
    ap.add_argument("--c", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batches", default="4,8,16")
    ap.add_argument("--kernel", default="resident",
                    choices=["resident", "flash", "auto", "xla"])
    ap.add_argument("--time", type=int, default=0, metavar="N",
                    help="after compiling, time N chained executions")
    ap.add_argument("--caps", default=None,
                    help="flash tile caps 'ti,tj' (or resident tile_j)")
    args = ap.parse_args()
    batches = [int(b) for b in args.batches.split(",")]
    caps = tuple(int(v) for v in args.caps.split(",")) if args.caps else None

    for stage in args.stages:
        for batch in batches:
            if stage == "kernel-fwd":
                ok = _try(stage, batch, lambda: probe_kernel(
                    batch, args.hw, args.c, args.dtype, grad=False,
                    kernel=args.kernel, time_steps=args.time, caps=caps))
            elif stage == "kernel-grad":
                ok = _try(stage, batch, lambda: probe_kernel(
                    batch, args.hw, args.c, args.dtype, grad=True,
                    kernel=args.kernel, time_steps=args.time, caps=caps))
            elif stage == "branch":
                ok = _try(stage, batch, lambda: probe_branch(
                    batch, args.hw, args.c, args.dtype))
            elif stage == "train":
                ok = _try(stage, batch, lambda: probe_train(
                    batch, args.dtype, fused=True))
            elif stage == "train-xla":
                ok = _try(stage, batch, lambda: probe_train(
                    batch, args.dtype, fused=False))
            else:
                raise SystemExit(f"unknown stage {stage}")
            if not ok:
                break  # larger batches will also fail; save compile time


if __name__ == "__main__":
    main()
