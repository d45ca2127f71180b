"""bf16-vs-f32 convergence equivalence on structured synthetic data.

The performance headlines train in bfloat16 (`compute_dtype: bfloat16`),
which deviates from the reference's f32 recipe; this script produces the
accuracy license for that deviation: train the SAME model (PSPNet50, the
flagship) from the SAME init on the SAME synthetic dataset under both
compute dtypes for several hundred steps, and compare held-out val-mIoU
trajectories. Pass criterion: final val-mIoU gap < 1 point.

The dataset is procedurally generated segmentation with learnable but
non-trivial structure: class-tied base colors occluded by random
rectangles/ellipses/stripes, with per-pixel noise and per-image global
illumination jitter, so the model must actually learn color+context (a
linear pixel classifier does not reach high mIoU under the jitter).

Usage (real TPU, ~15 min including two remote compiles):
    python tool/convergence.py [STEPS]
Prints one JSON line per eval point and a final summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLASSES = 6
CROP = 97            # (97-1) % 8 == 0
BATCH = 8
N_TRAIN, N_VAL = 256, 64
BASE_LR, MOMENTUM, WD, AUX_W = 0.01, 0.9, 1e-4, 0.4
EVAL_EVERY = 50


def _paint(rs, h, w):
    """One (image, label) pair: background + 3-6 random shapes."""
    # class-tied base colors (spread over RGB space), noisy
    palette = np.array([
        [40, 40, 40], [200, 60, 60], [60, 200, 60], [60, 60, 200],
        [200, 200, 60], [160, 60, 200],
    ], np.float32)
    label = np.zeros((h, w), np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(rs.randint(3, 7)):
        cls = rs.randint(1, CLASSES)
        kind = rs.randint(3)
        cy, cx = rs.randint(0, h), rs.randint(0, w)
        ry, rx = rs.randint(h // 8, h // 2), rs.randint(w // 8, w // 2)
        if kind == 0:      # rectangle
            m = (np.abs(yy - cy) < ry) & (np.abs(xx - cx) < rx)
        elif kind == 1:    # ellipse
            m = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
        else:              # diagonal stripes
            period = rs.randint(8, 24)
            m = (((yy + xx) // period) % 2 == 0) & (np.abs(yy - cy) < ry) \
                & (np.abs(xx - cx) < rx)
        label[m] = cls
    image = palette[label]
    # global illumination jitter + per-pixel noise: forces context use
    image = image * rs.uniform(0.6, 1.4) + rs.uniform(-25, 25, 3)
    image = image + rs.randn(h, w, 3) * 20.0
    return np.clip(image, 0, 255).astype(np.float32), label


def make_dataset(seed, n):
    rs = np.random.RandomState(seed)
    images = np.empty((n, CROP, CROP, 3), np.float32)
    labels = np.empty((n, CROP, CROP), np.uint8)
    for i in range(n):
        images[i], labels[i] = _paint(rs, CROP, CROP)
    return images, labels


def run(dtype_name: str, steps: int, train_set, val_set, seed=0,
        init_variables=None, stream_offset=0):
    """One training arm. ``init_variables`` (optional plain-dict
    {"params", "batch_stats"}) overrides the random init — used by
    convergence_cross.py to start from the torch reference's init.
    ``stream_offset`` shifts the stochastic streams (dropout rng and the
    batch-index stream) while keeping the init fixed — within-arm
    replica runs for the seed-noise measurement use it (0 reproduces the
    historical behavior: rng_seed 0, index stream seed+1)."""
    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.trainer import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )
    from semseg_tpu.models import PSPNet
    from semseg_tpu.utils.metrics import summarize

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    arch = os.environ.get("CONVERGENCE_ARCH", "psp")
    if arch == "psa":
        # PSANet: additionally licenses the bf16 PSA attention path (the
        # fused Pallas kernel's bf16 A containers) — mask dims derived as
        # the train driver derives them (reference tool/train.py:70-72).
        from semseg_tpu.models import PSANet

        mask = 2 * ((CROP - 1) // (8 * 2) + 1) - 1
        model = PSANet(
            layers=50, classes=CLASSES, zoom_factor=8, dtype=dtype,
            psa_type=2, compact=False, shrink_factor=2,
            mask_h=mask, mask_w=mask, normalization_factor=1.0,
            psa_softmax=True,
        )
    else:
        model = PSPNet(layers=50, classes=CLASSES, zoom_factor=8, dtype=dtype)
    # identical init across dtypes: params are f32 either way
    state = create_train_state(
        model, jax.random.PRNGKey(seed),
        jnp.zeros((BATCH, CROP, CROP, 3), jnp.float32),
    )
    if init_variables is not None:
        from semseg_tpu.engine.trainer import TrainState

        state = TrainState(
            params=jax.tree.map(jnp.asarray, init_variables["params"]),
            batch_stats=jax.tree.map(
                jnp.asarray, init_variables["batch_stats"]
            ),
            opt=state.opt, step=state.step,
        )
    value_scale = 255
    mean = [0.485 * value_scale, 0.456 * value_scale, 0.406 * value_scale]
    std = [0.229 * value_scale, 0.224 * value_scale, 0.225 * value_scale]
    train_step = make_train_step(
        model, classes=CLASSES, ignore_label=255, aux_weight=AUX_W,
        base_lr=BASE_LR, max_iter=steps, power=0.9, momentum=MOMENTUM,
        weight_decay=WD, zoom_factor=8, num_replicas=1,
        normalize=(mean, std), rng_seed=stream_offset,
    )
    eval_step = make_eval_step(
        model, classes=CLASSES, ignore_label=255, zoom_factor=8,
        normalize=(mean, std),
    )

    tr_images, tr_labels = train_set
    va_images, va_labels = val_set

    def val_miou(state):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        acc = None
        for s in range(0, len(va_images), BATCH):
            m = eval_step(
                variables, jnp.asarray(va_images[s:s + BATCH]),
                jnp.asarray(va_labels[s:s + BATCH].astype(np.int32)),
            )
            acc = m if acc is None else {k: acc[k] + m[k] for k in acc}
        acc = jax.device_get(acc)
        m_iou, m_acc, all_acc = summarize(
            acc["intersection"], acc["union"], acc["target"]
        )
        return float(m_iou)

    rs = np.random.RandomState(seed + 1 + stream_offset)
    trajectory = []
    t0 = time.time()
    for step in range(steps):
        idx = rs.randint(0, len(tr_images), BATCH)
        state, metrics = train_step(
            state, jnp.asarray(tr_images[idx]),
            jnp.asarray(tr_labels[idx].astype(np.int32)),
        )
        if (step + 1) % EVAL_EVERY == 0 or step + 1 == steps:
            miou = val_miou(state)
            trajectory.append((step + 1, miou))
            print(json.dumps({
                "dtype": dtype_name, "step": step + 1,
                "val_mIoU": round(miou, 4),
                "loss": round(float(jax.device_get(metrics["loss"])), 4),
                "elapsed_s": round(time.time() - t0, 1),
            }), flush=True)
    return trajectory


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    train_set = make_dataset(0, N_TRAIN)
    val_set = make_dataset(1, N_VAL)
    results = {}
    for dtype_name in ("float32", "bfloat16"):
        results[dtype_name] = run(dtype_name, steps, train_set, val_set)
    f32 = results["float32"][-1][1]
    bf16 = results["bfloat16"][-1][1]
    print(json.dumps({
        "metric": "bf16_vs_f32_val_mIoU_gap",
        "arch": os.environ.get("CONVERGENCE_ARCH", "psp"),
        "steps": steps,
        "f32_final": round(f32, 4),
        "bf16_final": round(bf16, 4),
        "gap_points": round((f32 - bf16) * 100, 2),
        "pass": abs(f32 - bf16) < 0.01,
        "f32_trajectory": [[s, round(m, 4)] for s, m in results["float32"]],
        "bf16_trajectory": [[s, round(m, 4)] for s, m in results["bfloat16"]],
    }))


if __name__ == "__main__":
    main()
