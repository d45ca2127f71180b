"""Driver-captured performance report (real TPU chip).

Reproduces every PARITY.md performance claim from one script:

    python tool/perf_report.py [section ...]

Sections: train (synthetic-batch train steps for all four recipes),
loader (end-to-end train throughput with the real augmentation loader),
eval (ADE20K-style variable-shape bucketed eval + Cityscapes ss eval).
Default: all. Prints one JSON line per measurement.

Timing method: warm-up (compile) excluded; N steps dispatched
back-to-back and synced once (the TPU relay adds ~40 ms per host sync, so
per-step sync would swamp the measurement; chained dispatch matches how
the real train loop runs).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(name, **kv):
    print(json.dumps({"measurement": name, **kv}), flush=True)
    if "images_per_sec_chip" in kv:
        _record(name, kv)


def _record(name, kv):
    """Append the measurement to the PERF_RECORD.jsonl ledger — the
    committed artifact the doc-consistency test
    (tests/test_doc_consistency.py) checks every PARITY/README img/s
    quote against. Recording at capture time is what keeps prose and
    artifacts from drifting (round-4 advisor finding)."""
    row = {
        "metric": name,
        "value": kv["images_per_sec_chip"],
        "unit": "img/s/chip",
        "source": "tool/perf_report.py "
                  + time.strftime("%Y-%m-%d", time.gmtime()),
    }
    for k in ("link_MB_per_s", "window_links_MB_per_s", "window_healthy",
              "n_healthy", "windows", "dtype", "batch", "bucket"):
        if k in kv:
            row[k] = kv[k]
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PERF_RECORD.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(row) + "\n")


def _make_link_probe(nbytes=6 << 20):
    """Relay-bandwidth probe (same method as bench.py): time a few
    uploads of a ~6 MB buffer through device_put + tiny readback. Every
    eval measurement carries its probe so a slow number under a slow
    probe reads as link weather, not chip speed."""
    import jax

    buf = np.random.RandomState(7).rand(nbytes // 4).astype(np.float32)
    probe_fn = jax.jit(lambda x: x.sum())
    np.asarray(probe_fn(jax.device_put(buf)))  # compile outside timing

    def probe(n_uploads=3):
        t0 = time.perf_counter()
        vals = [probe_fn(jax.device_put(buf)) for _ in range(n_uploads)]
        _ = [np.asarray(v) for v in vals]
        return round(n_uploads * buf.nbytes / 1e6
                     / (time.perf_counter() - t0), 1)

    return probe


def _windowed_capture(run_window):
    """The bench.py weather-proofed capture, shared by every eval
    section: time ``run_window()`` (returns an img/s rate) N times,
    probe the link after each window, and score only link-healthy
    windows so a degraded-relay period cannot poison the record
    (round-4's bucketed re-capture hit a ~5 MB/s stall and was
    unusable). If the whole capture ran under bad weather (<2 healthy
    windows), all windows are scored — and n_healthy=0 tags the
    emission as weather-degraded. Returns (provenance fields for
    _emit, scored rates)."""
    probe = _make_link_probe()
    link_floor = float(os.environ.get("PERF_LINK_FLOOR_MB_S", "40"))
    n_windows = int(os.environ.get("PERF_EVAL_WINDOWS", "5"))
    rates, links = [], []
    for _ in range(n_windows):
        rates.append(run_window())
        links.append(probe())
    healthy = [li >= link_floor for li in links]
    scored = [r for r, h in zip(rates, healthy) if h]
    if len(scored) < 2:
        scored = rates
    return {
        "windows": rates,
        "window_links_MB_per_s": links,
        "window_healthy": healthy,
        "n_healthy": sum(healthy),
        "link_MB_per_s": round(float(np.median(links)), 1),
    }, scored


def _train_step_rate(arch, layers, classes, crop, batch, dtype_name,
                     steps=16, **model_kw):
    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.trainer import create_train_state, make_train_step
    from semseg_tpu.models import PSANet, PSPNet
    from semseg_tpu.models.layers import set_precision_override

    # PERF_PRECISION=high mirrors the `matmul_precision: high` config key
    # (3-pass bf16 decomposition for f32 compute).
    set_precision_override(os.environ.get("PERF_PRECISION") or None)
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    if arch == "psp":
        model = PSPNet(layers=layers, classes=classes, zoom_factor=8,
                       dtype=dtype, **model_kw)
    else:
        model = PSANet(layers=layers, classes=classes, zoom_factor=8,
                       dtype=dtype, **model_kw)

    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((batch, crop, crop, 3), jnp.float32)
    state = create_train_state(model, rng, sample)
    step = make_train_step(
        model, classes=classes, ignore_label=255, aux_weight=0.4,
        base_lr=0.01, max_iter=100000, power=0.9, momentum=0.9,
        weight_decay=1e-4, zoom_factor=8, num_replicas=1,
    )
    rs = np.random.RandomState(0)
    images = jnp.asarray(rs.rand(batch, crop, crop, 3).astype(np.float32))
    labels = jnp.asarray(
        rs.randint(0, classes, size=(batch, crop, crop)).astype(np.int32)
    )
    def _force(s):
        # A tiny data READBACK of a value that depends on the whole step
        # chain: on the relay platform block_until_ready can return before
        # remote execution finishes, so materialize real bytes.
        return float(np.asarray(jax.tree.leaves(s.params)[0]).ravel()[0])

    state, metrics = step(state, images, labels)  # compile
    _force(state)
    start = time.perf_counter()
    for _ in range(steps):
        state, metrics = step(state, images, labels)
    _force(state)
    elapsed = time.perf_counter() - start
    return elapsed / steps, float(metrics["loss"])


def section_train():
    psa59 = dict(psa_type=2, compact=False, shrink_factor=2, mask_h=59,
                 mask_w=59, normalization_factor=1.0, psa_softmax=True)
    psa89 = dict(psa_type=2, compact=False, shrink_factor=2, mask_h=89,
                 mask_w=89, normalization_factor=1.0, psa_softmax=True)
    recipes = [
        # (name, arch, layers, classes, crop, model_kw) — all eight
        # shipped recipe families, 50- and 101-layer (the 101s are the
        # BASELINE flagships: config #4 is PSPNet101 Cityscapes).
        ("pspnet50_ade20k_473", "psp", 50, 150, 473, {}),
        ("psanet50_ade20k_465", "psa", 50, 150, 465, psa59),
        ("pspnet50_cityscapes_713", "psp", 50, 19, 713, {}),
        ("psanet50_cityscapes_705", "psa", 50, 19, 705, psa89),
        ("pspnet101_ade20k_473", "psp", 101, 150, 473, {}),
        ("psanet101_ade20k_465", "psa", 101, 150, 465, psa59),
        ("pspnet101_cityscapes_713", "psp", 101, 19, 713, {}),
        ("psanet101_cityscapes_705", "psa", 101, 19, 705, psa89),
    ]
    batch0 = int(os.environ.get("PERF_BATCH", "16"))
    only = os.environ.get("PERF_RECIPES")  # comma-separated substring filter
    if only:
        keys = [k.strip() for k in only.split(",")]
        recipes = [r for r in recipes if any(k in r[0] for k in keys)]
    dtypes = os.environ.get("PERF_DTYPES", "bfloat16,float32").split(",")
    for dtype_name in dtypes:
        for name, arch, layers, classes, crop, kw in recipes:
            # Fallback ladder when a config exceeds one chip's HBM:
            # rematerialize the backbone first (FLOPs for memory, the
            # standard TPU answer), then halve the batch.
            attempts = [dict(batch=batch0, remat=False)]
            attempts += [
                dict(batch=b, remat=True)
                for b in (batch0, batch0 // 2, batch0 // 4, batch0 // 8)
                if b >= 2
            ]
            err = None
            for att in attempts:
                try:
                    sec, loss = _train_step_rate(
                        arch, layers, classes, crop, att["batch"],
                        dtype_name, remat=att["remat"], **kw
                    )
                    _emit(
                        f"train_step_{name}",
                        dtype=dtype_name, batch=att["batch"],
                        remat=att["remat"],
                        step_ms=round(sec * 1000, 1),
                        images_per_sec_chip=round(att["batch"] / sec, 2),
                        loss=round(loss, 3),
                    )
                    err = None
                    break
                except Exception as exc:
                    err = str(exc)[:200]
            if err is not None:
                _emit(f"train_step_{name}", dtype=dtype_name, batch=batch0,
                      error=err)


def section_loader(tmp_root="/tmp/perf_ade"):
    """End-to-end train throughput with the REAL augmentation loader
    (synthetic ADE-sized images on disk), including host->device transfer
    and the device-prefetch overlap from tool/train.py."""
    import cv2

    import jax
    import jax.numpy as jnp

    from semseg_tpu.data import DataLoader, SemData, transform
    from semseg_tpu.engine.trainer import create_train_state, make_train_step
    from semseg_tpu.models import PSPNet
    from semseg_tpu.parallel.mesh import batch_sharding, create_mesh

    crop, classes, batch = 473, 150, int(os.environ.get("PERF_BATCH", "16"))
    n_images = batch * 8
    os.makedirs(tmp_root, exist_ok=True)
    list_path = os.path.join(tmp_root, "train.txt")
    rs = np.random.RandomState(0)
    lines = []
    for i in range(n_images):
        ip = os.path.join(tmp_root, f"img{i}.jpg")
        lp = os.path.join(tmp_root, f"lab{i}.png")
        if not os.path.exists(lp):
            # ADE-typical size (~512x683)
            img = (rs.rand(512, 683, 3) * 255).astype(np.uint8)
            lab = rs.randint(0, classes, size=(512, 683)).astype(np.uint8)
            cv2.imwrite(ip, img)
            cv2.imwrite(lp, lab)
        lines.append(f"img{i}.jpg lab{i}.png\n")
    with open(list_path, "w") as f:
        f.write("".join(lines))

    value_scale = 255
    mean = [m * value_scale for m in (0.485, 0.456, 0.406)]
    std = [s * value_scale for s in (0.229, 0.224, 0.225)]
    train_transform = transform.Compose([
        transform.RandScale([0.5, 2.0]),
        transform.RandRotate([-10, 10], padding=mean, ignore_label=255),
        transform.RandomGaussianBlur(),
        transform.RandomHorizontalFlip(),
        transform.Crop([crop, crop], crop_type="rand", padding=mean,
                       ignore_label=255),
        transform.ToTensor(),
        transform.Normalize(mean=mean, std=std),
    ])
    wire_name = os.environ.get("PERF_WIRE", "float32")
    wire_uint8 = wire_name == "uint8"
    if wire_uint8:
        # uint8 wire: loader emits raw pixels, the step normalizes on
        # device (mirrors tool/train.py's image_wire_dtype: uint8).
        train_transform = transform.Compose(train_transform.segtransforms[:-1])
    use_native = os.environ.get("PERF_NATIVE", "0") == "1"
    if use_native:
        from semseg_tpu.data import native

        data = native.NativeSemData(
            "train", tmp_root, list_path, crop_h=crop, crop_w=crop,
            mean=mean, std=std, ignore_label=255,
            normalize=not wire_uint8,
        )
    else:
        data = SemData(split="train", data_root=tmp_root,
                       data_list=list_path, transform=train_transform)
    if wire_uint8:
        from semseg_tpu.data import Uint8Wire

        data = Uint8Wire(data)
    workers = int(os.environ.get("PERF_WORKERS", "8"))
    loader = DataLoader(data, batch_size=batch, shuffle=True,
                        num_workers=workers, drop_last=True, seed=1)

    dtype_name = os.environ.get("PERF_LOADER_DTYPE", "bfloat16")
    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    model = PSPNet(layers=50, classes=classes, zoom_factor=8, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    state = create_train_state(
        model, rng, jnp.zeros((batch, crop, crop, 3), jnp.float32)
    )
    step = make_train_step(
        model, classes=classes, ignore_label=255, aux_weight=0.4,
        base_lr=0.01, max_iter=100000, power=0.9, momentum=0.9,
        weight_decay=1e-4, zoom_factor=8, num_replicas=1,
        normalize=(mean, std) if wire_uint8 else None,
    )
    mesh = create_mesh()
    sharding = batch_sharding(mesh)

    wire = {"float32": np.float32, "float16": np.float16,
            "uint8": np.uint8}[wire_name]

    def to_global(images, labels):
        # uint8 label wire format (exact; cast to int32 on device) — same
        # as tool/train.py::to_global; PERF_WIRE mirrors the
        # `image_wire_dtype` config key (float16 = half the image bytes,
        # uint8 = quarter + on-device normalize).
        if labels.dtype != np.uint8:
            labels = labels.astype(np.uint8)
        if images.dtype != wire:
            if wire_uint8:
                images = np.clip(np.rint(images), 0.0, 255.0).astype(np.uint8)
            else:
                images = images.astype(wire)
        return jax.device_put(images, sharding), jax.device_put(labels, sharding)

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from train import _device_prefetch  # the production prefetch iterator

    # Warm-up epoch step (compile)
    def _force(s):
        return float(np.asarray(jax.tree.leaves(s.params)[0]).ravel()[0])

    loader.set_epoch(0)
    it = _device_prefetch(loader, to_global)
    gi, gl = next(it)
    state, _ = step(state, gi, gl)
    _force(state)
    n_steps = 0
    start = time.perf_counter()
    for gi, gl in it:
        state, _ = step(state, gi, gl)
        n_steps += 1
    for epoch in range(1, 3):
        loader.set_epoch(epoch)
        for gi, gl in _device_prefetch(loader, to_global):
            state, _ = step(state, gi, gl)
            n_steps += 1
    _force(state)
    elapsed = time.perf_counter() - start
    _emit(
        "train_e2e_real_loader_pspnet50_ade473",
        dtype=dtype_name, batch=batch, workers=workers, steps=n_steps,
        native=use_native, wire=str(np.dtype(wire)),
        images_per_sec_chip=round(n_steps * batch / elapsed, 2),
        note="includes cv2 decode+augment on this host's core count and "
             "the ~45 MB/s relay upload",
    )


def section_eval():
    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
    from semseg_tpu.models import PSPNet

    # ADE20K-style variable shapes through the bucketed pipeline.
    model = PSPNet(layers=50, classes=150, zoom_factor=8, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=False)
    )(rng, jnp.zeros((1, 473, 473, 3), jnp.float32))
    value_scale = 255
    mean = [m * value_scale for m in (0.485, 0.456, 0.406)]
    std = [s * value_scale for s in (0.229, 0.224, 0.225)]
    rs = np.random.RandomState(0)
    shapes = [(512, 683), (512, 768), (480, 640), (512, 512), (384, 512),
              (512, 683), (512, 768), (480, 640)]
    images = [(rs.rand(h, w, 3) * 255).astype(np.uint8) for h, w in shapes]
    # Bucket-granularity sweep: smaller buckets pad less per image but
    # compile more programs on a shape-diverse dataset (PERF_BUCKETS to
    # override, e.g. "64,128,256").
    buckets = [int(b) for b in
               os.environ.get("PERF_BUCKETS", "128").split(",")]
    for bucket in buckets:
        evaluator = SlidingWindowEvaluator(
            model, variables, classes=150, crop_h=473, crop_w=473,
            mean=mean, std=std, base_size=512, scales=[1.0],
            window_batch=8, mode="device_bucketed", bucket=bucket,
        )
        t0 = time.perf_counter()
        for img in images:  # warm-up / compile all buckets
            evaluator.predict(img)
        compile_s = time.perf_counter() - t0
        # Each capture window is `reps` passes over the image set.
        reps = 2
        bytes0 = evaluator._bucketed.bytes_uploaded

        def run_window():
            start = time.perf_counter()
            pending = []
            for _ in range(reps):
                for img in images:
                    pending.append(evaluator.predict_async(img))
            results = [np.asarray(p) for p in pending]
            return round(len(results) / (time.perf_counter() - start), 2)

        provenance, scored = _windowed_capture(run_window)
        n_windows = len(provenance["windows"])
        upload_kb = round(
            (evaluator._bucketed.bytes_uploaded - bytes0)
            / (n_windows * reps * len(images)) / 1e3, 1)
        _emit(
            "eval_ss_ade20k_shapes_pspnet50_bucketed",
            bucket=bucket,
            images_per_sec_chip=round(float(np.median(scored)), 2),
            **provenance,
            programs=len(evaluator._bucketed._programs),
            shapes=len(set(shapes)),
            warmup_s=round(compile_s, 1),
            # host->device transfer per image in the timed loop (warm
            # caches: repeat sizes upload only the image itself).
            upload_KB_per_image=upload_kb,
        )


def section_eval_ms():
    """Cityscapes 1024x2048 multi-scale (6 scales + flip, the reference's
    ms protocol) sliding-window eval, device mode, cross-image pipelined
    via predict_async (the tool/test.py driver path)."""
    import cv2

    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
    from semseg_tpu.models import PSPNet

    model = PSPNet(layers=50, classes=19, zoom_factor=8, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=False)
    )(rng, jnp.zeros((1, 713, 713, 3), jnp.float32))
    value_scale = 255
    mean = [m * value_scale for m in (0.485, 0.456, 0.406)]
    std = [s * value_scale for s in (0.229, 0.224, 0.225)]
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "figure", "demo", "ADE_val_00001515.jpg")
    bgr = cv2.imread(demo, cv2.IMREAD_COLOR)
    image = cv2.cvtColor(
        cv2.resize(bgr, (2048, 1024), interpolation=cv2.INTER_LINEAR),
        cv2.COLOR_BGR2RGB,
    )
    scales = [float(s) for s in os.environ.get(
        "PERF_MS_SCALES", "0.5,0.75,1.0,1.25,1.5,1.75").split(",")]
    layers = int(os.environ.get("PERF_MS_LAYERS", "50"))
    if layers != 50:
        model = PSPNet(layers=layers, classes=19, zoom_factor=8,
                       dtype=jnp.bfloat16)
        variables = jax.jit(
            lambda r, x: model.init({"params": r, "dropout": r}, x,
                                    train=False)
        )(rng, jnp.zeros((1, 713, 713, 3), jnp.float32))
    evaluator = SlidingWindowEvaluator(
        model, variables, classes=19, crop_h=713, crop_w=713,
        mean=mean, std=std, base_size=2048, scales=scales,
        window_batch=int(os.environ.get("PERF_WINDOW_BATCH", "8")),
        mode="device",
    )
    t0 = time.perf_counter()
    evaluator.predict(image)  # compile all 6 scale programs + combiner
    compile_s = time.perf_counter() - t0
    np.asarray(evaluator.predict_async(image))  # settle the link
    n_iters = int(os.environ.get("PERF_MS_ITERS", "3"))

    def run_window():
        start = time.perf_counter()
        pending = [evaluator.predict_async(image) for _ in range(n_iters)]
        results = [np.asarray(p) for p in pending]
        assert all(r.shape == (1024, 2048) for r in results)
        return round(n_iters / (time.perf_counter() - start), 3)

    provenance, scored = _windowed_capture(run_window)
    _emit(
        f"eval_ms{len(scales)}_cityscapes_pspnet{layers}",
        scales=len(scales),
        images_per_sec_chip=round(float(np.median(scored)), 3),
        **provenance,
        fused_stitch=evaluator.fused_stitch,
        warmup_s=round(compile_s, 1),
    )


def section_eval_psa():
    """Cityscapes 1024x2048 single-scale sliding-window eval, PSANet50
    (705 crop, mask 89^2, fused Pallas attention under the CURRENT
    dispatch rule — resident kernel at hw=2025). Re-measures the
    PARITY.md PSA ss row that was captured round 2 under the old
    dispatch (round-5 verdict item 4)."""
    import cv2

    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
    from semseg_tpu.models import PSANet

    model = PSANet(
        layers=50, classes=19, zoom_factor=8, dtype=jnp.bfloat16,
        psa_type=2, compact=False, shrink_factor=2, mask_h=89, mask_w=89,
        normalization_factor=1.0, psa_softmax=True,
    )
    rng = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda r, x: model.init({"params": r, "dropout": r}, x, train=False)
    )(rng, jnp.zeros((1, 705, 705, 3), jnp.float32))
    value_scale = 255
    mean = [m * value_scale for m in (0.485, 0.456, 0.406)]
    std = [s * value_scale for s in (0.229, 0.224, 0.225)]
    demo = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "figure", "demo", "ADE_val_00001515.jpg")
    bgr = cv2.imread(demo, cv2.IMREAD_COLOR)
    image = cv2.cvtColor(
        cv2.resize(bgr, (2048, 1024), interpolation=cv2.INTER_LINEAR),
        cv2.COLOR_BGR2RGB,
    )
    evaluator = SlidingWindowEvaluator(
        model, variables, classes=19, crop_h=705, crop_w=705,
        mean=mean, std=std, base_size=2048, scales=[1.0],
        window_batch=int(os.environ.get("PERF_WINDOW_BATCH", "8")),
        mode="device",
    )
    t0 = time.perf_counter()
    evaluator.predict(image)
    compile_s = time.perf_counter() - t0
    np.asarray(evaluator.predict_async(image))
    n_iters = int(os.environ.get("PERF_MS_ITERS", "6"))

    def run_window():
        start = time.perf_counter()
        pending = [evaluator.predict_async(image) for _ in range(n_iters)]
        results = [np.asarray(p) for p in pending]
        assert all(r.shape == (1024, 2048) for r in results)
        return round(n_iters / (time.perf_counter() - start), 3)

    provenance, scored = _windowed_capture(run_window)
    _emit(
        "eval_ss_cityscapes_psanet50_705",
        images_per_sec_chip=round(float(np.median(scored)), 3),
        **provenance,
        fused_stitch=evaluator.fused_stitch,
        warmup_s=round(compile_s, 1),
    )


SECTIONS = {"train": section_train, "loader": section_loader,
            "eval": section_eval, "eval_ms": section_eval_ms,
            "eval_psa": section_eval_psa}


def main():
    which = sys.argv[1:] or list(SECTIONS)
    for name in which:
        SECTIONS[name]()


if __name__ == "__main__":
    main()
