"""Inference server: the online-serving counterpart of ``tool/test.py``.

The reference stops at batch evaluation scripts; production serving needs
a long-lived process that keeps the compiled programs warm and answers
per-image requests. This driver loads a checkpoint once, builds the same
jitted sliding-window pipeline the test driver uses (multi-scale, flip
TTA, count-normalized stitching — identical outputs to ``tool/test.py``),
and exposes it over HTTP (stdlib only, no server dependencies):

    POST /predict           body: encoded image (PNG/JPEG/anything cv2
                            decodes, BGR like cv2.imread) →
                            gray PNG class map (image/png)
    POST /predict?format=color   → palette-color PNG (needs colors_path)
    POST /predict?format=json    → {"shape", "classes" histogram}
    GET  /healthz           liveness + model/config echo

Dispatch onto the chip is serialized with a lock (one compiled pipeline;
concurrent requests queue — JAX's async dispatch already pipelines
upload/compute/readback inside a request's window batches). Scales /
crop / flip come from the TEST section of the config, exactly like the
batch tester.

Usage:
    python tool/serve.py --config config/cityscapes/cityscapes_pspnet50.yaml \
        model_path exp/.../train_epoch_200.ckpt [serve_port 8080]

Smoke (random weights, CPU):
    python tool/serve.py --config ... allow_random_weights True serve_port 0
"""

import io
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_evaluator(cfg, logger):
    """Model + checkpoint + sliding-window pipeline, as tool/test.py."""
    import jax
    import jax.numpy as jnp

    from semseg_tpu.engine.checkpoint import load_model_variables
    from semseg_tpu.engine.evaluator import SlidingWindowEvaluator
    from semseg_tpu.models.build import build_model, validate_arch
    from semseg_tpu.engine.trainer import create_train_state

    validate_arch(cfg)
    model, updates = build_model(cfg, dtype=jnp.float32)
    for k, v in updates.items():
        cfg[k] = v
    if os.path.isfile(cfg.model_path) or os.path.isdir(cfg.model_path):
        variables = jax.tree.map(
            jnp.asarray,
            load_model_variables(cfg.model_path, cfg.arch, cfg.layers),
        )
        logger.info("=> loaded checkpoint '%s'", cfg.model_path)
    elif cfg.get("allow_random_weights"):
        state = create_train_state(
            model, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.test_h, cfg.test_w, 3), jnp.float32),
        )
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logger.warning("serving RANDOM weights (allow_random_weights)")
    else:
        raise RuntimeError(f"=> no checkpoint found at '{cfg.model_path}'")

    value_scale = 255
    mean = [0.485 * value_scale, 0.456 * value_scale, 0.406 * value_scale]
    std = [0.229 * value_scale, 0.224 * value_scale, 0.225 * value_scale]
    return SlidingWindowEvaluator(
        model, variables, classes=cfg.classes,
        crop_h=cfg.test_h, crop_w=cfg.test_w, mean=mean, std=std,
        base_size=cfg.base_size, scales=cfg.scales,
        window_batch=cfg.get("window_batch") or 16,
        mode=cfg.get("eval_pipeline") or "device_bucketed",
        bucket=cfg.get("eval_bucket") or 128,
    )


def make_server(cfg, port=None):
    """Build (and return, unstarted) the HTTP server; ``.serve_forever()``
    to run. Returned object has ``.server_address`` for tests."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from semseg_tpu.utils.misc import get_logger

    logger = get_logger()
    evaluator = build_evaluator(cfg, logger)
    lock = threading.Lock()
    colors = None
    if cfg.get("colors_path") and os.path.isfile(cfg.colors_path):
        colors = np.loadtxt(cfg.colors_path).astype("uint8")

    import cv2

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through our logger
            logger.info("serve: " + fmt, *args)

        def _send(self, code, body, ctype):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.split("?")[0] != "/healthz":
                return self._send(404, b"not found", "text/plain")
            info = json.dumps({
                "status": "ok", "arch": cfg.arch, "layers": cfg.layers,
                "classes": cfg.classes, "scales": list(cfg.scales),
                "crop": [cfg.test_h, cfg.test_w],
            }).encode()
            self._send(200, info, "application/json")

        def do_POST(self):
            path, _, query = self.path.partition("?")
            if path != "/predict":
                return self._send(404, b"not found", "text/plain")
            fmt = "gray"
            for part in query.split("&"):
                if part.startswith("format="):
                    fmt = part.split("=", 1)[1]
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            bgr = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
            if bgr is None:
                return self._send(400, b"undecodable image", "text/plain")
            # BGR -> RGB (util/dataset.py:61-66 semantics). Stays uint8:
            # the device pipeline casts + normalizes on-chip, so the
            # upload ships a quarter of the float32 bytes (same wire the
            # benchmark and the uint8-wire test driver use).
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            with lock:
                gray = evaluator.predict(rgb)
            if fmt == "json":
                hist = np.bincount(gray.reshape(-1),
                                   minlength=cfg.classes).tolist()
                body = json.dumps(
                    {"shape": list(gray.shape), "classes": hist}
                ).encode()
                return self._send(200, body, "application/json")
            if fmt == "color":
                if colors is None:
                    return self._send(400, b"no colors_path configured",
                                      "text/plain")
                from semseg_tpu.utils.misc import colorize

                buf = io.BytesIO()
                colorize(gray, colors).save(buf, format="PNG")
                return self._send(200, buf.getvalue(), "image/png")
            ok, png = cv2.imencode(".png", gray)
            assert ok
            return self._send(200, png.tobytes(), "image/png")

    port = cfg.get("serve_port") if port is None else port
    server = ThreadingHTTPServer(("127.0.0.1", int(port or 0)), Handler)
    logger.info("serving on http://127.0.0.1:%d (scales=%s, crop=%dx%d)",
                server.server_address[1], list(cfg.scales),
                cfg.test_h, cfg.test_w)
    return server


def main():
    from semseg_tpu.config import parse_config_args

    cfg = parse_config_args(
        default_config="config/cityscapes/cityscapes_pspnet50.yaml"
    )
    make_server(cfg).serve_forever()


if __name__ == "__main__":
    main()
