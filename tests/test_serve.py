"""HTTP inference server (`tool/serve.py`) end to end.

Starts the server in-process on a free port with a tiny model, POSTs an
encoded image, and pins the gray-PNG response against calling the same
evaluator directly — the server is a transport around the test driver's
pipeline, so its outputs must be byte-identical to batch evaluation.
"""

import importlib.util
import io
import json
import os
import threading
import urllib.error
import urllib.request

import cv2
import numpy as np
import pytest

from semseg_tpu.config import Config

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        f"tool_{name}", os.path.join(REPO, "tool", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_serve_end_to_end(tmp_path):
    serve = _load_tool("serve")

    colors = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]],
                      np.uint8)
    colors_path = tmp_path / "colors.txt"
    np.savetxt(colors_path, colors, fmt="%d")

    cfg = Config(dict(
        arch="psp", layers=50, classes=4, zoom_factor=8,
        train_h=25, train_w=25, test_h=25, test_w=25,
        base_size=40, scales=[1.0], model_path="",
        allow_random_weights=True, window_batch=4, eval_pipeline="device",
        colors_path=str(colors_path),
    ))
    server = serve.make_server(cfg, port=0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        # health
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok" and health["classes"] == 4

        rs = np.random.RandomState(0)
        bgr = (rs.rand(30, 40, 3) * 255).astype(np.uint8)
        ok, png = cv2.imencode(".png", bgr)
        assert ok

        def post(query=""):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/predict{query}",
                data=png.tobytes(), method="POST",
                headers={"Content-Type": "application/octet-stream"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.read(), r.headers.get("Content-Type")

        body, ctype = post()
        assert ctype == "image/png"
        gray = cv2.imdecode(np.frombuffer(body, np.uint8),
                            cv2.IMREAD_GRAYSCALE)
        assert gray.shape == (30, 40) and gray.max() < 4

        # Transport-only: identical to driving the evaluator directly.
        from semseg_tpu.utils.misc import get_logger

        evaluator = serve.build_evaluator(cfg, get_logger())
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        np.testing.assert_array_equal(gray, evaluator.predict(rgb))

        body, ctype = post("?format=json")
        assert ctype == "application/json"
        payload = json.loads(body)
        assert payload["shape"] == [30, 40]
        assert sum(payload["classes"]) == 30 * 40
        np.testing.assert_array_equal(
            payload["classes"], np.bincount(gray.reshape(-1), minlength=4)
        )

        body, ctype = post("?format=color")
        assert ctype == "image/png"
        from PIL import Image

        pal = Image.open(io.BytesIO(body))
        np.testing.assert_array_equal(np.asarray(pal), gray)

        # error paths: unknown route -> 404; undecodable body -> 400
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=30
            )
        assert e.value.code == 404
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict",
            data=b"not an image", method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400
    finally:
        server.shutdown()
        server.server_close()
        thread.join(timeout=10)
