"""tools/serve.py HTTP layer (handler contract over a stub batcher — the
compiled-path serving contracts live in tests/test_serving.py)."""

import json
import sys
import threading
import types
import urllib.request
from concurrent.futures import Future
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


def _stub_batcher():
    seen = []

    def submit(img):
        seen.append(np.asarray(img).shape)
        f = Future()
        f.set_result(
            dict(
                boxes=np.asarray([[1.0, 2.0, 3.0, 4.0]], np.float32),
                scores=np.asarray([0.9], np.float32),
                labels=np.asarray([2], np.int32),
            )
        )
        return f

    return types.SimpleNamespace(
        submit=submit,
        stats=lambda: dict(requests=len(seen), batches=1, fill=0.5, batch_size=4),
        seen=seen,
    )


def test_serve_handler_detect_health_stats():
    from serve import make_handler

    batcher = _stub_batcher()
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(batcher, classes=("a", "b", "c"))
    )
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(base + "/healthz", timeout=10) as r:
            assert json.loads(r.read()) == {"ok": True}

        import cv2

        img = np.zeros((32, 48, 3), np.uint8)
        img[8:24, 8:40] = (255, 0, 0)
        ok, enc = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            base + "/detect", data=enc.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=10) as r:
            out = json.loads(r.read())
        assert out["boxes"] == [[1.0, 2.0, 3.0, 4.0]]
        assert out["labels"] == [2] and out["classes"] == ["a", "b", "c"]
        assert batcher.seen == [(32, 48, 3)]  # decoded back to HxWx3

        with urllib.request.urlopen(base + "/stats", timeout=10) as r:
            assert json.loads(r.read())["requests"] == 1

        # undecodable body -> 400, unknown path -> 404 (HTTPError raised)
        bad = urllib.request.Request(
            base + "/detect", data=b"not-an-image", method="POST"
        )
        try:
            urllib.request.urlopen(bad, timeout=10)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(base + "/nope", timeout=10)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # keep-alive hygiene: a POST to an unknown path (body included) must
        # not corrupt the persistent connection for the next request
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=10)
        conn.request("POST", "/wrong", body=b"0123456789")
        r1 = conn.getresponse()
        assert r1.status == 404
        r1.read()
        conn.request("GET", "/healthz")
        r2 = conn.getresponse()
        assert r2.status == 200 and json.loads(r2.read()) == {"ok": True}
        conn.close()
    finally:
        server.shutdown()
        server.server_close()
