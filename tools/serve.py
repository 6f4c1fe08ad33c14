#!/usr/bin/env python
"""HTTP detection server over the dynamic-batching inference front-end.

Beyond-reference deployment surface (the reference stops at
``inference_detector``): serves the compiled TPU inference step behind a
minimal threaded HTTP API, with cross-request dynamic batching
(radet_tpu/apis/serving.py::BatchingDetector — requests from concurrent
connections coalesce into full device batches).

    python tools/serve.py configs/bop/r50_ycbv_pbr.py work_dirs/imported \
        --batch 16 --max-latency-ms 5 --port 8080

API:
    POST /detect     body = encoded image (jpg/png)  ->
                     {"boxes": [[x1,y1,x2,y2],...], "scores": [...],
                      "labels": [...], "classes": [names...]}
    GET  /healthz    {"ok": true}
    GET  /stats      serving counters (requests, batches, fill rate)

The HTTP layer is stdlib ``ThreadingHTTPServer``: each connection thread
does its own image decode + preprocessing (apis/serving.py design — the
submitting thread pays the cv2 work) and blocks on its request's future,
so the handler threads are exactly the concurrent-submitter pattern the
batcher is built for.  For >1-core serving hosts, run one process and
scale handler concurrency, not processes: the chip is the shared resource
and one BatchingDetector per chip is the right topology.
"""

import argparse
import json
import os.path as osp
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def make_handler(batcher, classes=(), timeout_s: float = 120.0):
    """HTTP handler class over anything with .submit/.stats (testable with a
    stub; production passes a BatchingDetector)."""

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                return self._json(200, {"ok": True})
            if self.path == "/stats":
                return self._json(200, batcher.stats())
            return self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            # read the body FIRST: under HTTP/1.1 keep-alive an unread body
            # would be parsed as the next request line, corrupting the
            # connection for well-formed follow-ups (review finding)
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            if self.path != "/detect":
                return self._json(404, {"error": f"unknown path {self.path}"})
            try:
                import cv2
                import numpy as np

                img = cv2.imdecode(
                    np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR
                )
                if img is None:
                    return self._json(400, {"error": "could not decode image"})
                img = img[..., ::-1]  # BGR -> RGB (pipeline convention)
                result = batcher.submit(img).result(timeout=timeout_s)
                return self._json(
                    200,
                    {
                        "boxes": result["boxes"].tolist(),
                        "scores": result["scores"].tolist(),
                        "labels": result["labels"].tolist(),
                        "classes": list(classes),
                    },
                )
            except Exception as e:  # surface worker errors as 500s
                return self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *args):  # quiet access log
            pass

    return Handler


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="weights dir (omit for a random-init smoke server)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--max-latency-ms", type=float, default=5.0)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--cfg-options", nargs="*", default=None)
    args = p.parse_args()

    from radet_tpu.apis import init_detector
    from radet_tpu.apis.serving import BatchingDetector
    from radet_tpu.utils import get_root_logger

    logger = get_root_logger()
    detector = init_detector(args.config, args.checkpoint, args.cfg_options)
    if args.checkpoint is None:
        logger.warning("no checkpoint given — serving RANDOM weights (smoke mode)")
    with BatchingDetector(
        detector, batch_size=args.batch, max_latency_ms=args.max_latency_ms
    ) as batcher:
        # pay the one compile before accepting traffic
        import numpy as np

        h, w = detector.input_size
        batcher.detect(np.zeros((h, w, 3), np.uint8))
        logger.info("compiled; serving on http://%s:%d", args.host, args.port)
        server = ThreadingHTTPServer(
            (args.host, args.port), make_handler(batcher, detector.classes)
        )
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            logger.info("shutting down")
        finally:
            server.server_close()


if __name__ == "__main__":
    main()
