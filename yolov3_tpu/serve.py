"""Minimal HTTP inference server + client — the serving-backend analog.

The reference integrates a Triton gRPC/HTTP client (utils/triton.py:11-84)
for remote inference. The TPU-native equivalent: serve the jitted
forward+decode+NMS pipeline behind a stdlib HTTP endpoint, and provide a
`RemoteModel` client with the same call shape as a local model.

    # server
    python -m yolov3_tpu.serve --weights runs/train/exp/weights/best --port 8507

    # client
    from yolov3_tpu.serve import RemoteModel
    model = RemoteModel("http://localhost:8507")
    dets = model(image_ndarray)     # list of (n, 6) arrays

Protocol: POST /predict with a JPEG/PNG body (or raw npy) -> JSON
{detections: [[x1,y1,x2,y2,conf,cls], ...], names: {...}, speed_ms: float}.
GET /health -> model metadata.
"""

from __future__ import annotations

import io
import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from yolov3_tpu.utils.general import LOGGER


def build_pipeline(model, imgsz=640, conf_thres=0.25, iou_thres=0.45, max_det=300):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.data.augment import letterbox
    from yolov3_tpu.models.detect_head import decode_predictions
    from yolov3_tpu.ops.boxes import scale_boxes
    from yolov3_tpu.ops.nms import batched_nms

    module, anchors, strides = model.module, model.anchors_px, model.spec.strides

    @jax.jit
    def infer(variables, imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        feats = module.apply(variables, x, train=False)
        pred = decode_predictions(feats, anchors, strides)
        return batched_nms(pred, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det, max_nms=8192)

    def predict(im_bgr):
        h0, w0 = im_bgr.shape[:2]
        im = letterbox(im_bgr, imgsz, auto=False)[0][:, :, ::-1]  # RGB
        dets, n = infer(model.variables, np.ascontiguousarray(im)[None])
        dets = np.asarray(dets)[0, : int(np.asarray(n)[0])]
        if len(dets):
            dets[:, :4] = np.asarray(scale_boxes((imgsz, imgsz), dets[:, :4], (h0, w0)))
        return dets

    return predict


def serve(weights, host="0.0.0.0", port=8507, imgsz=640, conf_thres=0.25, iou_thres=0.45):
    import cv2

    from yolov3_tpu.cli.val import load_weights

    model = load_weights(weights)
    predict = build_pipeline(model, imgsz, conf_thres, iou_thres)
    names = {int(k): v for k, v in model.names.items()}
    # warmup compile
    predict(np.zeros((imgsz, imgsz, 3), np.uint8))
    LOGGER.info(f"model {model.spec.name} ready; serving on {host}:{port}")

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                self._json(200, {"model": model.spec.name, "imgsz": imgsz, "names": names, "status": "ok"})
            else:
                self._json(404, {"error": "unknown path; use GET /health or POST /predict"})

        def do_POST(self):
            if self.path != "/predict":
                return self._json(404, {"error": "POST /predict only"})
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            try:
                if self.headers.get("Content-Type") == "application/x-npy":
                    im = np.load(io.BytesIO(raw), allow_pickle=False)
                else:
                    im = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
                assert im is not None and im.ndim == 3, "could not decode image"
            except Exception as e:  # noqa: BLE001
                return self._json(400, {"error": f"bad image payload: {e}"})
            t0 = time.perf_counter()
            dets = predict(im)
            self._json(
                200,
                {
                    "detections": [[round(float(v), 4) for v in row] for row in dets],
                    "names": names,
                    "speed_ms": round((time.perf_counter() - t0) * 1e3, 2),
                },
            )

    ThreadingHTTPServer((host, port), Handler).serve_forever()


class RemoteModel:
    """HTTP client with a local-model call shape (TritonRemoteModel analog)."""

    def __init__(self, url):
        self.url = url.rstrip("/")
        import urllib.request

        with urllib.request.urlopen(f"{self.url}/health", timeout=10) as r:
            meta = json.loads(r.read())
        self.names = {int(k): v for k, v in meta["names"].items()}
        self.imgsz = meta["imgsz"]

    def __call__(self, im):
        """im: HWC BGR uint8 ndarray -> (n, 6) detections array."""
        import urllib.request

        buf = io.BytesIO()
        np.save(buf, np.ascontiguousarray(im), allow_pickle=False)
        req = urllib.request.Request(
            f"{self.url}/predict", data=buf.getvalue(), headers={"Content-Type": "application/x-npy"}
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        return np.array(out["detections"], np.float32).reshape(-1, 6)


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="yolov3-tiny")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8507)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.25)
    p.add_argument("--iou-thres", type=float, default=0.45)
    a = p.parse_args()
    serve(a.weights, a.host, a.port, a.imgsz, a.conf_thres, a.iou_thres)


if __name__ == "__main__":
    main()
