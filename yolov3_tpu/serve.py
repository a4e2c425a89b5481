"""HTTP inference server + client — the serving-backend analog.

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
GET /health -> model metadata + serving stats.

**Micro-batching** (Triton's dynamic-batching analog, on by default): request
threads enqueue letterboxed frames; a single dispatcher thread coalesces up to
`max_batch` requests (waiting at most `batch_wait_ms` after the first), pads
to a power-of-two bucket, and runs ONE jitted batched call on the fused
bf16 fast path (top-k decode + Pallas NMS — the bench pipeline,
equivalence-tested in tests/test_fused_decode.py). Batched execution is what
makes a TPU serve at chip rate: batch-1 calls leave the MXU ~90% idle.
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from yolov3_tpu.utils.general import LOGGER


def build_batched_infer(model, conf_thres=0.25, iou_thres=0.45, max_det=300, fast=True, mesh=None,
                        k_per_scale=(256, 128, 64), s2d=False):
    """Jitted ((B,H,W,3) uint8) -> ((B,max_det,6) dets, (B,) n).

    fast=True uses the bench serving path: BN-folded bf16 forward + fused
    per-scale top-k decode + Pallas NMS (equivalence-tested against the full
    pipeline). A per-image overflow flag from the decode detects dense scenes
    whose above-conf candidate count exceeds the per-scale top-k budget; those
    batches re-run through the full-decode pipeline (lazily compiled on first
    overflow) instead of silently truncating. fast=False keeps the
    reference-parity full decode + batched NMS always.
    With a `mesh`, the batch dim is sharded over the mesh's data axis —
    data-parallel serving over every chip in the slice (B must be a multiple
    of the device count; the MicroBatcher aligns its buckets to that).
    """
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.models.detect_head import decode_predictions, decode_topk_nhwc
    from yolov3_tpu.models.detection import cast_variables_for_inference
    from yolov3_tpu.ops.nms import batched_nms, nms_from_candidates

    full_model = model
    if fast and s2d:
        # small-batch latency lever: the space-to-depth stem region cuts the
        # yolov3@640 forward 34%/21%/25% at bs1/8/32 on TPU but loses ~6% at
        # bs>=64 where XLA's large-batch conv emitters already avoid the lane
        # padding (docs/PERF.md round-3 traces) — callers enable it only for
        # small max-batch pipelines (see build_pipeline's auto rule). Exact
        # transform, same variables, so the full-decode fallback stays plain.
        from yolov3_tpu.models.detection import DetectionModel

        model = DetectionModel(model.spec, model.variables, model.dtype, model.names,
                               fused=model.fused, s2d_stem=True)
    if fast:
        model = model.fuse()
        model = model.replace_variables(cast_variables_for_inference(model.variables))
        module = model.serving_module()
    else:
        module = model.module
    anchors, strides = model.anchors_px, model.spec.strides
    variables = model.variables
    # Pallas kernels don't lower on CPU (that path keeps the XLA loop); under
    # GSPMD the kernel survives via shard_map over the mesh's data axis
    # (nms_from_candidates spmd_mesh)
    use_pallas = jax.default_backend() == "tpu"

    def fast_fn(imgs_u8):
        x = imgs_u8.astype(jnp.bfloat16) / 255.0
        feats = module.apply(variables, x, train=False)
        boxes, scores, cls_ids, overflow = decode_topk_nhwc(
            feats, anchors, strides, k_per_scale=k_per_scale, conf_thres=conf_thres,
            with_overflow=True,
        )
        dets, n = nms_from_candidates(
            boxes, scores, cls_ids, iou_thres=iou_thres, max_det=max_det,
            use_pallas=use_pallas, spmd_mesh=mesh,
        )
        if mesh is not None:
            # sharded: every output keeps the batch dim so GSPMD can split it
            return dets, n, overflow
        # unsharded: pack n + the overflow-any flag into ONE small int32
        # vector so the host needs a single tiny D2H round trip before the
        # dets-prefix fetch (each relay round trip costs ~mS on a ~20 ms
        # micro-batch budget; 3 fetches -> 2)
        meta = jnp.concatenate([n.astype(jnp.int32), jnp.any(overflow).astype(jnp.int32)[None]])
        return dets, meta

    def full_fn(imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        feats = full_model.module.apply(full_model.variables, x, train=False)
        pred = decode_predictions(feats, full_model.anchors_px, full_model.spec.strides)
        return batched_nms(pred, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det, max_nms=8192)

    if mesh is None:
        jit_kw = {}
    else:
        from yolov3_tpu.parallel.mesh import batch_sharding

        data = batch_sharding(mesh)
        # outputs (dets (B,max_det,6), n (B,), [overflow (B,)]) keep the sharded batch dim
        jit_kw = {"in_shardings": data, "out_shardings": data}

    full_jit = jax.jit(full_fn, **jit_kw)
    if not fast:
        return full_jit
    fast_jit = jax.jit(fast_fn, **jit_kw)

    def infer(imgs_u8):
        if mesh is not None:
            dets, n, overflow = fast_jit(imgs_u8)
            if bool(np.asarray(jnp.any(overflow))):
                LOGGER.info("serve: top-k candidate overflow — falling back to full decode for this batch")
                return full_jit(imgs_u8)
            return dets, n
        dets, meta = fast_jit(imgs_u8)
        meta = np.asarray(meta)  # ONE small fetch: per-image counts + overflow flag
        if meta[-1]:
            # dense scene truncated the top-k: re-run through the exact full
            # pipeline (first overflow pays its compile; correctness over speed)
            LOGGER.info("serve: top-k candidate overflow — falling back to full decode for this batch")
            return full_jit(imgs_u8)
        return dets, meta[:-1]

    infer.fast_jit, infer.full_jit = fast_jit, full_jit
    infer.s2d = bool(s2d)
    return infer


class MicroBatcher:
    """Dynamic request batching: coalesce concurrent predicts into one device call.

    Requests arriving within `batch_wait_ms` of the first queued item are
    stacked (up to `max_batch`), padded to the next power-of-two bucket so XLA
    compiles at most log2(max_batch)+1 programs, executed once, and the rows
    are scattered back to the waiting request threads.
    """

    def __init__(self, infer, max_batch=8, batch_wait_ms=5.0, min_bucket=1):
        assert 1 <= min_bucket <= max_batch
        self.infer = infer
        self.wait_s = batch_wait_ms / 1e3
        self.buckets = []
        b = min_bucket  # sharded serving: smallest bucket = device count
        while b < max_batch:
            self.buckets.append(b)
            b *= 2
        # top bucket: max_batch itself, unless that would break the
        # divisible-by-min_bucket invariant sharded serving needs
        self.buckets.append(max_batch if max_batch % min_bucket == 0 else b)
        self.max_batch = self.buckets[-1]
        self.q = queue.Queue()
        self.calls = 0
        self.requests = 0
        self._thread = threading.Thread(target=self._loop, daemon=True, name="microbatcher")
        self._thread.start()

    def warmup(self, imgsz):
        """Compile every bucket up front (serving must not hitch on first use)."""
        for b in self.buckets:
            z = np.zeros((b, imgsz, imgsz, 3), np.uint8)
            dets, n = self.infer(z)
            np.asarray(dets), np.asarray(n)
            if hasattr(self.infer, "full_jit"):
                # zero images never overflow the fast path, so the dense-scene
                # full-decode fallback would otherwise pay its first (minutes-
                # long remote) compile inside a live request
                dets, n = self.infer.full_jit(z)
                np.asarray(dets), np.asarray(n)

    def submit(self, im):
        """Blocking: letterboxed HWC uint8 -> ((max_det, 6) dets ndarray, n)."""
        slot, ev = {}, threading.Event()
        self.q.put((im, slot, ev))
        ev.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["dets"], slot["n"]

    def _loop(self):
        while True:
            items = [self.q.get()]
            deadline = time.perf_counter() + self.wait_s
            while len(items) < self.max_batch:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    items.append(self.q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                # stack inside the try: a malformed frame (wrong channel count /
                # dtype) must fail its waiters, not kill the dispatcher thread
                bucket = next(b for b in self.buckets if b >= len(items))
                batch = np.stack([it[0] for it in items] + [items[-1][0]] * (bucket - len(items)))
                dets, n = self.infer(batch)
                # n-first fetch: every waiter consumes dets[i, :n[i]] only and
                # NMS rows are score-sorted valid-first, so fetch the counts,
                # then just the valid prefix — the (max_det - n.max()) tail is
                # zero padding (full fetch cost +25 ms/batch at bs128 through
                # a slow D2H link; scripts/fetch_overlap_probe.py)
                n = np.asarray(n)
                dets = np.asarray(dets[:, : int(n.max())])
            except Exception as e:  # noqa: BLE001 — fail every waiter, not the server
                for _, slot, ev in items:
                    slot["err"] = e
                    ev.set()
                continue
            self.calls += 1
            self.requests += len(items)
            for i, (_, slot, ev) in enumerate(items):
                slot["dets"] = dets[i, : int(n[i])].astype(np.float32)
                slot["n"] = int(n[i])
                ev.set()


def build_pipeline(model, imgsz=640, conf_thres=0.25, iou_thres=0.45, max_det=300,
                   max_batch=1, batch_wait_ms=5.0, fast=False, shard=False):
    """Single-image predict fn (letterbox -> [micro-batched] infer -> scale back).

    shard=True: data-parallel serving — the batched call is pjit-sharded over
    every local device; micro-batch buckets align to the device count.
    """
    from yolov3_tpu.data.augment import letterbox
    from yolov3_tpu.ops.boxes import scale_boxes

    mesh = None
    min_bucket = 1
    if shard:
        from yolov3_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        min_bucket = mesh.devices.size
    from yolov3_tpu.models.detection import s2d_eligible

    top_bucket = max(max_batch, min_bucket)
    # auto space-to-depth: a measured small-batch latency win (bs1 -34%,
    # bs8 -21%, bs32 -25% forward; crossover ~bs48 — docs/PERF.md), so engage
    # it exactly when every bucket this pipeline compiles sits below that.
    s2d = fast and top_bucket <= 32 and imgsz % 4 == 0 and s2d_eligible(model.spec)
    infer = build_batched_infer(model, conf_thres, iou_thres, max_det, fast=fast, mesh=mesh,
                                s2d=s2d)
    batcher = MicroBatcher(infer, max_batch=top_bucket,
                           batch_wait_ms=batch_wait_ms, min_bucket=min_bucket)

    def predict(im_bgr):
        h0, w0 = im_bgr.shape[:2]
        im = letterbox(im_bgr, imgsz, auto=False)[0][:, :, ::-1]  # RGB
        dets, _n = batcher.submit(np.ascontiguousarray(im))
        if len(dets):
            dets[:, :4] = np.asarray(scale_boxes((imgsz, imgsz), dets[:, :4], (h0, w0)))
        return dets

    predict.batcher = batcher
    return predict


def serve(weights, host="0.0.0.0", port=8507, imgsz=640, conf_thres=0.25, iou_thres=0.45,
          max_batch=8, batch_wait_ms=5.0, fast=True, shard=False):
    import cv2

    from yolov3_tpu.cli.val import load_weights

    model = load_weights(weights)
    predict = build_pipeline(model, imgsz, conf_thres, iou_thres,
                             max_batch=max_batch, batch_wait_ms=batch_wait_ms, fast=fast,
                             shard=shard)
    names = {int(k): v for k, v in model.names.items()}
    predict.batcher.warmup(imgsz)  # compile every batch bucket up front
    LOGGER.info(
        f"model {model.spec.name} ready; serving on {host}:{port} "
        f"(micro-batching: max_batch={max_batch}, wait={batch_wait_ms}ms, buckets={predict.batcher.buckets})"
    )

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
                b = predict.batcher
                self._json(200, {
                    "model": model.spec.name, "imgsz": imgsz, "names": names, "status": "ok",
                    "batching": {"max_batch": b.max_batch, "device_calls": b.calls,
                                 "requests": b.requests},
                })
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
                assert im.shape[2] == 3, f"expected 3-channel HWC image, got shape {im.shape}"
                im = np.ascontiguousarray(im, dtype=np.uint8)
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
    p.add_argument("--max-batch", type=int, default=8, help="micro-batching: max coalesced requests per device call")
    p.add_argument("--batch-wait-ms", type=float, default=5.0, help="micro-batching: wait after first queued request")
    p.add_argument("--no-fast", action="store_true", help="use the full-parity pipeline instead of the fused bf16 fast path")
    p.add_argument("--shard", action="store_true",
                   help="data-parallel serving: shard each batched call over all local devices")
    a = p.parse_args()
    serve(a.weights, a.host, a.port, a.imgsz, a.conf_thres, a.iou_thres,
          a.max_batch, a.batch_wait_ms, fast=not a.no_fast, shard=a.shard)


if __name__ == "__main__":
    main()
