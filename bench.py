"""Benchmark: end-to-end batched 640px inference throughput on the flagship yolov3.

Pipeline measured: uint8 batches -> normalize -> forward -> fused top-k decode
-> greedy NMS (Pallas), `iters` batches executed inside ONE jitted lax.scan
(so host/tunnel dispatch overhead cannot inflate or deflate the number),
timed until the NMS outputs (the (B, max_det, 6) detections a serving system
actually fetches, in f16 — the reference serves fp16, val.py --half) are
materialized on the host. Speed-task NMS settings conf 0.25 / iou 0.45
(reference val.py:605-609).

Fast-path design (all results equivalence-tested against the full pipeline
in tests/test_fused_decode.py):
 - raw NHWC Detect head: no f32 transpose of the head outputs is materialized
   (~0.5 GB/batch saved at bs64);
 - per-scale top-k candidate extraction fused into one pass over the head
   outputs; only gathered candidates are decoded;
 - bf16 normalize front (uint8 -> bf16 /255) feeding the bf16 conv stack.

Baseline context (BASELINE.md): the reference snapshot publishes no benchmark
table; the driver's north star is >=3x A100 images/s/chip. vs_baseline is
anchored to 200 img/s (typical A100 fp16 batched yolov3@640 end-to-end), so
vs_baseline >= 3.0 meets the target.
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_BASELINE_IMGS_PER_S = 200.0


def main(model_name="yolov3", imgsz=640, batch=128, iters=8, dtype="bfloat16"):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detect_head import decode_topk_nhwc
    from yolov3_tpu.models.detection import DetectionModel, cast_variables_for_inference
    from yolov3_tpu.ops.nms import nms_from_candidates

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jdtype)
    model = model.fuse()  # fold BN into conv weights (inference form)
    if dtype == "bfloat16":  # cast once — not per scan iteration
        model = model.replace_variables(cast_variables_for_inference(model.variables))
    module = model.serving_module()  # raw NHWC Detect head
    anchors = model.anchors_px
    strides = model.spec.strides

    @jax.jit
    def pipeline(variables, all_imgs):  # (iters, B, H, W, 3) uint8
        def body(_, imgs):
            x = imgs.astype(jdtype) / 255.0
            feats = module.apply(variables, x, train=False)
            boxes, scores, cls_ids = decode_topk_nhwc(
                feats, anchors, strides, k_per_scale=(256, 128, 64), conf_thres=0.25
            )
            dets, n = nms_from_candidates(
                boxes, scores, cls_ids, iou_thres=0.45, max_det=300, use_pallas=True
            )
            return 0, (dets.astype(jnp.float16), n)

        _, (dets, n) = jax.lax.scan(body, 0, all_imgs)
        return dets, n

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(iters, batch, imgsz, imgsz, 3), dtype=np.uint8)
    imgs = jax.device_put(imgs)

    # warmup / compile (materialize to force real execution through the runtime)
    try:
        dets, n = pipeline(model.variables, imgs)
        np.asarray(n)
        np.asarray(dets)
    except Exception as e:  # noqa: BLE001 — smaller devices: walk down the batch ladder
        if batch <= 16:
            raise
        nxt = {128: 64, 64: 16}.get(batch, 16)
        print(f"# batch {batch} failed ({type(e).__name__}); retrying at {nxt}", flush=True)
        return main(model_name, imgsz, nxt, iters, dtype)

    best = float("inf")
    for _ in range(3):  # best-of-3: the tunnel adds run-to-run noise
        t0 = time.perf_counter()
        dets, n = pipeline(model.variables, imgs)
        np.asarray(dets)  # what serving fetches
        np.asarray(n)
        best = min(best, time.perf_counter() - t0)

    imgs_per_s = batch * iters / best
    print(
        json.dumps(
            {
                "metric": f"{model_name}_{imgsz}px_e2e_inference_bs{batch}",
                "value": round(imgs_per_s, 2),
                "unit": "images/sec",
                "vs_baseline": round(imgs_per_s / A100_BASELINE_IMGS_PER_S, 3),
            }
        )
    )
    return imgs_per_s


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, a.iters, a.dtype)
