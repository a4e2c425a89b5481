"""Benchmark: end-to-end batched 640px inference throughput on the flagship yolov3.

Pipeline measured: uint8 batches -> normalize -> forward -> decode -> NMS,
`iters` batches executed inside ONE jitted lax.scan (so host/tunnel dispatch
overhead cannot inflate or deflate the number), timed until the NMS outputs
(the small (B, max_det, 6) tensors a serving system actually fetches) are
materialized on the host. Speed-task NMS settings conf 0.25 / iou 0.45
(reference val.py:605-609).

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


def main(model_name="yolov3", imgsz=640, batch=64, iters=8, dtype="bfloat16", max_nms=4096):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detect_head import decode_predictions
    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.ops.nms import batched_nms

    from yolov3_tpu.models.detection import cast_variables_for_inference

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jdtype)
    model = model.fuse()  # fold BN into conv weights (inference form)
    if dtype == "bfloat16":  # cast once — not per scan iteration
        model = model.replace_variables(cast_variables_for_inference(model.variables))
    module = model.module
    anchors = model.anchors_px
    strides = model.spec.strides

    @jax.jit
    def pipeline(variables, all_imgs):  # (iters, B, H, W, 3) uint8
        def body(_, imgs):
            x = imgs.astype(jnp.float32) / 255.0
            feats = module.apply(variables, x, train=False)
            pred = decode_predictions(feats, anchors, strides)
            dets, n = batched_nms(
                pred, conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=max_nms, use_pallas=True
            )
            return 0, (dets, n)

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
    except Exception as e:  # noqa: BLE001 — smaller devices: retry at batch 16
        if batch <= 16:
            raise
        print(f"# batch {batch} failed ({type(e).__name__}); retrying at 16", flush=True)
        return main(model_name, imgsz, 16, iters, dtype, max_nms)

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
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, a.iters, a.dtype)
