"""TPU perf probe: break the bench pipeline into stages to find the bottleneck.

Run ON TPU (env as-is). Times each variant with the bench methodology
(N iters inside one lax.scan, best-of-3, timed until a host fetch).

Variants:
  fwd        — forward only, fetch a tiny slice
  old        — forward + full decode + batched_nms (round-1 bench), fetch n only
  old+fetch  — same but fetch dets too (round-1 bench exact)
  fused      — forward + decode_topk_candidates + nms_from_candidates, fetch dets+n
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(model_name="yolov3", imgsz=640, batch=64, iters=8, variants=("fwd", "old", "old+fetch", "fused")):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detect_head import decode_predictions, decode_topk_candidates
    from yolov3_tpu.models.detection import DetectionModel, cast_variables_for_inference
    from yolov3_tpu.ops.nms import batched_nms, nms_from_candidates

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16)
    model = model.fuse()
    model = model.replace_variables(cast_variables_for_inference(model.variables))
    module = model.module
    anchors = model.anchors_px
    strides = model.spec.strides

    def fwd_only(variables, all_imgs):
        def body(_, imgs):
            x = imgs.astype(jnp.float32) / 255.0
            feats = module.apply(variables, x, train=False)
            return 0, feats[0][:, 0, 0, 0, :2]  # tiny probe output

        _, probe = jax.lax.scan(body, 0, all_imgs)
        return probe

    def old_pipe(variables, all_imgs):
        def body(_, imgs):
            x = imgs.astype(jnp.float32) / 255.0
            feats = module.apply(variables, x, train=False)
            pred = decode_predictions(feats, anchors, strides)
            dets, n = batched_nms(pred, conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=4096, use_pallas=True)
            return 0, (dets, n)

        _, (dets, n) = jax.lax.scan(body, 0, all_imgs)
        return dets, n

    def fused_pipe(variables, all_imgs):
        def body(_, imgs):
            x = imgs.astype(jnp.float32) / 255.0
            feats = module.apply(variables, x, train=False)
            boxes, scores, cls_ids = decode_topk_candidates(feats, anchors, strides, (256, 128, 64), 0.25)
            dets, n = nms_from_candidates(boxes, scores, cls_ids, 0.45, 300, use_pallas=True)
            return 0, (dets, n)

        _, (dets, n) = jax.lax.scan(body, 0, all_imgs)
        return dets, n

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(iters, batch, imgsz, imgsz, 3), dtype=np.uint8)
    t0 = time.perf_counter()
    imgs = jax.device_put(imgs)
    jax.block_until_ready(imgs)
    print(f"h2d {imgs.nbytes / 1e6:.0f}MB: {time.perf_counter() - t0:.2f}s", flush=True)

    def timeit(name, fn, fetch):
        t0 = time.perf_counter()
        out = fn(model.variables, imgs)
        fetch(out)
        print(f"{name}: compile+run {time.perf_counter() - t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(model.variables, imgs)
            fetch(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: best {best * 1e3:.1f}ms = {batch * iters / best:.1f} img/s", flush=True)
        return best

    jfwd = jax.jit(fwd_only)
    jold = jax.jit(old_pipe)
    jfused = jax.jit(fused_pipe)

    if "fwd" in variants:
        timeit("fwd-only", jfwd, lambda o: np.asarray(o))
    if "old" in variants:
        timeit("old(n-only-fetch)", jold, lambda o: np.asarray(o[1]))
    if "old+fetch" in variants:
        timeit("old+dets-fetch", jold, lambda o: (np.asarray(o[0]), np.asarray(o[1])))
    if "fused" in variants:
        timeit("fused+dets-fetch", jfused, lambda o: (np.asarray(o[0]), np.asarray(o[1])))
        timeit("fused(n-only-fetch)", jfused, lambda o: np.asarray(o[1]))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--variants", default="fwd,old,old+fetch,fused")
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, a.iters, tuple(a.variants.split(",")))
