"""TPU probe: cut the 25 ms/batch detection-fetch cost (e2e_stage_probe result).

The bench/serving pipeline fetches (B, 300, 6) f16 dets per batch; through the
relay that D2H dominates post-forward time. Two honest levers, both matching
real serving semantics (a server returns only the n valid detections):

  nfirst    fetch n (B,) first (tiny), then fetch dets[:, :, :n.max()] —
            valid rows are score-sorted first, so the slice is lossless.
  perbatch  per-batch jit with async dispatch: fetch batch i's dets while
            batch i+1 computes (does the relay overlap D2H with compute?).
  combo     both.

Run ON TPU: python scripts/fetch_overlap_probe.py --batch 128
Compare against e2e_stage_probe 'full' (scan + full fetch).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(model_name="yolov3", imgsz=640, batch=128, iters=8, planted=False):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detect_head import decode_topk_nhwc
    from yolov3_tpu.models.detection import DetectionModel, cast_variables_for_inference
    from yolov3_tpu.ops.nms import nms_from_candidates

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16)
    model = model.fuse()
    model = model.replace_variables(cast_variables_for_inference(model.variables))
    module = model.serving_module()
    anchors = model.anchors_px
    strides = model.spec.strides
    variables = model.variables

    def one_batch(imgs):
        x = imgs.astype(jnp.bfloat16) / 255.0
        feats = module.apply(variables, x, train=False)
        b, s, c, ov = decode_topk_nhwc(feats, anchors, strides, k_per_scale=(256, 128, 64),
                                       conf_thres=0.25, with_overflow=True)
        dets, n = nms_from_candidates(b, s, c, iou_thres=0.45, max_det=300, use_pallas=True)
        return dets.astype(jnp.float16), n, ov

    @jax.jit
    def pipeline(all_imgs):
        def body(_, imgs):
            return 0, one_batch(imgs)

        _, out = jax.lax.scan(body, 0, all_imgs)
        return out

    batch_jit = jax.jit(one_batch)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 255, size=(iters, batch, imgsz, imgsz, 3), dtype=np.uint8))
    jax.block_until_ready(imgs)

    def t_full():
        dets, n, ov = pipeline(imgs)
        np.asarray(dets), np.asarray(n), np.asarray(ov)

    def t_nfirst():
        dets, n, ov = pipeline(imgs)
        n_h, _ = np.asarray(n), np.asarray(ov)
        nmax = int(n_h.max())
        np.asarray(dets[:, :, :nmax])

    def t_perbatch():
        outs = [batch_jit(imgs[i]) for i in range(iters)]  # async dispatch all
        for dets, n, ov in outs:
            np.asarray(dets), np.asarray(n), np.asarray(ov)

    def t_combo():
        outs = [batch_jit(imgs[i]) for i in range(iters)]
        for dets, n, ov in outs:
            n_h, _ = np.asarray(n), np.asarray(ov)
            np.asarray(dets[:, : int(n_h.max())])

    variants = [("full", t_full), ("nfirst", t_nfirst), ("perbatch", t_perbatch), ("combo", t_combo)]
    for name, fn in variants:
        fn()  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        print(f"{name:9s} {best / iters * 1e3:8.2f} ms/batch  {batch * iters / best:7.1f} img/s",
              flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, a.iters)
