"""TPU e2e stage attribution for the CURRENT bench pipeline (round 3).

The bs128 bench runs ~170 ms/batch while the forward alone is ~135 ms — this
probe splits the remaining ~35 ms into decode / NMS / D2H-fetch by timing
nested variants of the exact bench program (raw NHWC serving module, bf16
normalize, decode_topk_nhwc + overflow, Pallas NMS, f16 dets fetch):

  fwd     forward only                          (fetch: 1 scalar)
  decode  + decode_topk_nhwc                    (fetch: 1 scalar reduction)
  nms     + pallas NMS                          (fetch: 1 scalar reduction)
  full    bench-exact                           (fetch: f16 dets + n + overflow)

Scalar-reduction fetches force the full computation (nothing DCEs — every
output feeds the reduction) while moving ~0 bytes over the relay, so
full - nms isolates the D2H fetch cost and nms - decode the suppression loop.

Run ON TPU (env as-is): python scripts/e2e_stage_probe.py --batch 128
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(model_name="yolov3", imgsz=640, batch=128, iters=8, s2d=False):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detect_head import decode_topk_nhwc
    from yolov3_tpu.models.detection import DetectionModel, cast_variables_for_inference
    from yolov3_tpu.ops.nms import nms_from_candidates

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16, s2d_stem=s2d)
    model = model.fuse()
    model = model.replace_variables(cast_variables_for_inference(model.variables))
    module = model.serving_module()
    anchors = model.anchors_px
    strides = model.spec.strides
    kps = (256, 128, 64)

    def stage(imgs, upto):
        x = imgs.astype(jnp.bfloat16) / 255.0
        feats = module.apply(model.variables, x, train=False)
        if upto == "fwd":
            return sum(jnp.sum(f.astype(jnp.float32)) for f in feats)
        b, s, c, ov = decode_topk_nhwc(feats, anchors, strides, k_per_scale=kps,
                                       conf_thres=0.25, with_overflow=True)
        if upto == "decode":
            return jnp.sum(b) + jnp.sum(s) + jnp.sum(c) + jnp.sum(ov)
        dets, n = nms_from_candidates(b, s, c, iou_thres=0.45, max_det=300, use_pallas=True)
        if upto == "nms":
            return jnp.sum(dets) + jnp.sum(n) + jnp.sum(ov)
        return dets.astype(jnp.float16), n, ov  # full: bench-exact fetch

    def make(upto):
        @jax.jit
        def run(all_imgs):
            def body(_, imgs):
                return 0, stage(imgs, upto)

            _, out = jax.lax.scan(body, 0, all_imgs)
            return out

        return run

    rng = np.random.default_rng(0)
    imgs = jax.device_put(
        rng.integers(0, 255, size=(iters, batch, imgsz, imgsz, 3), dtype=np.uint8))
    jax.block_until_ready(imgs)

    results = {}
    for upto in ("fwd", "decode", "nms", "full"):
        fn = make(upto)
        out = fn(imgs)  # compile + warm
        jax.tree_util.tree_map(np.asarray, out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(np.asarray, fn(imgs))
            best = min(best, time.perf_counter() - t0)
        per_batch = best / iters * 1e3
        results[upto] = per_batch
        print(f"{upto:7s} {per_batch:8.2f} ms/batch  {batch * iters / best:7.1f} img/s", flush=True)

    print("\ndeltas (ms/batch):", flush=True)
    print(f"  forward          {results['fwd']:.2f}")
    print(f"  decode_topk      {results['decode'] - results['fwd']:+.2f}")
    print(f"  pallas NMS       {results['nms'] - results['decode']:+.2f}")
    print(f"  f16 dets fetch   {results['full'] - results['nms']:+.2f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--s2d", action="store_true")
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, a.iters, a.s2d)
