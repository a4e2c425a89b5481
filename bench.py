"""Benchmark: end-to-end batched 640px inference throughput on the flagship yolov3.

Pipeline measured: uint8 batches -> normalize -> forward -> fused top-k decode
-> greedy NMS (Pallas), `iters` batches executed inside ONE jitted lax.scan
(so host/tunnel dispatch overhead cannot inflate or deflate the number),
timed until the NMS outputs (the (B, max_det, 6) detections a serving system
actually fetches, in f16 — the reference serves fp16, val.py --half) are
materialized on the host. Speed-task NMS settings conf 0.25 / iou 0.45
(reference val.py:605-609).

Methodology (one JSON line, extra keys document the full story):
 - value / vs_baseline: noise-input run — measures the conv stack; NMS sees
   ~zero candidates (kept as the headline for cross-round comparability).
 - planted_img_s: same pipeline with the detect-head objectness bias raised
   (host-side calibration) until ~150 above-conf candidates/image survive, so
   the per-scale top-k gathers and the Pallas suppression loop do REAL work —
   the honest serving-load number. planted_n_mean = mean detections/image
   after NMS; planted overflow is asserted zero (calibration keeps candidate
   counts inside the top-k budget; the serving path itself falls back to full
   decode on overflow — yolov3_tpu/serve.py).
 - h2d_img_s: double-buffered per-batch jit with the uint8 H2D transfer
   INSIDE the timed region. Through the axon relay (~18 MB/s) this is
   transfer-bound and far below the on-chip number; on a directly-attached
   host PCIe/DMA makes H2D negligible — both facts documented in docs/PERF.md.
 - train_img_s: flagship train-step throughput (bs 128, segmented remat — the
   docs/PERF.md config), N steps in one lax.scan. Driver-visible so train
   regressions are caught, not just inference.

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


def _plant_obj_bias(variables, delta):
    """Return a copy of the (fused, serving) variables with the Detect-head
    objectness bias raised by `delta` — obj channel = a*no + 4 within each
    m{i} 1x1 conv bias (layout contract: models/detect_head.py Detect)."""
    import jax
    import jax.numpy as jnp

    def bump(path, v):
        segs = [str(getattr(p, "key", p)) for p in path]
        if segs[-1] != "bias" or not any(s in segs for s in ("m0", "m1", "m2", "m3", "m4")):
            return v
        b = np.asarray(v, np.float32)
        no = 85  # nc 80 + 5
        na = b.size // no
        b = b.reshape(na, no).copy()
        b[:, 4] += delta
        return jnp.asarray(b.reshape(-1), dtype=v.dtype)

    return jax.tree_util.tree_map_with_path(bump, variables)


def _calibrate_delta(count_fn, variables_fn, target=150.0, scale0_cap=230.0):
    """Find the obj-bias delta giving ~target above-conf candidates/image with
    the busiest scale safely under its top-k budget (no truncation)."""
    lo, hi = 0.0, 16.0
    best = 0.0
    for _ in range(8):
        mid = (lo + hi) / 2
        per_scale = count_fn(variables_fn(mid))  # (nl, B) candidate counts
        total = float(per_scale.sum(0).mean())
        s0max = float(per_scale[0].max())
        if total < target and s0max < scale0_cap:
            best, lo = mid, mid
        else:
            hi = mid
    return best


def main(model_name="yolov3", imgsz=640, batch=128, iters=8, dtype="bfloat16",
         with_planted=True, with_h2d=True, with_train=True):
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
    k_per_scale = (256, 128, 64)

    def one_batch(variables, imgs):
        x = imgs.astype(jdtype) / 255.0
        feats = module.apply(variables, x, train=False)
        boxes, scores, cls_ids, overflow = decode_topk_nhwc(
            feats, anchors, strides, k_per_scale=k_per_scale, conf_thres=0.25,
            with_overflow=True,
        )
        dets, n = nms_from_candidates(
            boxes, scores, cls_ids, iou_thres=0.45, max_det=300, use_pallas=True
        )
        return dets.astype(jnp.float16), n, overflow

    @jax.jit
    def pipeline(variables, all_imgs):  # (iters, B, H, W, 3) uint8
        def body(_, imgs):
            return 0, one_batch(variables, imgs)

        _, (dets, n, overflow) = jax.lax.scan(body, 0, all_imgs)
        return dets, n, overflow

    @jax.jit
    def count_candidates(variables, imgs):
        """Per-scale above-conf candidate counts (nl, B) — planted calibration."""
        x = imgs.astype(jdtype) / 255.0
        feats = module.apply(variables, x, train=False)
        counts = []
        for i, f in enumerate(feats):
            bs = f.shape[0]
            flat = f.reshape(bs, -1, 85)
            obj = jax.nn.sigmoid(flat[..., 4].astype(jnp.float32))
            score = obj * jax.nn.sigmoid(jnp.max(flat[..., 5:], axis=-1).astype(jnp.float32))
            counts.append(jnp.sum((score > 0.25) & (obj > 0.25), axis=1))
        return jnp.stack(counts)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(iters, batch, imgsz, imgsz, 3), dtype=np.uint8)
    imgs = jax.device_put(imgs)

    def timed(variables):
        best = float("inf")
        for _ in range(3):  # best-of-3: the tunnel adds run-to-run noise
            t0 = time.perf_counter()
            dets, n, overflow = pipeline(variables, imgs)
            np.asarray(dets)  # what serving fetches
            n, overflow = np.asarray(n), np.asarray(overflow)
            best = min(best, time.perf_counter() - t0)
        return batch * iters / best, n, overflow

    # warmup / compile (materialize to force real execution through the runtime)
    try:
        dets, n, ov = pipeline(model.variables, imgs)
        np.asarray(n), np.asarray(dets), np.asarray(ov)
    except Exception as e:  # noqa: BLE001 — smaller devices: walk down the batch ladder
        if batch <= 16:
            raise
        nxt = {128: 64, 64: 16}.get(batch, 16)
        print(f"# batch {batch} failed ({type(e).__name__}); retrying at {nxt}", flush=True)
        return main(model_name, imgsz, nxt, iters, dtype, with_planted, with_h2d, with_train)

    imgs_per_s, _, _ = timed(model.variables)
    extra = {}

    if with_planted:
        # raise the obj prior until ~150 candidates/image pass conf 0.25 —
        # same compiled program (variables are inputs), real NMS/top-k work
        probe = imgs[0]
        delta = _calibrate_delta(
            lambda v: np.asarray(count_candidates(v, probe)),
            lambda d: _plant_obj_bias(model.variables, d),
        )
        planted_vars = _plant_obj_bias(model.variables, delta)
        per_scale = np.asarray(count_candidates(planted_vars, probe))
        planted_img_s, n_planted, ov_planted = timed(planted_vars)
        extra.update(
            planted_img_s=round(planted_img_s, 2),
            planted_cand_mean=round(float(per_scale.sum(0).mean()), 1),
            planted_n_mean=round(float(n_planted.mean()), 1),
            planted_overflow_frac=round(float(ov_planted.mean()), 4),
        )

    if with_h2d:
        # H2D-inclusive: per-batch jit, next batch's device_put overlaps the
        # current batch's compute via async dispatch (double buffering)
        h2d_iters = max(2, iters // 4)
        one_jit = jax.jit(one_batch)
        host_batches = [
            rng.integers(0, 255, size=(batch, imgsz, imgsz, 3), dtype=np.uint8)
            for _ in range(h2d_iters)
        ]
        d0, n0, _ = one_jit(model.variables, jax.device_put(host_batches[0]))  # compile
        np.asarray(n0)
        t0 = time.perf_counter()
        outs = []
        for hb in host_batches:
            outs.append(one_jit(model.variables, jax.device_put(hb)))
        for d, n, _ in outs:
            np.asarray(d), np.asarray(n)
        extra["h2d_img_s"] = round(batch * h2d_iters / (time.perf_counter() - t0), 2)

    if with_train:
        try:
            extra["train_img_s"] = round(_train_throughput(model_name, imgsz), 2)
        except Exception as e:  # noqa: BLE001 — never fail the headline metric
            print(f"# train metric skipped: {type(e).__name__}: {e}", flush=True)

    print(
        json.dumps(
            {
                "metric": f"{model_name}_{imgsz}px_e2e_inference_bs{batch}",
                "value": round(imgs_per_s, 2),
                "unit": "images/sec",
                "vs_baseline": round(imgs_per_s / A100_BASELINE_IMGS_PER_S, 3),
                **extra,
            }
        )
    )
    return imgs_per_s


def _train_throughput(model_name="yolov3", imgsz=640, batch=128, iters=4):
    """Flagship train-step img/s at the docs/PERF.md remat config (bs128,
    segmented jax.checkpoint) — the number the 163->182 img/s story is about."""
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.train.loss import LossConfig
    from yolov3_tpu.train.optim import build_optimizer
    from yolov3_tpu.train.step import init_train_state, make_train_step

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16)
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005}
    tx, _, _ = build_optimizer("sgd", model.params, hyp, epochs=300, steps_per_epoch=1000,
                               batch_size=batch, min_warmup_steps=0)
    loss_cfg = LossConfig.from_model(model.spec, hyp)
    step = make_train_step(model.module, loss_cfg, tx, remat=True)
    state = init_train_state(model, tx, loss_cfg=loss_cfg)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (iters, batch, imgsz, imgsz, 3), np.uint8)
    targets = np.zeros((iters, batch, 32, 5), np.float32)
    targets[..., 0, :] = [0, 0.5, 0.5, 0.3, 0.3]
    targets[..., 1, :] = [1, 0.25, 0.25, 0.2, 0.2]
    mask = np.zeros((iters, batch, 32), bool)
    mask[..., :2] = True

    @jax.jit
    def run_steps(state, imgs, targets, mask):
        def body(st, b):
            st, m = step(st, *b)
            return st, m["loss"]

        return jax.lax.scan(body, state, (imgs, targets, mask))

    imgs_d = jax.device_put(imgs)
    _, losses = run_steps(state, imgs_d, targets, mask)  # compile
    np.asarray(losses)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        _, losses = run_steps(state, imgs_d, targets, mask)
        np.asarray(losses)
        best = min(best, time.perf_counter() - t0)
    return batch * iters / best


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--no-planted", action="store_true")
    p.add_argument("--no-h2d", action="store_true")
    p.add_argument("--no-train", action="store_true")
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, a.iters, a.dtype,
         with_planted=not a.no_planted, with_h2d=not a.no_h2d, with_train=not a.no_train)
