"""Benchmark: end-to-end batched 640px inference throughput on the flagship yolov3.

Pipeline measured: uint8 batches -> normalize -> forward -> fused top-k decode
-> greedy NMS (Pallas), `iters` batches executed inside ONE jitted lax.scan
(so host/tunnel dispatch overhead cannot inflate or deflate the number),
timed until a checksum over every NMS output row plus the per-image counts
(the n-first protocol's first fetch, serve.py) materialize on the host — a
few bytes of D2H that force the whole program to finish. The detection-row
fetch itself (dets[..., :n.max(), :] in f16, the reference serves fp16 per
val.py --half) is measured separately and reported as planted_fetch_mb +
planted_fetch_relay_s: through the dev relay (~15-18 MB/s, minute-scale
congestion swings) that leg is pure tunnel time — it moved the otherwise
identical headline 742 -> 651 img/s between two sessions — while on a
co-located serving host the same bytes ride PCIe/DMA and cost microseconds.
Speed-task NMS settings conf 0.25 / iou 0.45 (reference val.py:605-609).

Methodology (one JSON line, extra keys document the full story):
 - value / vs_baseline (== planted_img_s): the pipeline with the detect-head
   objectness bias raised (host-side calibration) until ~150 above-conf
   candidates/image survive, so the per-scale top-k gathers and the Pallas
   suppression loop do REAL work — the honest serving-load headline
   (promoted round 4; rounds 1-3 headlined the noise run).
 - value_noise: noise-input run — measures the conv stack; NMS sees ~zero
   candidates (kept for cross-round comparability with BENCH_r01..r03).
   planted_n_mean = mean detections/image
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
 - latency_bs1_ms: single-image e2e device latency on the space-to-depth
   serving model (the BASELINE.md p50-latency north star; serve.py
   auto-selects the s2d stem for small-bucket pipelines — docs/PERF.md
   round-3 trace work: bs1 forward -34% vs the plain layout).

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


def _plant_detections(variables, obj_deltas, obj_gains=None, cls_bump=12.0):
    """Return a copy of the (fused, serving) variables with the Detect head
    biased to emit real candidates:
      - per-scale objectness bias shifted by obj_deltas[i];
      - per-scale objectness KERNEL column scaled by obj_gains[i] — the
        random-init obj logit spread is ~0.01, so without amplification any
        bias shift flips every cell at once instead of a selectable tail;
      - every class bias raised by cls_bump (the class prior init log(0.6/79)
        otherwise caps conf = obj*cls_max at ~0.008 regardless of obj).
    Channel layout contract a*no + o per models/detect_head.py Detect."""
    import jax
    import jax.numpy as jnp

    no = 85  # nc 80 + 5

    def bump(path, v):
        segs = [str(getattr(p, "key", p)) for p in path]
        if not any(f"m{i}" in segs for i in range(5)):
            return v
        scale_i = next(i for i in range(5) if f"m{i}" in segs)
        if segs[-1] == "bias":
            b = np.asarray(v, np.float32)
            na = b.size // no
            b = b.reshape(na, no).copy()
            b[:, 4] += float(obj_deltas[scale_i])
            b[:, 5:] += cls_bump
            return jnp.asarray(b.reshape(-1), dtype=v.dtype)
        if segs[-1] == "kernel" and obj_gains is not None:
            k = np.asarray(v, np.float32)  # (1, 1, cin, na*no)
            na = k.shape[-1] // no
            k = k.copy()
            for a in range(na):
                k[..., a * no + 4] *= float(obj_gains[scale_i])
            return jnp.asarray(k, dtype=v.dtype)
        return v

    return jax.tree_util.tree_map_with_path(bump, variables)


def main(model_name="yolov3", imgsz=640, batch=128, iters=8, dtype="bfloat16",
         with_planted=True, with_h2d=True, with_train=True, s2d_stem=False,
         with_latency=True, _carry_extra=None):
    extra = dict(_carry_extra or {})
    if with_train:
        # the train step at bs128 needs nearly the whole HBM: run it in its own
        # process BEFORE this one claims the chip with inference buffers
        import subprocess
        import sys

        try:
            r = subprocess.run(
                [sys.executable, __file__, "--train-only", "--model", model_name,
                 "--imgsz", str(imgsz), "--dtype", dtype],
                capture_output=True, text=True, timeout=3600,
            )
            out_txt, err_txt = r.stdout, r.stderr
        except subprocess.TimeoutExpired as e:  # keep the inference headline alive
            out_txt = (e.stdout or b"").decode() if isinstance(e.stdout, bytes) else (e.stdout or "")
            err_txt = "train subprocess timed out after 3600s"
        for line in reversed(out_txt.strip().splitlines()):
            try:
                extra["train_img_s"] = json.loads(line)["train_img_s"]
                break
            except (json.JSONDecodeError, KeyError):
                continue
        if "train_img_s" not in extra:
            print(f"# train metric unavailable: {out_txt[-300:]} {err_txt[-300:]}", flush=True)

    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detect_head import decode_topk_nhwc
    from yolov3_tpu.models.detection import DetectionModel, cast_variables_for_inference
    from yolov3_tpu.ops.nms import nms_from_candidates

    jdtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jdtype, s2d_stem=s2d_stem)
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
        # checksum over every det row: materializing this scalar forces the
        # full pipeline to execute while keeping the timed D2H a few bytes
        # (CLAUDE.md: sync on a SMALL output — the dev relay is ~15-18 MB/s
        # with minute-scale congestion swings, so timing an MB-scale fetch
        # measures the tunnel, not the chip: identical planted runs measured
        # 742 then 651 img/s across sessions before this was decoupled)
        chk = jnp.sum(dets.astype(jnp.float32))
        return dets, n, overflow, chk

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
        dets = n = overflow = None
        for _ in range(3):  # best-of-3: the tunnel adds run-to-run noise
            t0 = time.perf_counter()
            dets, n, overflow, chk = pipeline(variables, imgs)
            np.asarray(chk)  # sync: chk is downstream of every det row
            n = np.asarray(n)  # n-first protocol's first (tiny) fetch
            best = min(best, time.perf_counter() - t0)
        overflow = np.asarray(overflow)
        # The detection-row fetch (n-first protocol, serve.py: NMS rows are
        # score-sorted valid-first so dets[..., :n.max(), :] is every real
        # detection) is measured SEPARATELY and reported as bytes + seconds:
        # through the dev relay it is pure tunnel time whose congestion moved
        # the headline 12% between identical runs; on a co-located serving
        # host the same bytes ride PCIe/DMA and cost microseconds.
        t0 = time.perf_counter()
        rows = np.asarray(dets[:, :, : max(int(n.max()), 1)])
        fetch_s = time.perf_counter() - t0
        return batch * iters / best, n, overflow, rows.nbytes, fetch_s

    # warmup / compile (materialize to force real execution through the runtime)
    try:
        dets, n, ov, chk = pipeline(model.variables, imgs)
        np.asarray(n), np.asarray(chk), np.asarray(ov)
    except Exception as e:  # noqa: BLE001 — smaller devices: walk down the batch ladder
        if batch <= 16:
            raise
        nxt = {128: 64, 64: 16}.get(batch, 16)
        print(f"# batch {batch} failed ({type(e).__name__}); retrying at {nxt}", flush=True)
        del imgs  # drop the failed run's device image buffer before retrying
        # preserve every flag; the train subprocess already ran (don't pay it twice)
        return main(model_name, imgsz, nxt, iters, dtype, with_planted=with_planted,
                    with_h2d=with_h2d, with_train=False, s2d_stem=s2d_stem,
                    with_latency=with_latency, _carry_extra=extra)

    imgs_per_s, _, _, _, _ = timed(model.variables)

    if with_planted:
        # quantile calibration: with class biases saturated (cls_sig ~ 1,
        # score ~ obj_sig), shifting scale i's obj bias by (thr - q_i) puts
        # exactly the top target_i cells/image above conf 0.25 — a bias-only
        # shift can't use a count bisection because random-init logit spread
        # is so small the transition is all-cells-or-none
        targets = (112.0, 28.0, 10.0)  # per-scale candidates/img (cap 256/128/64)
        probe = imgs[0][:8]

        @jax.jit
        def probe_stats(variables, p_imgs):
            """Per-scale (mean, std, tail-quantile) of the obj logits."""
            x = p_imgs.astype(jdtype) / 255.0
            feats = module.apply(variables, x, train=False)
            out = []
            for i, f in enumerate(feats):
                flat = f.reshape(f.shape[0], -1, 85)
                obj = flat[..., 4].astype(jnp.float32).reshape(-1)
                frac = targets[i] / flat.shape[1]
                out.append(jnp.stack([jnp.mean(obj), jnp.std(obj),
                                      jnp.percentile(obj, 100.0 * (1.0 - frac))]))
            return jnp.stack(out)  # (nl, 3)

        # pass 1: measure spread, choose gains that widen it to ~2.0
        base = _plant_detections(model.variables, (0.0,) * 3)
        st = np.asarray(probe_stats(base, probe))
        gains = np.clip(2.0 / np.maximum(st[:, 1], 1e-8), 1.0, 1e6)
        # pass 2: re-probe with gains applied, shift each scale's bias so the
        # top target_i cells/image sit above the conf-0.25 logit crossing
        gained = _plant_detections(model.variables, (0.0,) * 3, obj_gains=gains)
        qs = np.asarray(probe_stats(gained, probe))[:, 2]
        thr_logit = float(np.log(0.25 / 0.75)) + 0.05
        deltas = thr_logit - qs
        planted_vars = _plant_detections(model.variables, deltas, obj_gains=gains)
        per_scale = np.asarray(count_candidates(planted_vars, probe))
        # budget guard: the quantile aim assumes a tie-free tail, but maxpool
        # heads (yolov3-spp's SPP block) produce exactly-tied obj logits, so a
        # quantile cut can pass several times the target and overflow the
        # per-scale top-k budget (measured: spp overflow_frac 1.0). Back the
        # bias off any scale whose worst probe image nears its cap — the
        # already-jitted count probe makes each iteration one cheap execution.
        caps = np.array([k_per_scale[min(i, len(k_per_scale) - 1)] for i in range(per_scale.shape[0])])
        for _ in range(6):
            worst = per_scale.max(axis=1)
            over = worst > 0.9 * caps
            if not over.any():
                break
            deltas = deltas - np.where(over, 0.35, 0.0)
            planted_vars = _plant_detections(model.variables, deltas, obj_gains=gains)
            per_scale = np.asarray(count_candidates(planted_vars, probe))
        planted_img_s, n_planted, ov_planted, fetch_b, fetch_s = timed(planted_vars)
        # the loaded figure is the headline (VERDICT r3 #5); the noise run
        # stays as value_noise for cross-round comparability with r01..r03
        extra.update(
            value_noise=round(imgs_per_s, 2),
            planted_img_s=round(planted_img_s, 2),
            planted_cand_mean=round(float(per_scale.sum(0).mean()), 1),
            planted_n_mean=round(float(n_planted.mean()), 1),
            planted_overflow_frac=round(float(ov_planted.mean()), 4),
            planted_fetch_mb=round(fetch_b / 2**20, 2),
            planted_fetch_relay_s=round(fetch_s, 3),
        )
        imgs_per_s = planted_img_s

    if with_latency:
        # p50-style serving latency (BASELINE.md north-star): bs1 e2e device
        # time (normalize -> forward -> decode -> NMS) on the s2d-stem serving
        # model — the small-batch regime where the space-to-depth region wins
        # 34% of forward (docs/PERF.md); serve.py auto-selects it there too.
        from yolov3_tpu.models.detection import s2d_eligible

        lat_module = module
        lat_vars = model.variables
        if s2d_eligible(model.spec) and not s2d_stem:
            lat_model = DetectionModel(model.spec, model.variables, jdtype,
                                       fused=True, s2d_stem=True)
            lat_module = lat_model.serving_module()

        def one_image(imgs):
            x = imgs.astype(jdtype) / 255.0
            feats = lat_module.apply(lat_vars, x, train=False)
            b, s, c, _ = decode_topk_nhwc(feats, anchors, strides, k_per_scale=k_per_scale,
                                          conf_thres=0.25, with_overflow=True)
            return nms_from_candidates(b, s, c, iou_thres=0.45, max_det=300, use_pallas=True)

        @jax.jit
        def lat_pipeline(all_imgs):  # (N, 1, H, W, 3)
            def body(_, im):
                return 0, one_image(im)

            _, (dets, n) = jax.lax.scan(body, 0, all_imgs)
            return dets, n

        lat_iters = 32
        lat_imgs = jax.device_put(
            rng.integers(0, 255, size=(lat_iters, 1, imgsz, imgsz, 3), dtype=np.uint8))
        np.asarray(lat_pipeline(lat_imgs)[1])  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(lat_pipeline(lat_imgs)[1])
            best = min(best, (time.perf_counter() - t0) / lat_iters)
        extra["latency_bs1_ms"] = round(best * 1e3, 2)

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
    p.add_argument("--train-only", action="store_true")
    p.add_argument("--s2d-stem", action="store_true")
    p.add_argument("--no-latency", action="store_true")
    a = p.parse_args()
    if a.train_only:
        v = _train_throughput(a.model, a.imgsz)
        print(json.dumps({"train_img_s": round(v, 2)}))
    else:
        main(a.model, a.imgsz, a.batch, a.iters, a.dtype,
             with_planted=not a.no_planted, with_h2d=not a.no_h2d, with_train=not a.no_train,
             s2d_stem=a.s2d_stem, with_latency=not a.no_latency)
