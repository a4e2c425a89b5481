"""Differential attribution of the train step: where do 183 img/s go?

The relay profiler RESOURCE_EXHAUSTs on train-step-sized programs (r4), so
this measures component costs by subtraction instead: each variant is ONE
jitted lax.scan over `iters` steps (same methodology as bench.py), and the
difference between variants isolates a component.

Variants (cumulative):
  fwd        : train-mode forward only (batch-stats mutation kept)
  fwd_loss   : + loss (target assignment + CIoU/BCE)
  grad       : + backward (value_and_grad)
  opt        : + optimizer update (clip + 3-group SGD + schedules)
  full       : + EMA lerp + state plumbing  (== the real train step)

Usage (TPU): python scripts/train_attr_diff.py [--batch 128] [--no-remat]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_variants(model, loss_cfg, tx, remat):
    import jax
    import jax.numpy as jnp
    import optax

    from yolov3_tpu.train.loss import compute_loss
    from yolov3_tpu.train.optim import EMA
    from yolov3_tpu.train.step import normalize_images

    module = model.module
    if remat:
        module = module.clone(remat=True)

    def apply_fn(params, batch_stats, x):
        return module.apply({"params": params, "batch_stats": batch_stats}, x, train=True, mutable=["batch_stats"])

    def loss_of(params, batch_stats, x, targets, mask):
        feats, mut = apply_fn(params, batch_stats, x)
        loss, comps = compute_loss(list(feats), targets, mask, loss_cfg)
        return loss, mut["batch_stats"]

    def v_fwd(state, imgs, targets, mask):
        x = normalize_images(imgs, dtype=getattr(module, "dtype", jnp.float32))
        feats, mut = apply_fn(state["params"], state["batch_stats"], x)
        state = dict(state, batch_stats=mut["batch_stats"])
        # consume feats cheaply so XLA can't DCE the head
        probe = sum(f.astype(jnp.float32).sum() for f in feats)
        return state, probe

    def v_fwd_loss(state, imgs, targets, mask):
        x = normalize_images(imgs, dtype=getattr(module, "dtype", jnp.float32))
        loss, bstats = loss_of(state["params"], state["batch_stats"], x, targets, mask)
        return dict(state, batch_stats=bstats), loss

    def v_grad(state, imgs, targets, mask):
        x = normalize_images(imgs, dtype=getattr(module, "dtype", jnp.float32))
        (loss, bstats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"], state["batch_stats"], x, targets, mask
        )
        gprobe = sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree.leaves(grads))
        return dict(state, batch_stats=bstats), loss + gprobe * 0.0

    def v_opt(state, imgs, targets, mask):
        x = normalize_images(imgs, dtype=getattr(module, "dtype", jnp.float32))
        (loss, bstats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"], state["batch_stats"], x, targets, mask
        )
        updates, new_opt = tx.update(grads, state["opt"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return dict(state, params=new_params, batch_stats=bstats, opt=new_opt), loss

    def v_full(state, imgs, targets, mask):
        x = normalize_images(imgs, dtype=getattr(module, "dtype", jnp.float32))
        (loss, bstats), grads = jax.value_and_grad(loss_of, has_aux=True)(
            state["params"], state["batch_stats"], x, targets, mask
        )
        updates, new_opt = tx.update(grads, state["opt"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_ema = EMA.update(state["ema"], {"params": new_params, "batch_stats": bstats})
        return dict(state, params=new_params, batch_stats=bstats, opt=new_opt, ema=new_ema), loss

    return {"fwd": v_fwd, "fwd_loss": v_fwd_loss, "grad": v_grad, "opt": v_opt, "full": v_full}


def main(batch=128, remat=True, iters=4, model_name="yolov3", imgsz=640):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.train.loss import LossConfig
    from yolov3_tpu.train.optim import build_optimizer
    from yolov3_tpu.train.step import init_train_state

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16)
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005}
    tx, _, _ = build_optimizer("sgd", model.params, hyp, epochs=300, steps_per_epoch=1000,
                               batch_size=batch, nbs=batch, min_warmup_steps=0)
    loss_cfg = LossConfig.from_model(model.spec, hyp)
    variants = build_variants(model, loss_cfg, tx, remat)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (iters, batch, imgsz, imgsz, 3), np.uint8)
    targets = np.zeros((iters, batch, 32, 5), np.float32)
    targets[..., 0, :] = [0, 0.5, 0.5, 0.3, 0.3]
    targets[..., 1, :] = [1, 0.25, 0.25, 0.2, 0.2]
    mask = np.zeros((iters, batch, 32), bool)
    mask[..., :2] = True
    imgs_d = jax.device_put(imgs)
    targets_d = jax.device_put(targets)
    mask_d = jax.device_put(mask)

    results = {}
    for name, fn in variants.items():
        state = init_train_state(model, tx, loss_cfg=loss_cfg)

        @jax.jit
        def run(state, imgs, targets, mask, fn=fn):
            def body(st, b):
                st, probe = fn(st, *b)
                return st, probe

            return jax.lax.scan(body, state, (imgs, targets, mask))

        try:
            st, probes = run(state, imgs_d, targets_d, mask_d)
            np.asarray(probes)  # warm
            best = float("inf")
            for _ in range(2):
                st, probes = run(st, imgs_d, targets_d, mask_d)
                t0 = time.perf_counter()
                np.asarray(probes)
                # probes is tiny; the scan itself dominates. time a fresh run end-to-end
            for _ in range(2):
                t0 = time.perf_counter()
                st, probes = run(st, imgs_d, targets_d, mask_d)
                np.asarray(probes)
                best = min(best, time.perf_counter() - t0)
            ms = best * 1e3 / iters
            results[name] = ms
            print(f"{name:>9}: {ms:8.1f} ms/step  ({batch / (best / iters):7.1f} img/s)", flush=True)
        except Exception as e:  # OOM on some variants at large batch
            print(f"{name:>9}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
            results[name] = None

    keys = ["fwd", "fwd_loss", "grad", "opt", "full"]
    prev = None
    print("\ndeltas:")
    for k in keys:
        if results.get(k) is not None and prev is not None and results.get(prev) is not None:
            print(f"  {prev} -> {k}: +{results[k] - results[prev]:.1f} ms")
        prev = k


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--iters", type=int, default=4)
    a = p.parse_args()
    main(batch=a.batch, remat=not a.no_remat, iters=a.iters)
