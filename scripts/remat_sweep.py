"""Sweep selective-remat cutoffs for the bs128@640 train step.

For each `remat_until` cutoff, jit the full train step (scan over iters) and
report ms/step + img/s; OOM prints as FAILED. Companion to
scripts/train_attr_diff.py which showed full-body remat spends ~171 ms/step
(1x forward) on recompute.

Usage (TPU): python scripts/remat_sweep.py [--batch 128] [--cuts 7,9,11,-1]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(batch=128, cuts=(7, 9, 11, -1), iters=4, model_name="yolov3", imgsz=640):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.train.loss import LossConfig
    from yolov3_tpu.train.optim import build_optimizer
    from yolov3_tpu.train.step import init_train_state, make_train_step

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16)
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005}
    tx, _, _ = build_optimizer("sgd", model.params, hyp, epochs=300, steps_per_epoch=1000,
                               batch_size=batch, nbs=batch, min_warmup_steps=0)
    loss_cfg = LossConfig.from_model(model.spec, hyp)

    rng = np.random.default_rng(0)
    imgs = jax.device_put(rng.integers(0, 255, (iters, batch, imgsz, imgsz, 3), np.uint8))
    targets = np.zeros((iters, batch, 32, 5), np.float32)
    targets[..., 0, :] = [0, 0.5, 0.5, 0.3, 0.3]
    targets[..., 1, :] = [1, 0.25, 0.25, 0.2, 0.2]
    targets = jax.device_put(targets)
    mask = np.zeros((iters, batch, 32), bool)
    mask[..., :2] = True
    mask = jax.device_put(mask)

    for cut in cuts:
        # cut == -2: no explicit remat at all (XLA's HLO rematerializer decides)
        step = make_train_step(model.module, loss_cfg, tx, remat=cut != -2,
                               remat_until=None if cut < 0 else cut)

        @jax.jit
        def run(state, imgs, targets, mask, step=step):
            def body(st, b):
                st, m = step(st, *b)
                return st, m["loss"]

            return jax.lax.scan(body, state, (imgs, targets, mask))

        label = {-1: "all", -2: "none"}.get(cut, f"<{cut}")
        try:
            state = init_train_state(model, tx, loss_cfg=loss_cfg)
            st, losses = run(state, imgs, targets, mask)
            np.asarray(losses)  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                st, losses = run(st, imgs, targets, mask)
                np.asarray(losses)
                best = min(best, time.perf_counter() - t0)
            ms = best * 1e3 / iters
            print(f"remat_until {label:>4}: {ms:8.1f} ms/step  ({batch / (best / iters):7.1f} img/s)",
                  flush=True)
        except Exception as e:
            print(f"remat_until {label:>4}: FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--cuts", default="7,9,11,-1")
    p.add_argument("--iters", type=int, default=4)
    a = p.parse_args()
    main(batch=a.batch, cuts=[int(c) for c in a.cuts.split(",")], iters=a.iters)
