"""TPU train-throughput probe: jitted train step on the flagship at 640.

Measures steady-state images/sec of the full one-program train step
(normalize -> forward -> loss -> grad -> SGD+schedules -> EMA), N steps
inside a lax.scan, timed until the loss vector materializes.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(model_name="yolov3", imgsz=640, batch=16, iters=4, remat=False, remat_seg=None, s2d_stem=False,
         max_labels=32, n_real=2):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.train.loss import LossConfig
    from yolov3_tpu.train.optim import build_optimizer
    from yolov3_tpu.train.step import init_train_state, make_train_step

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16, s2d_stem=s2d_stem)
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005}
    tx, _, _ = build_optimizer("sgd", model.params, hyp, epochs=300, steps_per_epoch=1000,
                               batch_size=batch, min_warmup_steps=0)
    loss_cfg = LossConfig.from_model(model.spec, hyp)
    step = make_train_step(model.module, loss_cfg, tx, remat=remat, remat_segment=remat_seg)
    state = init_train_state(model, tx, loss_cfg=loss_cfg)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (iters, batch, imgsz, imgsz, 3), np.uint8)
    # max_labels sets the padded label width M the loss pays for (5*na*B*M
    # candidate slots/scale); n_real sets how many rows are valid — probe
    # M=300 vs M=32 to measure what data/datasets.label_bucket buys
    targets = np.zeros((iters, batch, max_labels, 5), np.float32)
    r = rng.uniform(0.1, 0.9, (iters, batch, max_labels, 4)).astype(np.float32)
    targets[..., 1:3] = r[..., :2]
    targets[..., 3:5] = r[..., 2:] * 0.3 + 0.02
    targets[..., 0] = rng.integers(0, 80, (iters, batch, max_labels))
    mask = np.zeros((iters, batch, max_labels), bool)
    mask[..., :n_real] = True

    @jax.jit
    def run_steps(state, imgs, targets, mask):
        def body(st, batch):
            st, m = step(st, *batch)
            return st, m["loss"]

        return jax.lax.scan(body, state, (imgs, targets, mask))

    imgs_d = jax.device_put(imgs)
    t0 = time.perf_counter()
    state2, losses = run_steps(state, imgs_d, targets, mask)
    print(f"compile+run: {time.perf_counter() - t0:.1f}s, losses {np.asarray(losses)}", flush=True)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _, losses = run_steps(state, imgs_d, targets, mask)
        np.asarray(losses)
        best = min(best, time.perf_counter() - t0)
    print(f"train {model_name}@{imgsz} bs{batch} M={max_labels} real={n_real}: "
          f"{batch * iters / best:.1f} img/s ({best * 1e3:.0f}ms/{iters} steps)", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat-seg", type=int, default=None)
    p.add_argument("--s2d-stem", action="store_true")
    p.add_argument("--max-labels", type=int, default=32)
    p.add_argument("--n-real", type=int, default=2)
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, a.iters, a.remat, a.remat_seg, a.s2d_stem, a.max_labels, a.n_real)
