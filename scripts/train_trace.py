"""Capture a jax.profiler trace + compiled HLO of the flagship train step.

Attribution companion to scripts/trace_attr.py: answers "where do the
183 img/s go" (fwd vs bwd vs loss vs optimizer/EMA) for the bs128
segmented-remat config that bench.py's train_img_s reports.

Usage (TPU):  python scripts/train_trace.py [--batch 128] [--no-remat]
Then:         python scripts/trace_attr.py runs/profile_train <hlo.txt>
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(model_name="yolov3", imgsz=640, batch=128, remat=True, iters=2,
         logdir="runs/profile_train", s2d_stem=False):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.train.loss import LossConfig
    from yolov3_tpu.train.optim import build_optimizer
    from yolov3_tpu.train.step import init_train_state, make_train_step
    from yolov3_tpu.utils.profiling import trace

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16, s2d_stem=s2d_stem)
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005}
    tx, _, _ = build_optimizer("sgd", model.params, hyp, epochs=300, steps_per_epoch=1000,
                               batch_size=batch, min_warmup_steps=0)
    loss_cfg = LossConfig.from_model(model.spec, hyp)
    step = make_train_step(model.module, loss_cfg, tx, remat=remat)
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
    targets_d = jax.device_put(targets)
    mask_d = jax.device_put(mask)

    lowered = run_steps.lower(state, imgs_d, targets_d, mask_d)
    compiled = lowered.compile()
    hlo_path = Path(logdir).with_suffix(".hlo.txt")
    hlo_path.parent.mkdir(parents=True, exist_ok=True)
    hlo_path.write_text(compiled.as_text())
    print(f"HLO -> {hlo_path}", flush=True)

    # warm (state is donated — rebuild between runs)
    st2, losses = run_steps(state, imgs_d, targets_d, mask_d)
    np.asarray(losses)
    t0 = time.perf_counter()
    st3, losses = run_steps(st2, imgs_d, targets_d, mask_d)
    np.asarray(losses)
    dt = time.perf_counter() - t0
    print(f"steady-state: {batch * iters / dt:.1f} img/s ({dt * 1e3 / iters:.1f} ms/step)", flush=True)

    with trace(logdir):
        st4, losses = run_steps(st3, imgs_d, targets_d, mask_d)
        np.asarray(losses)
    print(f"trace -> {logdir}", flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="yolov3")
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--s2d-stem", action="store_true")
    p.add_argument("--logdir", default="runs/profile_train")
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, remat=not a.no_remat, logdir=a.logdir, s2d_stem=a.s2d_stem)
