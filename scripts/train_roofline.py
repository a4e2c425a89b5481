"""Roofline bound for the bs128@640 train step from XLA's own cost model.

AOT-compiles the exact train-step program (no execution) and prints the
compiler's cost_analysis (FLOPs, bytes accessed) plus the resulting
compute/bandwidth roofline in ms against v5e peaks (197 TFLOP/s bf16,
819 GB/s HBM). Companion to scripts/train_attr_diff.py: that one measures
where the 706 ms goes; this one bounds how low it could ever go.

Usage (TPU): python scripts/train_roofline.py [--batch 128] [--no-remat]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_FLOPS = 197e12  # v5e bf16
PEAK_BYTES = 819e9  # v5e HBM


def main(batch=128, remat=True, model_name="yolov3", imgsz=640, s2d_stem=False):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.train.loss import LossConfig
    from yolov3_tpu.train.optim import build_optimizer
    from yolov3_tpu.train.step import init_train_state, make_train_step
    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16, s2d_stem=s2d_stem)
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005}
    tx, _, _ = build_optimizer("sgd", model.params, hyp, epochs=300, steps_per_epoch=1000,
                               batch_size=batch, nbs=batch, min_warmup_steps=0)
    loss_cfg = LossConfig.from_model(model.spec, hyp)
    step = make_train_step(model.module, loss_cfg, tx, remat=remat)
    state = init_train_state(model, tx, loss_cfg=loss_cfg)

    M = 32
    args = (
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state),
        jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch, M, 5), jnp.float32),
        jax.ShapeDtypeStruct((batch, M), jnp.bool_),
    )
    compiled = step.lower(*args).compile()

    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else (ca or {})
    print("cost_analysis keys:", sorted(ca.keys()) if hasattr(ca, "keys") else ca)
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    for k in sorted(ca.keys() if hasattr(ca, "keys") else []):
        if ("byte" in k and "{" not in k) or k in ("flops", "transcendentals", "optimal_seconds"):
            print(f"  {k}: {float(ca[k]):.4g}")

    ma = compiled.memory_analysis()
    if ma is not None:
        for f in ("temp_size_in_bytes", "argument_size_in_bytes", "output_size_in_bytes",
                  "peak_memory_in_bytes", "generated_code_size_in_bytes"):
            v = getattr(ma, f, None)
            if v:
                print(f"  memory.{f}: {v / 1e9:.3f} GB")

    t_flops = flops / PEAK_FLOPS * 1e3
    t_bytes = byts / PEAK_BYTES * 1e3
    roof = max(t_flops, t_bytes)
    print(f"\nbatch {batch} remat={remat} s2d={s2d_stem}")
    print(f"  FLOPs {flops / 1e12:.2f} TF -> {t_flops:.1f} ms at {PEAK_FLOPS/1e12:.0f} TF/s")
    print(f"  bytes {byts / 1e9:.1f} GB -> {t_bytes:.1f} ms at {PEAK_BYTES/1e9:.0f} GB/s")
    if roof > 0:
        print(f"  roofline max(compute, bandwidth) = {roof:.1f} ms "
              f"= {batch / roof * 1e3:.1f} img/s upper bound")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--s2d-stem", action="store_true")
    p.add_argument("--model", default="yolov3")
    a = p.parse_args()
    main(batch=a.batch, remat=not a.no_remat, model_name=a.model, s2d_stem=a.s2d_stem)
