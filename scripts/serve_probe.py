"""TPU probe: per-micro-batch serving cost incl. host fetches.

Measures what a live server pays per request batch (serve.py MicroBatcher):
device compute + the D2H round trips of the result protocol. Compares the
packed-meta protocol (one small fetch: [n..., overflow_any], then the dets
prefix) against the previous 3-fetch protocol (overflow-any, n, dets prefix)
emulated on the same compiled program, plus the bare round-trip cost of a
tiny fetch through the relay.

Run ON TPU: python scripts/serve_probe.py [--batch 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main(model_name="yolov3", imgsz=640, batch=8, iters=20):
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.serve import build_batched_infer

    model = DetectionModel.from_config(model_name, imgsz=64, dtype=jnp.bfloat16)
    infer = build_batched_infer(model, fast=True)

    rng = np.random.default_rng(0)
    z = rng.integers(0, 255, (batch, imgsz, imgsz, 3), np.uint8)

    # warm both paths
    dets, n = infer(z)
    np.asarray(dets), np.asarray(n)
    d, meta = infer.fast_jit(z)
    np.asarray(d), np.asarray(meta)

    # bare round trip: a fetch of an already-computed tiny tensor
    tiny = jnp.zeros((8,), jnp.int32) + 1
    np.asarray(tiny)
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(tiny)
    rt = (time.perf_counter() - t0) / iters * 1e3
    print(f"bare small-fetch round trip: {rt:.2f} ms")

    def run_new():
        dets, nn = infer(z)  # 1 small fetch inside
        return np.asarray(dets[:, : int(np.asarray(nn).max())])

    def run_old():
        dets, meta = infer.fast_jit(z)
        if bool(np.asarray(meta[-1])):  # fetch 1 (overflow flag)
            raise RuntimeError("unexpected overflow")
        nn = np.asarray(meta[:-1])  # fetch 2 (counts)
        return np.asarray(dets[:, : int(nn.max())])  # fetch 3 (prefix)

    for label, fn in (("new (packed meta, 2 fetches)", run_new),
                      ("old (3 fetches)", run_old)):
        fn()
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label}: {ms:.2f} ms/micro-batch (bs{batch}, {batch / ms * 1e3:.0f} img/s)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--model", default="yolov3")
    p.add_argument("--imgsz", type=int, default=640)
    a = p.parse_args()
    main(a.model, a.imgsz, a.batch, a.iters)
