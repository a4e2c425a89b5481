"""TPU probe: val-grade NMS — batch-gridded Pallas kernel vs the XLA loop.

Checks (a) the gridded kernel lowers + runs on real TPU at max_nms=30000,
(b) row-exactness vs the XLA while-loop on planted dense scenes, (c) the
per-batch latency delta that eval/validator.py's TPU default buys.

Usage: python scripts/nms_valgrade_probe.py [--batch 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def planted_pred(B, n=25200, nc=80, n_obj=200, seed=0):
    """Raw decoded predictions with n_obj confident objects per image."""
    rng = np.random.default_rng(seed)
    pred = np.zeros((B, n, 5 + nc), np.float32)
    pred[..., 0] = rng.uniform(40, 600, (B, n))
    pred[..., 1] = rng.uniform(40, 600, (B, n))
    pred[..., 2] = rng.uniform(8, 40, (B, n))
    pred[..., 3] = rng.uniform(8, 40, (B, n))
    pred[..., 4] = rng.uniform(0.0, 0.004, (B, n))  # sub-threshold noise floor
    pred[..., 5:] = rng.uniform(0.0, 0.8, (B, n, nc))
    idx = rng.choice(n, size=(B, n_obj), replace=False)
    for b in range(B):
        pred[b, idx[b], 4] = rng.uniform(0.3, 0.99, n_obj)
    return pred


def main(batch=8):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.ops.nms import batched_nms
    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()
    pred = jax.device_put(jnp.asarray(planted_pred(batch)))
    kw = dict(conf_thres=0.001, iou_thres=0.6, multi_label=True, max_det=300, max_nms=30000)

    def run(use_pallas):
        f = jax.jit(lambda p: batched_nms(p, use_pallas=use_pallas, **kw))
        out, n = f(pred)
        np.asarray(n)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out, n = f(pred)
            o = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return o, np.asarray(n), best * 1e3

    out_x, n_x, ms_x = run(False)
    out_p, n_p, ms_p = run(True)
    np.testing.assert_array_equal(n_x, n_p)
    np.testing.assert_allclose(out_x, out_p, rtol=1e-5, atol=1e-4)
    print(f"row-exact at bs{batch}, dets/img mean {n_x.mean():.1f}")
    print(f"XLA loop   : {ms_x:8.2f} ms/batch")
    print(f"Pallas grid: {ms_p:8.2f} ms/batch  ({ms_x / ms_p:.2f}x)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    a = p.parse_args()
    main(batch=a.batch)
