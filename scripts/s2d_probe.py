"""Microbench: the l0..l3 stem region of yolov3@640, plain layout vs a full
space-to-depth region, timed as chained programs on the real TPU.

Trace evidence (round 3, docs/PERF.md): at bs32 the l0..l3 region costs
22.2 ms of the 49.2 ms forward (45% of time, 8% of FLOPs, ~18 TF/s) because
every activation under 128 channels is lane-padded — the (8,128) activation
tile packs [batch, channel], so 32-ch tensors carry 4x the HBM bytes and the
3-channel input conv cannot feed the MXU.

The s2d region keeps every activation at >=128 lanes: tensors are
(B,H/2,W/2,4c) with offset-major phase blocks, and each conv is re-expressed
with its canonical 3x3 kernel scattered into phase-block slots (exact math,
same parameters — see nn/modules.Conv s2d_mode).

Methodology notes (learned the hard way): a conv whose operands are
loop-invariant gets hoisted out of `lax.scan` by XLA — iteration timings
become fiction (an earlier version of this probe "measured" 379 TF/s on a
197 TF/s chip). Every kernel here is perturbed by the loop carry
(w + carry * 1e-30) so each iteration computes fresh, and only the region's
final output is reduced, so intermediate activations materialize (or fuse)
exactly as they would inside the model.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _conv(x, w, s, pad):
    import jax

    return jax.lax.conv_general_dilated(
        x, w, (s, s), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def _time(run, *args, iters=10):
    out = run(*args)
    np.asarray(out)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3  # ms per region pass


def make_region(kind, ws, iters=10):
    """Returns jitted fn: u8 image -> scalar, running the l0..l3 region
    `iters` times inside one scan with carry-perturbed weights."""
    import jax
    import jax.numpy as jnp

    lrelu = lambda v: jax.nn.leaky_relu(v, 0.1)

    def plain(x, p):
        h = lrelu(_conv(x, ws["k0"] + p, 1, ((1, 1), (1, 1))))          # l0 3->32 @640
        h = lrelu(_conv(h, ws["k1"] + p, 2, ((1, 1), (1, 1))))          # l1 32->64 @320
        r = h
        h = lrelu(_conv(h, ws["k2a"] + p, 1, "SAME"))                   # l2.cv1 1x1 64->32
        h = lrelu(_conv(h, ws["k2b"] + p, 1, ((1, 1), (1, 1))))         # l2.cv2 32->64
        h = h + r
        return lrelu(_conv(h, ws["k3"] + p, 2, ((1, 1), (1, 1))))       # l3 64->128 @160

    def s2d(x, p):
        b_, h_, w_, c_ = x.shape  # s2d input (B,320,320,12)
        h = lrelu(_conv(x, ws["s0"] + p, 1, ((1, 1), (1, 1))))          # l0' -> (320,320,128)
        h = lrelu(_conv(h, ws["s1"] + p, 2, ((1, 0), (1, 0))))          # l1' -> (160,160,256)
        r = h
        h = lrelu(jax.lax.conv_general_dilated(                          # l2.cv1' grouped 1x1
            h, ws["s2a"] + p, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=4,
            preferred_element_type=h.dtype))
        h = lrelu(_conv(h, ws["s2b"] + p, 1, ((1, 1), (1, 1))))         # l2.cv2' -> (160,160,256)
        h = h + r
        return lrelu(_conv(h, ws["s3"] + p, 1, ((1, 0), (1, 0))))       # l3' -> (160,160,128)

    body = plain if kind == "plain" else s2d

    @jax.jit
    def run(x):
        im = x.astype(jnp.bfloat16) / 255.0
        if kind == "s2d":
            b_, hh, wW, c_ = im.shape
            im = im.reshape(b_, hh // 2, 2, wW // 2, 2, c_).transpose(0, 1, 3, 2, 4, 5)
            im = im.reshape(b_, hh // 2, wW // 2, 4 * c_)

        def step(acc, _):
            y = body(im, (acc * 1e-30).astype(jnp.bfloat16))
            return acc + jnp.mean(y.astype(jnp.float32)), ()

        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), None, length=iters)
        return acc

    return run


def main(batch=32, iters=10):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    bf = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.05,
                                dtype=jnp.bfloat16)
    ws = {
        "k0": bf(3, 3, 3, 32), "k1": bf(3, 3, 32, 64), "k2a": bf(1, 1, 64, 32),
        "k2b": bf(3, 3, 32, 64), "k3": bf(3, 3, 64, 128),
        # s2d forms are dense stand-ins with the exact shapes the scattered
        # kernels take (timing only cares about shapes):
        "s0": bf(3, 3, 12, 128), "s1": bf(3, 3, 128, 256), "s2a": bf(1, 1, 64, 128),
        "s2b": bf(3, 3, 128, 256), "s3": bf(2, 2, 256, 128),
    }
    x = jnp.asarray(rng.integers(0, 255, (batch, 640, 640, 3), dtype=np.uint8))

    gflop_plain = 2 * batch * (9 * 3 * 32 * 640 * 640 + 9 * 32 * 64 * 320 * 320
                               + 64 * 32 * 320 * 320 + 9 * 32 * 64 * 320 * 320
                               + 9 * 64 * 128 * 160 * 160) / 1e9
    gflop_s2d = 2 * batch * (9 * 12 * 128 * 320 * 320 + 9 * 128 * 256 * 160 * 160
                             + 64 * 128 * 160 * 160 + 9 * 128 * 256 * 160 * 160
                             + 4 * 256 * 128 * 160 * 160) / 1e9
    for kind, gf in (("plain", gflop_plain), ("s2d", gflop_s2d)):
        ms = _time(make_region(kind, ws, iters), x, iters=iters)
        print(f"region {kind:<6} bs{batch}: {ms:7.2f} ms/pass  "
              f"({gf / ms:6.1f} TF/s dense-equivalent)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=10)
    a = p.parse_args()
    main(a.batch, a.iters)
