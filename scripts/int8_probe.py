"""Microbench: int8 vs bf16 convolution throughput on the attached TPU.

Decides whether an int8 PTQ inference path is worth building: v5e's MXU has
2x int8 peak (394 vs 197 TOPs) and int8 activations halve HBM traffic, but
only if XLA actually lowers s8xs8->s32 convs onto the MXU through this stack.

Shapes probed: a bandwidth-bound early layer (high res, few channels) and a
compute-bound deep layer (low res, many channels) from yolov3@640.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def bench_conv(dtype, batch, h, w, cin, cout, k=3, iters=20):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    if dtype == "int8":
        x = jnp.asarray(rng.integers(-127, 127, (batch, h, w, cin), dtype=np.int8))
        wgt = jnp.asarray(rng.integers(-127, 127, (k, k, cin, cout), dtype=np.int8))
        pref = jnp.int32
    else:
        x = jnp.asarray(rng.standard_normal((batch, h, w, cin)).astype(np.float32), dtype=jnp.bfloat16)
        wgt = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32), dtype=jnp.bfloat16)
        pref = jnp.float32

    @jax.jit
    def run(x, wgt):
        def body(acc, _):
            y = jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=pref,
            )
            # fold the output back to the input dtype so the loop carries a
            # realistic requantize/downcast step
            if dtype == "int8":
                y8 = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
                acc = acc + jnp.sum(y8[:, 0, 0, :cin].astype(jnp.int32))
            else:
                yb = y.astype(jnp.bfloat16)
                acc = acc + jnp.sum(yb[:, 0, 0, :cin].astype(jnp.float32))
            return acc, ()

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32 if dtype != "int8" else jnp.int32), None, length=iters)
        return acc

    out = run(x, wgt)
    np.asarray(out)  # compile+warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x, wgt))
        best = min(best, time.perf_counter() - t0)
    flops = 2 * batch * h * w * cin * cout * k * k * iters
    return best, flops / best / 1e12


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    a = p.parse_args()
    cases = [
        ("early (bandwidth-bound)", a.batch, 160, 160, 64, 128),
        ("deep (compute-bound)", a.batch, 20, 20, 512, 1024),
    ]
    for name, b, h, w, ci, co in cases:
        for dt in ("bfloat16", "int8"):
            t, tops = bench_conv(dt, b, h, w, ci, co)
            print(f"{name} {dt:9s}: {t*1e3:7.1f} ms  {tops:6.1f} T{'OP' if dt=='int8' else 'FLOP'}/s", flush=True)


if __name__ == "__main__":
    main()
