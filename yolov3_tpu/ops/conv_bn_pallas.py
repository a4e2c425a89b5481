"""Pallas TPU prototype: 3x3 conv fused with BatchNorm batch-statistics.

The train-step plateau (docs/PERF.md round-4: 183 img/s = 55% of the step's
XLA-cost-model roofline) attributes the train/eval forward gap (171 vs
135 ms at bs128@640) to BatchNorm batch-stat traffic: XLA materializes each
conv output Y to HBM, then the stats reduction re-reads all of Y, then the
normalize+SiLU reads it a third time. Fusing the per-channel sum/sum-of-
squares INTO the conv's output loop eliminates the stats read — one full
HBM pass over every training activation (reference train-mode BN semantics:
models/common.py Conv -> BatchNorm2d, consumed via cuDNN's fused paths).

Kernel shape: stride-1 SAME 3x3 conv in NHWC as 9 shifted (TH*W, Cin) @
(Cin, Cout) MXU contractions accumulated in f32, per-channel sum/sumsq
accumulated across the sequential TPU grid into a (2, Cout) f32 output
(same revisited-block accumulation pattern as ops/nms_pallas.py). Input is
pre-padded by 1 px on H/W (prototype simplification; a production kernel
masks edges instead).

Status: PROTOTYPE for the measured go/no-go in scripts/fused_conv_bn_probe.py
— see docs/PERF.md round-5 for the verdict and numbers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv3x3_stats_kernel(x_ref, w_ref, y_ref, stats_ref, *, th, width, cout):
    """One (batch, row-block) grid step: 9-tap matmul conv + stats update.

    x_ref: (1, th+2, width+2, cin) bf16 — row block with halo, W pre-padded
    w_ref: (9, cin, cout) bf16 — taps flattened row-major
    y_ref: (1, th, width, cout) — conv output block
    stats_ref: (2, cout) f32 — [sum, sumsq] accumulated across the grid
    """
    b = pl.program_id(0)
    h = pl.program_id(1)
    x = x_ref[0]  # (th+2, width+2, cin)
    acc = jnp.zeros((th * width, cout), jnp.float32)
    for di in range(3):
        for dj in range(3):
            xs = x[di : di + th, dj : dj + width, :].reshape(th * width, x.shape[-1])
            acc += jax.lax.dot_general(
                xs, w_ref[di * 3 + dj],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    y_ref[0] = acc.reshape(th, width, cout).astype(y_ref.dtype)

    @pl.when((b == 0) & (h == 0))
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    s = jnp.sum(acc, axis=0, keepdims=True)  # (1, cout)
    q = jnp.sum(acc * acc, axis=0, keepdims=True)
    stats_ref[...] += jnp.concatenate([s, q], axis=0)


@functools.partial(jax.jit, static_argnames=("th", "interpret"))
def conv3x3_bn_stats(x, w, th=8, interpret=False):
    """Fused stride-1 SAME 3x3 conv + BN batch statistics.

    Args:
        x: (B, H, W, Cin) activations (bf16 on TPU).
        w: (3, 3, Cin, Cout) HWIO kernel.
        th: output rows per grid step (H % th == 0).

    Returns:
        y: (B, H, W, Cout) conv output (x.dtype).
        mean: (Cout,) f32 batch mean of y.
        var: (Cout,) f32 biased batch variance of y (BatchNorm's normalizer).
    """
    B, H, W, Cin = x.shape
    Cout = w.shape[-1]
    assert H % th == 0, (H, th)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wf = w.reshape(9, Cin, Cout)
    kernel = functools.partial(_conv3x3_stats_kernel, th=th, width=W, cout=Cout)
    y, stats = pl.pallas_call(
        kernel,
        grid=(B, H // th),
        in_specs=[
            # halo rows: consecutive blocks overlap by 2, so the H dim needs
            # element-offset indexing — start row = h * th into the padded
            # (H+2) axis while the block spans th+2 rows. Mosaic requires all
            # dims to be Elements once one is.
            pl.BlockSpec((pl.Element(1), pl.Element(th + 2), pl.Element(W + 2),
                          pl.Element(Cin)),
                         lambda b, h: (b, h * th, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, Cin, Cout), lambda b, h: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, th, W, Cout), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, Cout), lambda b, h: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, W, Cout), x.dtype),
            jax.ShapeDtypeStruct((2, Cout), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wf)
    n = B * H * W
    mean = stats[0] / n
    var = stats[1] / n - mean * mean
    return y, mean, var
