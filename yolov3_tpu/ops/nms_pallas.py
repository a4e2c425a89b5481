"""Pallas TPU kernel: batched greedy NMS.

The XLA fori_loop version in ops/nms.py runs max_det sequential HLO
iterations, each a handful of small (B, K) ops — per-iteration while-loop
overhead dominates. This kernel runs the whole suppression loop inside ONE
Pallas program with every operand resident in VMEM:

  layout: boxes as (4, B, K) planes (lane dim = K, 128-aligned), scores/cls
  (B, K), output (6, B, max_det) planes, transposed back outside.

  per step: row-argmax over scores -> one-hot gather of the selected box ->
  vectorized IoU against all K boxes -> masked suppression -> one-hot
  column-mask accumulation into the output planes (Mosaic forbids dynamic
  single-lane stores, so the output is built with full-tile multiply-adds).

All shapes static; B*K*f32 (~2.5 MB at B=16, K=4096) fits VMEM comfortably.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_off_ref, boxes_ref, scores_ref, cls_ref, out_ref, scores_scratch, *, iou_thres, max_det):
    B, K = scores_ref.shape
    scores_scratch[:] = scores_ref[:]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (B, K), 1)
    det_ids = jax.lax.broadcasted_iota(jnp.int32, (B, max_det), 1)

    ox1 = boxes_off_ref[0]
    oy1 = boxes_off_ref[1]
    ox2 = boxes_off_ref[2]
    oy2 = boxes_off_ref[3]
    area = (ox2 - ox1) * (oy2 - oy1)  # (B, K)

    out_ref[...] = jnp.zeros_like(out_ref)

    def step(carry):
        t, _ = carry
        s = scores_scratch[:]
        i = jnp.argmax(s, axis=1)  # (B,)
        onehot = (col_ids == i[:, None]).astype(jnp.float32)  # (B, K)
        smax = jnp.max(s, axis=1)  # (B,)
        valid = smax > 0.0
        vf = valid.astype(jnp.float32)

        # one-hot gather of the selected box (keeps everything 2D/VPU-friendly)
        sx1 = jnp.sum(onehot * ox1, axis=1)
        sy1 = jnp.sum(onehot * oy1, axis=1)
        sx2 = jnp.sum(onehot * ox2, axis=1)
        sy2 = jnp.sum(onehot * oy2, axis=1)
        sarea = (sx2 - sx1) * (sy2 - sy1)

        iw = jnp.clip(jnp.minimum(sx2[:, None], ox2) - jnp.maximum(sx1[:, None], ox1), 0.0, None)
        ih = jnp.clip(jnp.minimum(sy2[:, None], oy2) - jnp.maximum(sy1[:, None], oy1), 0.0, None)
        inter = iw * ih
        iou = inter / (sarea[:, None] + area - inter + 1e-7)

        suppress = ((iou > iou_thres) & valid[:, None]) | (onehot > 0)
        scores_scratch[:] = jnp.where(suppress, -1.0, s)

        # write column t of each output plane via a full-tile one-hot mask
        colmask = (det_ids == t).astype(jnp.float32)  # (B, max_det)
        bx1 = jnp.sum(onehot * boxes_ref[0], axis=1) * vf
        by1 = jnp.sum(onehot * boxes_ref[1], axis=1) * vf
        bx2 = jnp.sum(onehot * boxes_ref[2], axis=1) * vf
        by2 = jnp.sum(onehot * boxes_ref[3], axis=1) * vf
        conf = jnp.maximum(smax, 0.0) * vf
        cls = jnp.sum(onehot * cls_ref[:], axis=1) * vf
        out_ref[0] += bx1[:, None] * colmask
        out_ref[1] += by1[:, None] * colmask
        out_ref[2] += bx2[:, None] * colmask
        out_ref[3] += by2[:, None] * colmask
        out_ref[4] += conf[:, None] * colmask
        out_ref[5] += cls[:, None] * colmask
        return t + 1, jnp.any(valid)

    # early exit once every image's candidate pool is exhausted — real images
    # yield far fewer than max_det detections, so the loop runs ~n_det steps
    jax.lax.while_loop(
        lambda c: (c[0] < max_det) & c[1],
        step,
        (jnp.int32(0), jnp.bool_(True)),
    )


@functools.partial(jax.jit, static_argnames=("iou_thres", "max_det", "interpret", "grid_batch"))
def pallas_greedy_nms(boxes_off, boxes, scores, cls_ids, iou_thres=0.45, max_det=300, interpret=False,
                      grid_batch=False):
    """Greedy NMS over prefiltered candidates.

    Args:
        boxes_off: (B, K, 4) class-offset xyxy boxes (suppression geometry).
        boxes: (B, K, 4) original xyxy boxes (written to the output).
        scores: (B, K) candidate scores, invalid slots < 0.
        cls_ids: (B, K) class ids as floats.
        grid_batch: run one Pallas program per IMAGE (grid over B) instead of
            keeping the whole (B, K) batch VMEM-resident. This is the
            val-grade regime (conf 0.001 / max_nms 30000, reference
            val.py:196-199): per-image operands are ~11 planes x K x 4B
            (1.3 MB at K=30000) regardless of batch size, and each image's
            greedy loop early-exits independently instead of waiting for the
            batch straggler.

    Returns:
        out: (B, max_det, 6) [x1,y1,x2,y2,conf,cls] in descending score order.
        n_valid: (B,) number of valid rows.
    """
    B, K, _ = boxes.shape
    bo = jnp.transpose(boxes_off.astype(jnp.float32), (2, 0, 1))  # (4, B, K)
    bx = jnp.transpose(boxes.astype(jnp.float32), (2, 0, 1))
    kernel = functools.partial(_nms_kernel, iou_thres=float(iou_thres), max_det=int(max_det))
    if grid_batch:
        # same kernel body on (·, 1, K) blocks: grid over images
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            out_shape=jax.ShapeDtypeStruct((6, B, max_det), jnp.float32),
            in_specs=[
                pl.BlockSpec((4, 1, K), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 1, K), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((6, 1, max_det), lambda b: (0, b, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, K), jnp.float32)],
            interpret=interpret,
        )(bo, bx, scores.astype(jnp.float32), cls_ids.astype(jnp.float32))
    else:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((6, B, max_det), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((B, K), jnp.float32)],
            interpret=interpret,
        )(bo, bx, scores.astype(jnp.float32), cls_ids.astype(jnp.float32))
    out = jnp.transpose(out, (1, 2, 0))  # (B, max_det, 6)
    n_valid = jnp.sum(out[:, :, 4] > 0, axis=1).astype(jnp.int32)
    return out, n_valid
