"""Pallas TPU kernel: fused candidate-score pass for the top-k decode.

The XLA decode (models/detect_head._decode_topk_scales) computes
``sigmoid(obj) * sigmoid(max(cls))`` from a (bs, ny*nx*na, no) view of the
raw NHWC head output. That view splits the 255-lane minor dimension into
(na=3, no=85) — NOT a tile-aligned split on TPU, so XLA materializes a
relayout copy and pays several full passes over the ~548 MB head tensor:
measured 6.54 ms/batch at bs128/640px against a 0.67 ms one-pass bf16
bandwidth floor (scripts/decode_probe.py).

This kernel reads the head output ONCE in its natural layout — blocks of
(R, na*no) rows with the full 255-channel minor dim resident in VMEM — and
emits, per anchor, the masked candidate score and the class argmax, laid out
(bs, na, ny*nx) so the minor dim stays wide for the subsequent lax.top_k.

MEASURED REJECTION (round 5, scripts/decode_probe.py on TPU, bs128/640px):
28.26 ms/batch vs 6.25 ms for the XLA score pass — the one-HBM-read win is
swamped by the in-VMEM per-anchor slices (offsets 4/89/174 into the 255-lane
minor dim are not 128-lane aligned, so every obj/cls access lowers to
lane-rotate + masked ops on the VPU). Kept in-tree, default OFF everywhere
(bench/serve/validator use the XLA decode), as the measured baseline for
future layout experiments; the interpret-mode parity test in
tests/test_fused_decode.py pins its semantics.

Candidate semantics are bit-identical to the XLA path (reference
utils/general.py:630-714: conf = obj * cls_max, both > conf_thres; invalid
slots score -1): max/upcast commute exactly, and the argmax tie-break is
min-index-of-max on the f32-upcast logits, matching jnp.argmax on bf16.
Only the flat candidate ORDER differs ((a, y, x) here vs (y, x, a) in the
XLA path) — a pure re-indexing the caller inverts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _score_kernel(x_ref, score_ref, arg_ref, *, na, no, conf_thres):
    x = x_ref[0]  # (R, na*no) compute dtype
    nc = no - 5
    for a in range(na):  # static unroll (na=3)
        off = a * no
        obj = jax.nn.sigmoid(x[:, off + 4].astype(jnp.float32))  # (R,)
        cls = x[:, off + 5 : off + no].astype(jnp.float32)  # (R, nc)
        cmax = jnp.max(cls, axis=1)
        # argmax = min index attaining the max (first-occurrence, like jnp.argmax)
        iota = jax.lax.broadcasted_iota(jnp.int32, cls.shape, 1)
        carg = jnp.min(jnp.where(cls == cmax[:, None], iota, nc), axis=1)
        score = obj * jax.nn.sigmoid(cmax)
        valid = (score > conf_thres) & (obj > conf_thres)
        score_ref[0, a, :] = jnp.where(valid, score, -1.0)
        arg_ref[0, a, :] = carg


@functools.partial(jax.jit, static_argnames=("na", "no", "conf_thres", "interpret"))
def masked_scores_pallas(flat_spatial, na, no, conf_thres, interpret=False):
    """Masked candidate scores + class argmax from raw NHWC head output.

    Args:
        flat_spatial: (bs, ny*nx, na*no) head output, compute dtype (a free
            reshape of the (bs, ny, nx, na*no) conv output — only major dims
            merge, the minor layout is untouched).
        na / no: anchors per scale / outputs per anchor (5 + nc).
        conf_thres: candidate threshold (reference val.py:605-609 semantics).

    Returns:
        scores: (bs, na, ny*nx) f32 — obj*cls_max where valid, else -1.
        args:   (bs, na, ny*nx) int32 class argmax.
    """
    bs, m, ch = flat_spatial.shape
    assert ch == na * no, (flat_spatial.shape, na, no)
    r = min(512, m)
    grid = (bs, pl.cdiv(m, r))
    kernel = functools.partial(_score_kernel, na=na, no=no, conf_thres=float(conf_thres))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, r, ch), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((1, na, r), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, na, r), lambda b, i: (b, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bs, na, m), jnp.float32),
            jax.ShapeDtypeStruct((bs, na, m), jnp.int32),
        ],
        interpret=interpret,
    )(flat_spatial)
