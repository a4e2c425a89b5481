"""Detect head: per-scale 1x1 convs + pure-functional decode.

Re-design of the reference Detect module (reference models/yolo.py:69-123).
The torch version lazily caches grids as module state; here the grid is a pure
function of the (static) feature shape, so under jit it is constant-folded —
no cache, no dynamic rebuild.

Output parity targets (SURVEY.md §2.1): at 640x640/nc=80 the decoded tensor is
(1, 25200, 85) for yolov3 and (1, 6000, 85) for tiny, flattened in
(na, ny, nx) order.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def detect_bias_init(nc: int, na: int, stride: float, imgsz: float = 640.0):
    """Objectness/class prior bias init (reference yolo.py:282-292):
    obj ~ log(8 objects / (640/stride)^2 cells), cls ~ log(0.6/(nc-1))."""

    def init(key, shape, dtype=jnp.float32):
        b = np.zeros((na, nc + 5), dtype=np.float32)
        b[:, 4] += math.log(8.0 / (imgsz / stride) ** 2)
        b[:, 5 : 5 + nc] += math.log(0.6 / (nc - 0.99999))
        return jnp.asarray(b.reshape(-1), dtype=dtype)

    return init


class _PadHeadConv(nn.Module):
    """1x1 head conv that emits a 128-lane-aligned padded layout.

    Declares the SAME params as nn.Conv (kernel (1,1,cin,na*no), bias
    (na*no,)) so checkpoints are interchangeable with the unpadded head, but
    scatters anchor a's `no` output channels to lanes [a*pad, a*pad+no) at
    apply time (weight transform is KB-scale, folded by XLA). The pad lanes
    carry bias -20 (sigmoid ~ 0) and are never read by the padded decode.
    Rationale: the (na, no=85) split of the 255-lane minor dim is not
    tile-aligned on TPU, costing the decode score pass ~9 HBM passes
    (docs/PERF.md round-5, scripts/aligned_decode_probe.py)."""

    na: int
    no: int
    pad: int
    bias_init: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.na * self.no))
        bias = self.param("bias", self.bias_init, (self.na * self.no,))
        k = kernel.reshape(1, 1, cin, self.na, self.no)
        k = jnp.pad(k, ((0, 0), (0, 0), (0, 0), (0, 0), (0, self.pad - self.no)))
        k = k.reshape(1, 1, cin, self.na * self.pad)
        b = jnp.pad(bias.reshape(self.na, self.no), ((0, 0), (0, self.pad - self.no)),
                    constant_values=-20.0).reshape(self.na * self.pad)
        x, k, b = nn.dtypes.promote_dtype(x, k, b, dtype=self.dtype)
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + b


class Detect(nn.Module):
    """Per-scale 1x1 output convs; returns raw feature maps (bs, na, ny, nx, no).

    Channel order within the last conv matches the reference's
    view(bs, na, no, ny, nx) split (yolo.py:98): channel = a * no + o, so the
    .pt weight converter can reshape reference kernels directly.

    `raw_pad > 0` (serving fast path only, implies raw): emit
    (bs, ny, nx, na*raw_pad) with anchor a's channels at lanes
    [a*raw_pad, a*raw_pad+no) — the tile-aligned layout consumed by
    decode_topk_nhwc(padded_lanes=raw_pad). Param tree is unchanged.
    """

    nc: int
    na: int
    strides: tuple
    dtype: Any = jnp.float32
    raw: bool = False
    raw_pad: int = 0

    @nn.compact
    def __call__(self, xs, train: bool = False):
        no = self.nc + 5
        outs = []
        for i, x in enumerate(xs):
            if self.raw_pad:
                assert self.raw and self.raw_pad >= no, (self.raw, self.raw_pad, no)
                outs.append(_PadHeadConv(
                    na=self.na, no=no, pad=self.raw_pad,
                    bias_init=detect_bias_init(self.nc, self.na, self.strides[i]),
                    dtype=self.dtype, name=f"m{i}",
                )(x))
                continue
            x = nn.Conv(
                self.na * no,
                (1, 1),
                use_bias=True,
                bias_init=detect_bias_init(self.nc, self.na, self.strides[i]),
                dtype=self.dtype,
                name=f"m{i}",
            )(x)
            if self.raw:
                # serving fast path: NHWC (bs, ny, nx, na*no) in the compute
                # dtype — skips materializing the f32 transpose (548 MB/batch
                # at bs64/640px); decode_topk_nhwc consumes this layout.
                outs.append(x)
                continue
            bs, ny, nx, _ = x.shape
            x = x.reshape(bs, ny, nx, self.na, no).transpose(0, 3, 1, 2, 4)  # (bs,na,ny,nx,no)
            outs.append(x.astype(jnp.float32))
        return tuple(outs)


def make_grid(ny: int, nx: int, dtype=jnp.float32):
    """Cell-center grid with the -0.5 offset baked in (reference yolo.py:112-123).

    Returns (1, 1, ny, nx, 2) xy grid such that xy = (sigmoid*2 + grid) * stride.
    """
    yv, xv = jnp.meshgrid(jnp.arange(ny, dtype=dtype), jnp.arange(nx, dtype=dtype), indexing="ij")
    return jnp.stack([xv, yv], axis=-1).reshape(1, 1, ny, nx, 2) - 0.5


def decode_topk_candidates(feats, anchors, strides, k_per_scale=(256, 128, 64), conf_thres=0.25,
                           with_overflow=False):
    """Fused per-scale top-k candidate extraction straight from raw Detect feats.

    The full decode (`decode_predictions`) materializes (bs, N, no) float32
    several times (decode, conf product, candidate mask) — ~6 HBM passes over
    half a GB at bs64/640px — before NMS throws away all but a few hundred
    rows. This path computes single-label scores in one fused pass over the
    head outputs, takes a per-scale top-k on them, and decodes ONLY the
    gathered candidates (grid position reconstructed from the flat index).

    Exactly equivalent to decode_predictions + batched_nms's single-label prep
    (reference utils/general.py:630-714 semantics: conf = obj * cls_max,
    candidates require obj > conf_thres and conf > conf_thres) whenever the
    per-scale candidate count is <= k_per_scale[i]; at speed-task thresholds
    (conf 0.25, reference val.py:605-609) that holds by orders of magnitude.

    Returns (boxes_xyxy (bs, K, 4), scores (bs, K), cls_ids (bs, K)) with
    invalid slots marked score=-1, K = sum(k_per_scale). With
    `with_overflow=True` a 4th element (bs,) bool is returned, True when any
    scale had MORE above-conf candidates than its k (i.e. the top-k truncated
    a dense scene and equivalence with the full decode is not guaranteed) —
    callers fall back to the full pipeline on that signal.
    """
    def unflatten(top_i, na, ny, nx):
        # flat index runs in (anchor, y, x) order
        a_idx = top_i // (ny * nx)
        rem = top_i % (ny * nx)
        return a_idx, rem // nx, rem % nx

    def to_flat(f, na):
        bs, _, ny, nx, no = f.shape
        return f.reshape(bs, na * ny * nx, no), ny, nx

    return _decode_topk_scales(feats, anchors, strides, k_per_scale, conf_thres,
                               with_overflow, to_flat, unflatten)


def _decode_topk_scales(feats, anchors, strides, k_per_scale, conf_thres, with_overflow,
                        to_flat, unflatten):
    """Shared fused top-k decode over all scales (one pass per scale: score ->
    mask -> top-k -> decode only the gathered candidates). `to_flat(f, na) ->
    ((bs, M, no) flattened head output, ny, nx)`; `unflatten(top_i, na, ny,
    nx) -> (a_idx, y_idx, x_idx)` inverts that flat index order. Scores and
    box decode run in f32 regardless of the head dtype (per-element converts
    fuse into sigmoid/max — no full f32 copy is materialized)."""
    anchors = jnp.asarray(anchors, dtype=jnp.float32).reshape(len(feats), -1, 2)
    na = anchors.shape[1]
    boxes_all, scores_all, cls_all = [], [], []
    overflow = None
    for i, f in enumerate(feats):
        flat, ny, nx = to_flat(f, na)
        k = min(int(k_per_scale[min(i, len(k_per_scale) - 1)]), na * ny * nx)

        obj_sig = nn.sigmoid(flat[..., 4].astype(jnp.float32))
        # sigmoid is monotonic: max(sig(c)) = sig(max(c))
        cls_logit_max = jnp.max(flat[..., 5:], axis=-1).astype(jnp.float32)
        cls_arg = jnp.argmax(flat[..., 5:], axis=-1)
        score = obj_sig * nn.sigmoid(cls_logit_max)
        valid = (score > conf_thres) & (obj_sig > conf_thres)
        masked = jnp.where(valid, score, -1.0)
        if with_overflow:  # fuses into the same pass that builds `masked`
            ov = jnp.sum(valid, axis=1) > k
            overflow = ov if overflow is None else overflow | ov

        top_s, top_i = jax.lax.top_k(masked, k)  # (bs, k)
        a_idx, y_idx, x_idx = unflatten(top_i, na, ny, nx)

        txywh = jnp.take_along_axis(flat[..., :4], top_i[..., None], axis=1)  # (bs, k, 4)
        sig = nn.sigmoid(txywh.astype(jnp.float32))
        gx = x_idx.astype(jnp.float32) - 0.5
        gy = y_idx.astype(jnp.float32) - 0.5
        cx = (sig[..., 0] * 2 + gx) * strides[i]
        cy = (sig[..., 1] * 2 + gy) * strides[i]
        awh = anchors[i][a_idx]  # (bs, k, 2)
        w = (sig[..., 2] * 2) ** 2 * awh[..., 0]
        h = (sig[..., 3] * 2) ** 2 * awh[..., 1]
        boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)

        boxes_all.append(boxes)
        scores_all.append(top_s)
        cls_all.append(jnp.take_along_axis(cls_arg, top_i, axis=1).astype(jnp.float32))

    out = (
        jnp.concatenate(boxes_all, axis=1),
        jnp.concatenate(scores_all, axis=1),
        jnp.concatenate(cls_all, axis=1),
    )
    return out + (overflow,) if with_overflow else out


def decode_topk_nhwc(feats_raw, anchors, strides, k_per_scale=(256, 128, 64), conf_thres=0.25,
                     with_overflow=False, use_pallas=False, padded_lanes=0):
    """`decode_topk_candidates` for RAW NHWC head outputs ((bs, ny, nx, na*no),
    compute dtype — see Detect(raw=True)).

    The flat candidate index runs in (ny, nx, na) order here (the natural
    NHWC memory order), so no transpose of the head output is ever
    materialized; scores are computed in f32 from bf16 loads. Same candidate
    semantics as the reference (conf = obj * cls_max, both > conf_thres,
    utils/general.py:630-714). `with_overflow=True` appends a (bs,) bool
    truncation flag (see decode_topk_candidates).

    `use_pallas=True` routes the score pass through the one-read Pallas
    kernel (ops/score_pallas.py). MEASURED REJECTION — keep this off: on TPU
    at bs128/640 the kernel runs 28.3 ms/batch vs 6.25 ms for the XLA score
    pass (scripts/decode_probe.py, docs/PERF.md round-5); the per-anchor
    lane-offset slices of the 255-lane minor dim serialize on the VPU. Kept
    in-tree as the measured baseline for future layout experiments. TPU-only;
    silently falls back to the XLA path elsewhere. "interpret" runs the
    kernel in Pallas interpret mode (CPU parity tests).

    `padded_lanes=P` (e.g. 128) consumes the tile-aligned padded layout from
    Detect(raw_pad=P): (bs, ny, nx, na*P) with anchor a's no outputs at lanes
    [a*P, a*P+no). The (na, P) split of the minor dim is then tile-aligned —
    one HBM pass instead of the relayout's ~9 — and the class argmax is
    deferred to the k gathered rows. Same candidate flat order ((y, x, a))
    and semantics as the default path.
    """
    if padded_lanes:
        assert not use_pallas
        return _decode_topk_nhwc_padded(feats_raw, anchors, strides, k_per_scale,
                                        conf_thres, with_overflow, int(padded_lanes))
    if use_pallas is True and jax.default_backend() != "tpu":
        use_pallas = False
    if use_pallas:
        return _decode_topk_nhwc_pallas(feats_raw, anchors, strides, k_per_scale,
                                        conf_thres, with_overflow,
                                        interpret=use_pallas == "interpret")

    def unflatten(top_i, na, ny, nx):
        # flat index runs in (y, x, anchor) order — natural NHWC memory order
        return top_i % na, top_i // (na * nx), (top_i // na) % nx

    def to_flat(f, na):
        bs, ny, nx, ch = f.shape
        # free reshape; stays in compute dtype (no transpose is materialized)
        return f.reshape(bs, ny * nx * na, ch // na), ny, nx

    return _decode_topk_scales(feats_raw, anchors, strides, k_per_scale, conf_thres,
                               with_overflow, to_flat, unflatten)


def _decode_topk_nhwc_padded(feats_raw, anchors, strides, k_per_scale, conf_thres,
                             with_overflow, pad):
    """Decode from the 128-lane-aligned padded head layout (Detect(raw_pad)).

    Two departures from `_decode_topk_scales`, both enabled by the layout:
    the (bs, M, na, pad) view is a free tile-aligned reshape (no relayout
    pass), and the class argmax runs only on the k gathered rows instead of
    all M*na (it is NOT free when the max can't fuse with it). Candidate
    semantics and flat order ((y, x, a)) match the default path exactly."""
    anchors = jnp.asarray(anchors, dtype=jnp.float32).reshape(len(feats_raw), -1, 2)
    na = anchors.shape[1]
    boxes_all, scores_all, cls_all = [], [], []
    overflow = None
    for i, f in enumerate(feats_raw):
        bs, ny, nx, ch = f.shape
        assert ch % pad == 0 and ch // pad == na, (f.shape, pad, na)
        m = ny * nx
        k = min(int(k_per_scale[min(i, len(k_per_scale) - 1)]), na * m)

        v = f.reshape(bs, m, na, pad)  # free tile-aligned view
        obj_sig = nn.sigmoid(v[..., 4].astype(jnp.float32))  # (bs, M, na)
        # pad lanes hold -20 logits (sigmoid ~ 2e-9): they can never win the
        # max over real class logits from a trained/bias-initialized head,
        # and even if every real logit were below -20 the resulting score
        # cannot pass conf_thres > 0 — so reducing over [5:pad) is exact.
        cls_logit_max = jnp.max(v[..., 5:], axis=-1).astype(jnp.float32)
        score = obj_sig * nn.sigmoid(cls_logit_max)
        valid = (score > conf_thres) & (obj_sig > conf_thres)
        masked = jnp.where(valid, score, -1.0).reshape(bs, m * na)  # (y,x,a) order
        if with_overflow:
            ov = jnp.sum(valid.reshape(bs, m * na), axis=1) > k
            overflow = ov if overflow is None else overflow | ov

        top_s, top_i = jax.lax.top_k(masked, k)  # (bs, k)
        a_idx = top_i % na
        yx = top_i // na
        y_idx = yx // nx
        x_idx = yx % nx

        flat = f.reshape(bs, m * na, pad)  # free: row r = (y, x, a) flat index
        sel = jnp.take_along_axis(flat, top_i[..., None], axis=1)  # (bs, k, pad)
        sig = nn.sigmoid(sel[..., :4].astype(jnp.float32))
        carg = jnp.argmax(sel[..., 5:], axis=-1)  # deferred to the k rows
        gx = x_idx.astype(jnp.float32) - 0.5
        gy = y_idx.astype(jnp.float32) - 0.5
        cx = (sig[..., 0] * 2 + gx) * strides[i]
        cy = (sig[..., 1] * 2 + gy) * strides[i]
        awh = anchors[i][a_idx]  # (bs, k, 2)
        w = (sig[..., 2] * 2) ** 2 * awh[..., 0]
        h = (sig[..., 3] * 2) ** 2 * awh[..., 1]
        boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)

        boxes_all.append(boxes)
        scores_all.append(top_s)
        cls_all.append(carg.astype(jnp.float32))

    out = (
        jnp.concatenate(boxes_all, axis=1),
        jnp.concatenate(scores_all, axis=1),
        jnp.concatenate(cls_all, axis=1),
    )
    return out + (overflow,) if with_overflow else out


def _decode_topk_nhwc_pallas(feats_raw, anchors, strides, k_per_scale, conf_thres,
                             with_overflow, interpret=False):
    """Pallas-backed decode: same candidates/boxes as the XLA path, but the
    score+mask+argmax pass is ONE read of the head tensor (see
    ops/score_pallas.py). The kernel's flat candidate order is (a, y, x)
    (anchor-major, chosen so the top_k input keeps a wide minor dim); the
    box/class gathers re-index into the natural (y, x, a) flat layout."""
    from yolov3_tpu.ops.score_pallas import masked_scores_pallas

    anchors = jnp.asarray(anchors, dtype=jnp.float32).reshape(len(feats_raw), -1, 2)
    na = anchors.shape[1]
    boxes_all, scores_all, cls_all = [], [], []
    overflow = None
    for i, f in enumerate(feats_raw):
        bs, ny, nx, ch = f.shape
        no = ch // na
        k = min(int(k_per_scale[min(i, len(k_per_scale) - 1)]), na * ny * nx)

        scores2, args2 = masked_scores_pallas(
            f.reshape(bs, ny * nx, ch), na, no, float(conf_thres), interpret=interpret
        )  # (bs, na, ny*nx) f32 / int32
        masked = scores2.reshape(bs, na * ny * nx)  # (a, y, x) flat order
        if with_overflow:
            ov = jnp.sum(masked > 0.0, axis=1) > k  # valid <=> score stored (> conf >= 0)
            overflow = ov if overflow is None else overflow | ov

        top_s, top_i = jax.lax.top_k(masked, k)  # (bs, k)
        a_idx = top_i // (ny * nx)
        yx = top_i % (ny * nx)
        y_idx = yx // nx
        x_idx = yx % nx

        flat = f.reshape(bs, ny * nx * na, no)  # free: (y, x, a) flat order
        txywh = jnp.take_along_axis(flat[..., :4], (yx * na + a_idx)[..., None], axis=1)
        sig = nn.sigmoid(txywh.astype(jnp.float32))
        gx = x_idx.astype(jnp.float32) - 0.5
        gy = y_idx.astype(jnp.float32) - 0.5
        cx = (sig[..., 0] * 2 + gx) * strides[i]
        cy = (sig[..., 1] * 2 + gy) * strides[i]
        awh = anchors[i][a_idx]  # (bs, k, 2)
        w = (sig[..., 2] * 2) ** 2 * awh[..., 0]
        h = (sig[..., 3] * 2) ** 2 * awh[..., 1]
        boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)

        boxes_all.append(boxes)
        scores_all.append(top_s)
        cls_all.append(jnp.take_along_axis(args2.reshape(bs, na * ny * nx), top_i,
                                           axis=1).astype(jnp.float32))

    out = (
        jnp.concatenate(boxes_all, axis=1),
        jnp.concatenate(scores_all, axis=1),
        jnp.concatenate(cls_all, axis=1),
    )
    return out + (overflow,) if with_overflow else out


def decode_predictions(feats, anchors, strides):
    """Decode raw Detect features to (bs, sum(na*ny*nx), no) xywh+obj+cls.

    Math parity with reference yolo.py:104-107:
      xy = (sigmoid(t_xy) * 2 + grid) * stride
      wh = (sigmoid(t_wh) * 2)^2 * anchor_px
      conf = sigmoid(t_conf)

    Args:
        feats: list of (bs, na, ny, nx, no) raw head outputs.
        anchors: (nl, na, 2) pixel anchors (NOT grid-normalized).
        strides: per-scale strides.
    """
    anchors = jnp.asarray(anchors, dtype=jnp.float32).reshape(len(feats), -1, 2)
    z = []
    for i, f in enumerate(feats):
        bs, na, ny, nx, no = f.shape
        sig = nn.sigmoid(f.astype(jnp.float32))
        grid = make_grid(ny, nx)
        xy = (sig[..., :2] * 2 + grid) * strides[i]
        wh = (sig[..., 2:4] * 2) ** 2 * anchors[i].reshape(1, na, 1, 1, 2)
        y = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
        z.append(y.reshape(bs, na * ny * nx, no))
    return jnp.concatenate(z, axis=1)
