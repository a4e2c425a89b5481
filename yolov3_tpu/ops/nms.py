"""Fixed-shape batched NMS for TPU.

Re-designs the reference's dynamic-shape NMS pipeline (reference
utils/general.py:630-750, which funnels into torchvision.ops.nms) as a
static-shape XLA program:

  1. conf = obj * cls (general.py:702), candidate masking at `conf_thres`,
     best-class or multi-label expansion (general.py:709-714);
  2. top-`max_nms` prefilter by score (general.py:727);
  3. exact greedy NMS as a `max_det`-step argmax+suppress loop. Greedy NMS
     selects surviving boxes in descending score order, so selecting the
     argmax of the not-yet-suppressed set each step reproduces torchvision's
     sequential semantics exactly — in max_det * O(K) vector work instead of
     a data-dependent loop, with no O(K^2) IoU matrix.

Class-aware suppression uses the same class-offset trick (c * 7680,
general.py:731-733). Everything is jit-compatible with static shapes; the
host-facing `non_max_suppression` mirrors the reference's list-of-(n,6)
return convention.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.ops.boxes import xywh2xyxy

MAX_WH = 7680  # maximum box width/height used for the class offset


def _iou_1_vs_many(box, boxes, eps=1e-7):
    """IoU of one xyxy box (4,) against (K,4)."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:4], boxes[:, 2:4])
    wh = jnp.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    area2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area1 + area2 - inter + eps)


def _greedy_nms(boxes_off, boxes, scores, cls_ids, iou_thres, max_det):
    """Greedy NMS over K prefiltered candidates. scores < 0 mark invalid slots.

    Returns (out (max_det, 6), n_valid). Rows are [x1,y1,x2,y2,conf,cls] in
    descending score order; unused rows are zero.
    """
    K = scores.shape[0]

    def step(state):
        t, scores_t, out = state
        i = jnp.argmax(scores_t)
        s = scores_t[i]
        valid = s > 0.0
        row = jnp.concatenate([boxes[i], jnp.array([1.0], scores.dtype) * s, cls_ids[i][None]])
        out = out.at[t].set(jnp.where(valid, row, jnp.zeros(6, dtype=out.dtype)))
        iou = _iou_1_vs_many(boxes_off[i], boxes_off)
        suppress = (iou > iou_thres) & valid
        scores_t = jnp.where(suppress, -1.0, scores_t)
        scores_t = scores_t.at[i].set(-1.0)
        return t + 1, scores_t, out

    out0 = jnp.zeros((max_det, 6), dtype=scores.dtype)
    n_steps = min(max_det, K)
    # while-loop with early exit: stops once no positive-score candidate
    # remains (real images produce far fewer than max_det detections)
    _, _, out = jax.lax.while_loop(
        lambda st: (st[0] < n_steps) & (jnp.max(st[1]) > 0.0),
        step,
        (jnp.int32(0), scores, out0),
    )
    n_valid = jnp.sum(out[:, 4] > 0).astype(jnp.int32)
    return out, n_valid


def _shard_mapped_pallas_nms(mesh, boxes_off, boxes, scores, cls_ids,
                             iou_thres, max_det, grid_batch, interpret):
    """Run the Pallas kernel under GSPMD by shard_mapping it over the mesh's
    "data" axis: batched NMS is embarrassingly parallel across images, so each
    device runs the kernel on its local batch rows and the outputs come back
    batch-sharded — no fallback to the XLA loop on sharded val/serving paths
    (GSPMD itself cannot partition a pallas_call)."""
    from jax.sharding import PartitionSpec

    from yolov3_tpu.ops.nms_pallas import pallas_greedy_nms

    p = PartitionSpec("data")
    fn = jax.shard_map(
        functools.partial(
            pallas_greedy_nms, iou_thres=iou_thres, max_det=max_det,
            grid_batch=grid_batch, interpret=interpret,
        ),
        mesh=mesh, in_specs=(p, p, p, p), out_specs=(p, p),
        # pallas_call's out_shape carries no varying-manual-axes metadata
        check_vma=False,
    )
    return fn(boxes_off, boxes, scores, cls_ids)


def _resolve_pallas(use_pallas, spmd_mesh, bs, k_cand):
    """Shared gating: the kernel only lowers on TPU (interpret mode excepted),
    a single image's planes must fit VMEM, and under a mesh the batch must
    divide across the data axis (validator/serve route tail batches to the
    unsharded program already)."""
    if use_pallas is True and jax.default_backend() != "tpu":
        return False
    if use_pallas and k_cand * 44 > 11 * 2**20:
        return False
    if use_pallas and spmd_mesh is not None and bs % spmd_mesh.shape["data"]:
        return False
    return use_pallas


@functools.partial(
    jax.jit,
    static_argnames=(
        "conf_thres", "iou_thres", "classes", "agnostic", "multi_label", "max_det", "max_nms", "merge", "use_pallas",
        "spmd_mesh",
    ),
)
def batched_nms(
    prediction,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    classes: tuple | None = None,
    agnostic: bool = False,
    multi_label: bool = False,
    max_det: int = 300,
    max_nms: int = 30000,
    merge: bool = False,
    use_pallas: bool = False,
    spmd_mesh=None,
):
    """Jittable batched NMS.

    Args:
        prediction: (bs, N, 5+nc) raw decoded predictions [xywh, obj, cls...].
        conf_thres/iou_thres/classes/agnostic/multi_label/max_det: reference
            semantics (utils/general.py:630-642).
        max_nms: top-k prefilter size fed to the suppression loop.
        merge: weighted-mean merge-NMS (general.py:735-741).

    Returns:
        out: (bs, max_det, 6) [xyxy, conf, cls], zero-padded.
        n_valid: (bs,) number of valid rows per image.
    """
    prediction = prediction.astype(jnp.float32)
    bs, n, no = prediction.shape
    nc = no - 5

    def prep(x):
        """Candidate extraction + top-k prefilter for one image."""
        box = xywh2xyxy(x[:, :4])  # (N,4)
        obj = x[:, 4]
        cls_scores = x[:, 5:] * obj[:, None]  # conf = obj * cls

        if multi_label and nc > 1:
            # flatten (N, nc) candidates; boxes indexed via box_idx, not materialized
            scores = cls_scores.reshape(-1)  # (N*nc,)
            cls_ids = jnp.tile(jnp.arange(nc, dtype=jnp.float32), n)
            box_idx = jnp.repeat(jnp.arange(n), nc)
            valid = (scores > conf_thres) & (obj[box_idx] > conf_thres)
        else:
            conf = jnp.max(cls_scores, axis=1)
            j = jnp.argmax(cls_scores, axis=1)
            scores = conf
            cls_ids = j.astype(jnp.float32)
            box_idx = jnp.arange(n)
            valid = (scores > conf_thres) & (obj > conf_thres)

        if classes is not None:
            cls_allowed = jnp.zeros((nc,), dtype=bool).at[jnp.array(classes)].set(True)
            valid &= cls_allowed[cls_ids.astype(jnp.int32)]

        masked_scores = jnp.where(valid, scores, -1.0)
        k = min(max_nms, masked_scores.shape[0])
        top_scores, top_i = jax.lax.top_k(masked_scores, k)
        top_box = box[box_idx[top_i]]
        top_cls = cls_ids[top_i]
        offset = jnp.where(agnostic, 0.0, top_cls * MAX_WH)
        top_box_off = top_box + offset[:, None]
        return top_box_off, top_box, top_scores, top_cls

    boxes_off_b, boxes_b, scores_b, cls_b = jax.vmap(prep)(prediction)

    # the whole-batch-resident Pallas kernel keeps all (B, K) operands in VMEM
    # (~16 MB/core budget, ~11 f32 planes of B*K); past that the kernel grids
    # over images instead (per-image planes: K*44 bytes — 1.3 MB at the
    # val-grade max_nms=30000), so the val regime runs in Pallas too. Only a
    # K too large for a single image's planes (>~250k candidates) falls back
    # to the XLA loop.
    k_cand = min(max_nms, n * nc if (multi_label and nc > 1) else n)
    use_pallas = _resolve_pallas(use_pallas, spmd_mesh, bs, k_cand)
    bs_local = bs // spmd_mesh.shape["data"] if (use_pallas and spmd_mesh is not None) else bs
    grid_batch = bs_local * k_cand * 44 > 12 * 2**20
    if use_pallas and spmd_mesh is not None:
        out_b, n_valid_b = _shard_mapped_pallas_nms(
            spmd_mesh, boxes_off_b, boxes_b, scores_b, cls_b, iou_thres, max_det,
            grid_batch, use_pallas == "interpret")
    elif use_pallas:
        from yolov3_tpu.ops.nms_pallas import pallas_greedy_nms

        # use_pallas="interpret" runs the kernel in Pallas interpret mode —
        # lets CPU tests exercise the full prep+kernel path end-to-end
        out_b, n_valid_b = pallas_greedy_nms(boxes_off_b, boxes_b, scores_b, cls_b, iou_thres, max_det,
                                             grid_batch=grid_batch, interpret=use_pallas == "interpret")
    else:
        out_b, n_valid_b = jax.vmap(lambda bo, bx, s, c: _greedy_nms(bo, bx, s, c, iou_thres, max_det))(
            boxes_off_b, boxes_b, scores_b, cls_b
        )

    if merge:
        # boxes(i,4) = weights(i,K) * boxes(K,4) / sum(weights), then drop
        # non-redundant detections (kept boxes overlapping no other candidate)
        # — reference general.py:735-742 incl. the `redundant` filter and the
        # 1 < n < 3e3 gate on the pre-NMS candidate count
        def merge_one(out, top_box_off, top_box, top_scores):
            valid_cand = top_scores > 0
            n_cand = valid_cand.sum()
            sel_off = out[:, :4] + jnp.where(agnostic, 0.0, out[:, 5:6] * MAX_WH)
            lt = jnp.maximum(sel_off[:, None, :2], top_box_off[None, :, :2])
            rb = jnp.minimum(sel_off[:, None, 2:4], top_box_off[None, :, 2:4])
            wh = jnp.clip(rb - lt, 0, None)
            inter = wh[..., 0] * wh[..., 1]
            a1 = (sel_off[:, 2] - sel_off[:, 0]) * (sel_off[:, 3] - sel_off[:, 1])
            a2 = (top_box_off[:, 2] - top_box_off[:, 0]) * (top_box_off[:, 3] - top_box_off[:, 1])
            iou = inter / (a1[:, None] + a2[None, :] - inter + 1e-7)
            ov = (iou > iou_thres) & valid_cand[None, :]  # (max_det, K)
            w = ov * jnp.clip(top_scores, 0.0, None)[None, :]
            merged = (w @ top_box) / jnp.clip(w.sum(1, keepdims=True), 1e-7, None)
            has = out[:, 4] > 0
            do = (n_cand > 1) & (n_cand < 3000)
            out = out.at[:, :4].set(jnp.where((do & has)[:, None], merged, out[:, :4]))
            # redundant filter: a kept box must overlap >1 candidate (itself
            # counts once); compact survivors to the front (rows stay
            # score-sorted valid-first — the n-first fetch invariant)
            keep = has & jnp.where(do, ov.sum(1) > 1, True)
            order = jnp.argsort(~keep, stable=True)
            out = out[order] * keep[order][:, None]
            return out, keep.sum().astype(n_valid_b.dtype)

        out_b, n_valid_b = jax.vmap(merge_one)(out_b, boxes_off_b, boxes_b, scores_b)

    return out_b, n_valid_b


def nms_from_candidates(
    boxes, scores, cls_ids, iou_thres=0.45, max_det=300, agnostic=False, use_pallas=False,
    spmd_mesh=None,
):
    """Greedy NMS over pre-extracted candidates (bs, K, ...) — the fused fast
    path fed by `decode_topk_candidates`, skipping `batched_nms`'s full-tensor
    prep. Invalid slots are marked by scores < 0. Same class-offset trick and
    greedy semantics as `batched_nms` (reference general.py:731-733).
    `spmd_mesh` keeps the Pallas kernel on sharded (GSPMD) serving paths via
    shard_map over the data axis.

    Returns (out (bs, max_det, 6), n_valid (bs,)).
    """
    offset = jnp.where(agnostic, 0.0, cls_ids * MAX_WH)
    boxes_off = boxes + offset[..., None]
    scores = jnp.where(scores > 0, scores, -1.0)
    use_pallas = _resolve_pallas(use_pallas, spmd_mesh, boxes.shape[0], boxes.shape[1])
    if use_pallas and spmd_mesh is not None:
        return _shard_mapped_pallas_nms(
            spmd_mesh, boxes_off, boxes, scores, cls_ids, iou_thres, max_det,
            False, use_pallas == "interpret")
    if use_pallas:
        from yolov3_tpu.ops.nms_pallas import pallas_greedy_nms

        return pallas_greedy_nms(boxes_off, boxes, scores, cls_ids, iou_thres, max_det,
                                 interpret=use_pallas == "interpret")
    return jax.vmap(lambda bo, bx, s, c: _greedy_nms(bo, bx, s, c, iou_thres, max_det))(
        boxes_off, boxes, scores, cls_ids
    )


def _inject_apriori_labels(pred: np.ndarray, labels) -> np.ndarray:
    """Append apriori label rows as perfect-confidence candidates
    (hybrid autolabelling, reference general.py:689-695)."""
    nc = pred.shape[2] - 5
    extra = max(len(lb) for lb in labels)
    pads = []
    for lb in labels:
        v = np.zeros((extra, 5 + nc), dtype=np.float32)
        if len(lb):
            lb = np.asarray(lb, dtype=np.float32)
            v[: len(lb), :4] = lb[:, 1:5]
            v[: len(lb), 4] = 1.0
            v[np.arange(len(lb)), lb[:, 0].astype(int) + 5] = 1.0
        pads.append(v)
    return np.concatenate([pred, np.stack(pads)], axis=1)


def _native_nms(prediction, conf_thres, iou_thres, classes, agnostic,
                multi_label, max_det, max_nms):
    """Candidate prep in numpy + the C++ greedy loop (yolov3_tpu.native).

    Exact-equality contract with `batched_nms` (tested in tests/test_native.py):
    same conf = obj*cls candidates, same top-`max_nms` prefilter with
    first-index tie-break, same class-offset greedy suppression.
    """
    from yolov3_tpu import native

    pred = np.asarray(prediction, dtype=np.float32)
    bs, n, no = pred.shape
    nc = no - 5
    box = np.asarray(xywh2xyxy(pred[..., :4]))
    obj = pred[..., 4]
    cls_scores = pred[..., 5:] * obj[..., None]

    if multi_label and nc > 1:
        scores = cls_scores.reshape(bs, -1)
        cls_ids = np.tile(np.arange(nc, dtype=np.float32), n)
        box_idx = np.repeat(np.arange(n), nc)
        valid = (scores > conf_thres) & (obj[:, box_idx] > conf_thres)
        cls_ids = np.broadcast_to(cls_ids, scores.shape)
    else:
        scores = cls_scores.max(axis=2)
        cls_ids = cls_scores.argmax(axis=2).astype(np.float32)
        box_idx = np.arange(n)
        valid = (scores > conf_thres) & (obj > conf_thres)
    if classes is not None:
        allowed = np.zeros(nc, bool)
        allowed[np.asarray(classes, int)] = True
        valid &= allowed[cls_ids.astype(int)]

    masked = np.where(valid, scores, -1.0)
    k = min(max_nms, masked.shape[1])
    # stable descending sort == lax.top_k ordering (ties -> lowest index first)
    order = np.argsort(-masked, axis=1, kind="stable")[:, :k]
    top_scores = np.take_along_axis(masked, order, axis=1)
    rows = np.arange(bs)[:, None]
    top_box = box[rows, box_idx[order]]
    top_cls = np.take_along_axis(cls_ids, order, axis=1)
    offset = np.zeros_like(top_cls) if agnostic else top_cls * MAX_WH
    out, n_valid = native.greedy_nms_batch(
        top_box + offset[..., None], top_box, top_scores, top_cls,
        iou_thres=iou_thres, max_det=max_det,
    )
    return [out[i, : n_valid[i]] for i in range(bs)]


def non_max_suppression(
    prediction,
    conf_thres=0.25,
    iou_thres=0.45,
    classes=None,
    agnostic=False,
    multi_label=False,
    labels=(),
    max_det=300,
    max_nms=30000,
    merge=False,
    engine="auto",
):
    """Host-facing NMS mirroring the reference's list-of-(n,6) ndarray output.

    Accepts (bs, N, 5+nc) arrays (or the (inference, train_out) tuple the model
    returns in val mode, reference general.py:663-664). Optional `labels`
    injects apriori boxes for hybrid autolabelling (general.py:689-695).

    `engine`: "xla" (jitted `batched_nms`), "native" (C++ greedy loop — the
    in-tree analog of torchvision's C++ NMS kernel, reference general.py:733),
    or "auto" — native for host-resident numpy predictions (CPU serving
    backends, where an XLA compile per shape is wasted), XLA otherwise.
    merge-NMS always runs on the XLA path (no native implementation).
    """
    if isinstance(prediction, (list, tuple)):
        prediction = prediction[0]
    use_native = engine == "native"
    if engine == "auto" and isinstance(prediction, np.ndarray) and not merge:
        from yolov3_tpu import native

        use_native = native.available()
    if use_native and not merge:
        pred = np.asarray(prediction, dtype=np.float32)
        if labels and any(len(lb) for lb in labels):
            pred = _inject_apriori_labels(pred, labels)
        return _native_nms(
            pred, float(conf_thres), float(iou_thres), classes, bool(agnostic),
            bool(multi_label), int(max_det), int(max_nms),
        )
    prediction = jnp.asarray(prediction)
    nc = prediction.shape[2] - 5

    if labels and any(len(lb) for lb in labels):
        prediction = jnp.asarray(_inject_apriori_labels(np.asarray(prediction), labels))

    out, n_valid = batched_nms(
        prediction,
        conf_thres=float(conf_thres),
        iou_thres=float(iou_thres),
        classes=tuple(classes) if classes is not None else None,
        agnostic=bool(agnostic),
        multi_label=bool(multi_label),
        max_det=int(max_det),
        max_nms=int(max_nms),
        merge=bool(merge),
    )
    out = np.asarray(out)
    n_valid = np.asarray(n_valid)
    return [out[i, : n_valid[i]] for i in range(out.shape[0])]
