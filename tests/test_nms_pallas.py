"""Pallas NMS kernel vs the XLA greedy loop (interpret mode on CPU)."""

import numpy as np
import pytest

import jax

from yolov3_tpu.ops.nms import _greedy_nms
from yolov3_tpu.ops.nms_pallas import pallas_greedy_nms


def make_candidates(rng, B=2, K=256):
    xy = rng.uniform(50, 600, size=(B, K, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, size=(B, K, 2)).astype(np.float32)
    boxes = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    scores = rng.uniform(0.25, 1.0, size=(B, K)).astype(np.float32)
    scores[:, K // 2 :] = -1.0  # invalid tail (as after top-k masking)
    order = np.argsort(-scores, axis=1)
    scores = np.take_along_axis(scores, order, axis=1)
    boxes = np.take_along_axis(boxes, order[..., None], axis=1)
    cls = rng.integers(0, 3, size=(B, K)).astype(np.float32)
    boxes_off = boxes + cls[..., None] * 7680.0
    return boxes_off, boxes, scores, cls


def test_pallas_matches_xla_loop(rng):
    boxes_off, boxes, scores, cls = make_candidates(rng)
    out_p, n_p = pallas_greedy_nms(boxes_off, boxes, scores, cls, iou_thres=0.5, max_det=50, interpret=True)
    out_x, n_x = jax.vmap(lambda bo, bx, s, c: _greedy_nms(bo, bx, s, c, 0.5, 50))(
        boxes_off, boxes, scores, cls
    )
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-5, atol=1e-4)


def test_pallas_empty(rng):
    boxes_off, boxes, scores, cls = make_candidates(rng)
    scores[:] = -1.0
    out, n = pallas_greedy_nms(boxes_off, boxes, scores, cls, iou_thres=0.5, max_det=20, interpret=True)
    assert (np.asarray(n) == 0).all()
    assert (np.asarray(out) == 0).all()


def test_batched_nms_pallas_flag(rng):
    """batched_nms(use_pallas=True) == batched_nms(use_pallas=False) in interpret-capable env."""
    from yolov3_tpu.ops.nms import batched_nms

    pred = rng.uniform(0, 1, size=(2, 128, 8)).astype(np.float32)
    pred[..., :2] *= 640
    pred[..., 2:4] = pred[..., 2:4] * 100 + 5
    base_out, base_n = batched_nms(pred, conf_thres=0.3, iou_thres=0.5, max_det=20)
    # pallas path in interpret mode (monkeypatch through the kernel's flag)
    from yolov3_tpu.ops import nms_pallas

    out_p, n_p = nms_pallas.pallas_greedy_nms.__wrapped__(  # bypass jit to force interpret
        *_prep_via_public(pred), iou_thres=0.5, max_det=20, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(base_n), np.asarray(n_p))
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(out_p), rtol=1e-5, atol=1e-4)


def _prep_via_public(pred):
    """Re-run the public candidate prep (conf=0.3) to feed the kernel directly."""
    import jax.numpy as jnp

    from yolov3_tpu.ops.boxes import xywh2xyxy
    from yolov3_tpu.ops.nms import MAX_WH

    pred = jnp.asarray(pred)
    box = xywh2xyxy(pred[..., :4])
    obj = pred[..., 4]
    cls_scores = pred[..., 5:] * obj[..., None]
    conf = jnp.max(cls_scores, axis=-1)
    cls = jnp.argmax(cls_scores, axis=-1).astype(jnp.float32)
    valid = (conf > 0.3) & (obj > 0.3)
    scores = jnp.where(valid, conf, -1.0)
    order = jnp.argsort(-scores, axis=1)
    scores = jnp.take_along_axis(scores, order, axis=1)
    box = jnp.take_along_axis(box, order[..., None], axis=1)
    cls = jnp.take_along_axis(cls, order, axis=1)
    box_off = box + (cls * MAX_WH)[..., None]
    return box_off, box, scores, cls


def test_grid_batch_matches_resident(rng):
    """grid_batch (one program per image) must be row-identical to the
    whole-batch-resident kernel and the XLA loop."""
    boxes_off, boxes, scores, cls = make_candidates(rng, B=3, K=256)
    out_g, n_g = pallas_greedy_nms(boxes_off, boxes, scores, cls, iou_thres=0.5,
                                   max_det=50, interpret=True, grid_batch=True)
    out_x, n_x = jax.vmap(lambda bo, bx, s, c: _greedy_nms(bo, bx, s, c, 0.5, 50))(
        boxes_off, boxes, scores, cls
    )
    np.testing.assert_array_equal(np.asarray(n_g), np.asarray(n_x))
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_x), rtol=1e-5, atol=1e-4)


def test_grid_batch_val_grade_matches_xla(rng):
    """Val-grade shapes (max_nms=30000, max_det=300, dense overlapping
    candidates): the gridded kernel that eval/validator.py uses on TPU must be
    row-exact vs the XLA loop (reference val.py:196-199 NMS settings)."""
    B, K = 2, 30000
    n_real = 4000
    centers = rng.uniform(100, 540, size=(B, 40, 2)).astype(np.float32)
    pick = rng.integers(0, 40, size=(B, n_real))
    xy = np.take_along_axis(centers, pick[..., None], axis=1) + rng.normal(0, 6, (B, n_real, 2))
    wh = rng.uniform(30, 90, size=(B, n_real, 2)).astype(np.float32)
    boxes = np.zeros((B, K, 4), np.float32)
    boxes[:, :n_real] = np.concatenate([xy - wh / 2, xy + wh / 2], axis=-1)
    scores = np.full((B, K), -1.0, np.float32)
    scores[:, :n_real] = rng.uniform(0.001, 1.0, size=(B, n_real))
    order = np.argsort(-scores, axis=1)
    scores = np.take_along_axis(scores, order, axis=1)
    boxes = np.take_along_axis(boxes, order[..., None], axis=1)
    cls = rng.integers(0, 80, size=(B, K)).astype(np.float32)
    boxes_off = boxes + cls[..., None] * 7680.0

    out_g, n_g = pallas_greedy_nms(boxes_off, boxes, scores, cls, iou_thres=0.6,
                                   max_det=300, interpret=True, grid_batch=True)
    out_x, n_x = jax.vmap(lambda bo, bx, s, c: _greedy_nms(bo, bx, s, c, 0.6, 300))(
        boxes_off, boxes, scores, cls
    )
    np.testing.assert_array_equal(np.asarray(n_g), np.asarray(n_x))
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(out_x), rtol=1e-5, atol=1e-4)
