"""Unit tests for box geometry ops against hand-computed values."""

import numpy as np
import pytest

from yolov3_tpu.ops import boxes as B


def test_xyxy_xywh_roundtrip(rng):
    x = rng.uniform(0, 600, size=(50, 4)).astype(np.float32)
    x[:, 2:] = x[:, :2] + np.abs(x[:, 2:]) / 4 + 1  # valid xyxy
    xywh = B.xyxy2xywh(x)
    back = B.xywh2xyxy(xywh)
    np.testing.assert_allclose(back, x, rtol=1e-5, atol=1e-4)


def test_xywh2xyxy_known():
    x = np.array([[10.0, 10.0, 4.0, 6.0]])
    np.testing.assert_allclose(B.xywh2xyxy(x), [[8.0, 7.0, 12.0, 13.0]])


def test_xywhn2xyxy_known():
    x = np.array([[0.5, 0.5, 0.5, 0.5]])
    np.testing.assert_allclose(B.xywhn2xyxy(x, w=100, h=200), [[25.0, 50.0, 75.0, 150.0]])
    # with letterbox pad offsets
    np.testing.assert_allclose(B.xywhn2xyxy(x, w=100, h=200, padw=3, padh=7), [[28.0, 57.0, 78.0, 157.0]])


def test_extra_columns_preserved():
    x = np.array([[8.0, 7.0, 12.0, 13.0, 0.9, 3.0]])
    out = B.xyxy2xywh(x)
    np.testing.assert_allclose(out, [[10.0, 10.0, 4.0, 6.0, 0.9, 3.0]])


def test_box_iou_known():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[0.0, 0.0, 10.0, 10.0], [5.0, 5.0, 15.0, 15.0], [20.0, 20.0, 30.0, 30.0]])
    iou = np.asarray(B.box_iou(a, b))
    np.testing.assert_allclose(iou[0], [1.0, 25.0 / 175.0, 0.0], atol=1e-6)


def test_bbox_iou_matches_box_iou_on_aligned(rng):
    a = rng.uniform(0, 100, size=(20, 4)).astype(np.float32)
    a[:, 2:] = a[:, :2] + rng.uniform(5, 50, size=(20, 2)).astype(np.float32)
    b = rng.uniform(0, 100, size=(20, 4)).astype(np.float32)
    b[:, 2:] = b[:, :2] + rng.uniform(5, 50, size=(20, 2)).astype(np.float32)
    elementwise = np.asarray(B.bbox_iou(a, b, xywh=False))
    pairwise = np.asarray(B.box_iou(a, b))
    np.testing.assert_allclose(elementwise, np.diag(pairwise), rtol=1e-5, atol=1e-5)


def test_ciou_identical_boxes_is_one():
    a = np.array([[10.0, 10.0, 4.0, 6.0]])
    ciou = np.asarray(B.bbox_iou(a, a, xywh=True, CIoU=True))
    np.testing.assert_allclose(ciou, [1.0], atol=1e-5)


def test_ciou_less_than_iou_when_offset():
    a = np.array([[10.0, 10.0, 4.0, 6.0]])
    b = np.array([[12.0, 11.0, 4.0, 6.0]])
    iou = np.asarray(B.bbox_iou(a, b)).item()
    ciou = np.asarray(B.bbox_iou(a, b, CIoU=True)).item()
    assert ciou < iou  # center-distance penalty


def test_scale_boxes_letterbox_roundtrip():
    # native 480x640 image letterboxed into 640x640 => gain=1.0? no: min(640/480,640/640)=1.0
    # use a real downscale: native (720, 1280) -> (384, 640): gain = min(384/720, 640/1280)=0.5|0.533
    img0 = (720, 1280)
    img1 = (384, 640)
    gain = min(img1[0] / img0[0], img1[1] / img0[1])
    pad = ((img1[1] - img0[1] * gain) / 2, (img1[0] - img0[0] * gain) / 2)
    native = np.array([[100.0, 200.0, 500.0, 600.0]])
    lb = native * gain
    lb[:, [0, 2]] += pad[0]
    lb[:, [1, 3]] += pad[1]
    back = np.asarray(B.scale_boxes(img1, lb, img0))
    np.testing.assert_allclose(back, native, atol=1e-3)


def test_clip_boxes():
    x = np.array([[-5.0, -5.0, 700.0, 700.0]])
    out = np.asarray(B.clip_boxes(x, (480, 640)))
    np.testing.assert_allclose(out, [[0.0, 0.0, 640.0, 480.0]])


def test_wh_iou():
    wh1 = np.array([[4.0, 4.0]])
    wh2 = np.array([[4.0, 4.0], [2.0, 2.0], [8.0, 8.0]])
    iou = np.asarray(B.wh_iou(wh1, wh2))
    np.testing.assert_allclose(iou[0], [1.0, 0.25, 0.25], atol=1e-6)


@pytest.mark.parametrize("fn", [B.xyxy2xywh, B.xywh2xyxy])
def test_jnp_and_np_agree(fn, rng):
    import jax.numpy as jnp

    x = rng.uniform(1, 100, size=(10, 4)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fn(jnp.asarray(x))), fn(x), rtol=1e-6)
