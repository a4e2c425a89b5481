"""Shim self-verification (VERDICT r2 #8): the parity oracle's shimmed
`ultralytics` symbols (tests/ultralytics_shim.py) pinned against hand-computed
values, so the loss/NMS cross-framework parity claims can't silently rot on a
shim bug. Formulas: IoU by areas; GIoU (Rezatofighi 2019); DIoU/CIoU (Zheng
2020) with v = 4/pi^2 (atan(w2/h2) - atan(w1/h1))^2, alpha = v/(v - iou + 1).
"""

import math
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
sys.path.insert(0, str(Path(__file__).parent))
import ultralytics_shim as shim  # noqa: E402

from ultralytics.utils.metrics import bbox_iou, box_iou  # noqa: E402
from ultralytics.utils.ops import xywh2xyxy, xyxy2xywh, xywhn2xyxy, xyxy2xywhn  # noqa: E402


def t(*rows):
    return torch.tensor(rows, dtype=torch.float64)


def test_plain_iou_hand_computed():
    # A = [0,0,10,10], B = [5,5,15,15]: inter 25, union 175 -> IoU 1/7
    a, b = t([0, 0, 10, 10]), t([5, 5, 15, 15])
    got = float(bbox_iou(a, b, xywh=False))
    np.testing.assert_allclose(got, 25 / 175, rtol=1e-6)
    # identical boxes -> 1; disjoint -> 0
    np.testing.assert_allclose(float(bbox_iou(a, a, xywh=False)), 1.0, rtol=1e-6)
    assert float(bbox_iou(a, t([20, 20, 30, 30]), xywh=False)) == pytest.approx(0.0, abs=1e-9)


def test_xywh_flag_consistency():
    # same box expressed both ways must give the same IoU
    a_xyxy, b_xyxy = t([0, 0, 10, 10]), t([5, 5, 15, 15])
    a_xywh, b_xywh = t([5, 5, 10, 10]), t([10, 10, 10, 10])
    np.testing.assert_allclose(
        float(bbox_iou(a_xywh, b_xywh, xywh=True)),
        float(bbox_iou(a_xyxy, b_xyxy, xywh=False)),
        rtol=1e-9,
    )


def test_giou_hand_computed():
    # A=[0,0,2,2], B=[3,0,5,2]: IoU 0, enclosing C=[0,0,5,2] area 10, union 8
    # GIoU = 0 - (10-8)/10 = -0.2
    got = float(bbox_iou(t([0, 0, 2, 2]), t([3, 0, 5, 2]), xywh=False, GIoU=True))
    np.testing.assert_allclose(got, -0.2, atol=1e-6)


def test_diou_hand_computed():
    # A=[0,0,2,2], B=[2,0,4,2]: IoU 0; centers (1,1),(3,1) -> rho2 = 4;
    # enclosing diag c2 = 4^2 + 2^2 = 20; DIoU = 0 - 4/20 = -0.2
    got = float(bbox_iou(t([0, 0, 2, 2]), t([2, 0, 4, 2]), xywh=False, DIoU=True))
    np.testing.assert_allclose(got, -0.2, atol=1e-6)
    # concentric boxes: rho2 = 0 -> DIoU == IoU
    got2 = float(bbox_iou(t([0, 0, 4, 4]), t([1, 1, 3, 3]), xywh=False, DIoU=True))
    np.testing.assert_allclose(got2, 4 / 16, atol=1e-6)


def test_ciou_hand_computed():
    # same aspect ratio -> v = 0 -> CIoU == DIoU
    a, b = t([0, 0, 2, 2]), t([2, 0, 4, 2])
    np.testing.assert_allclose(
        float(bbox_iou(a, b, xywh=False, CIoU=True)),
        float(bbox_iou(a, b, xywh=False, DIoU=True)),
        atol=1e-9,
    )
    # different aspect ratio, full hand computation:
    # A=[0,0,4,2] (w1=4,h1=2), B=[0,0,2,4] (w2=2,h2=4)
    # inter = 2*2 = 4, union = 8+8-4 = 12 -> iou = 1/3
    # enclosing [0,0,4,4]: c2 = 32; centers (2,1),(1,2): rho2 = 2
    # v = 4/pi^2 (atan(1/2) - atan(2))^2; alpha = v/(v - iou + 1)
    a, b = t([0, 0, 4, 2]), t([0, 0, 2, 4])
    iou = 1 / 3
    v = 4 / math.pi**2 * (math.atan(0.5) - math.atan(2.0)) ** 2
    alpha = v / (v - iou + 1)
    want = iou - (2 / 32 + v * alpha)
    got = float(bbox_iou(a, b, xywh=False, CIoU=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ciou_matches_our_loss_iou():
    """The shim's CIoU (the loss-parity oracle) must agree with OUR CIoU used
    in train/loss.py — otherwise loss parity is circularly defined."""
    from yolov3_tpu.ops.boxes import bbox_iou as our_bbox_iou

    rng = np.random.default_rng(0)
    n = 64
    b1 = np.stack([rng.uniform(0, 50, n), rng.uniform(0, 50, n),
                   rng.uniform(5, 30, n), rng.uniform(5, 30, n)], 1).astype(np.float32)
    b2 = (b1 + rng.normal(0, 4, b1.shape)).astype(np.float32)
    b2[:, 2:] = np.abs(b2[:, 2:]) + 1
    ours = np.asarray(our_bbox_iou(b1, b2, xywh=True, CIoU=True)).reshape(-1)
    ref = bbox_iou(torch.tensor(b1), torch.tensor(b2), xywh=True, CIoU=True).numpy().reshape(-1)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_box_iou_matrix_golden():
    b1 = t([0, 0, 10, 10], [20, 20, 30, 30])
    b2 = t([5, 5, 15, 15], [0, 0, 10, 10], [100, 100, 110, 110])
    m = box_iou(b1, b2).numpy()
    want = np.array([[25 / 175, 1.0, 0.0], [0.0, 0.0, 0.0]])
    np.testing.assert_allclose(m, want, atol=1e-6)


def test_box_conversions_roundtrip_and_goldens():
    xyxy = t([10, 20, 50, 80])
    xywh = xyxy2xywh(xyxy)
    np.testing.assert_allclose(xywh.numpy(), [[30, 50, 40, 60]], atol=1e-9)
    back = xywh2xyxy(xywh)
    np.testing.assert_allclose(back.numpy(), xyxy.numpy(), atol=1e-9)
    # normalized variants with pad/offset (reference letterbox geometry)
    n = t([0.5, 0.5, 0.25, 0.5])
    out = xywhn2xyxy(n, w=640, h=320, padw=16, padh=8)
    # x1 = 640*(0.5-0.125)+16 = 256, y1 = 320*0.25+8 = 88, x2 = 416, y2 = 248
    np.testing.assert_allclose(out.numpy(), [[256, 88, 416, 248]], atol=1e-6)
    rt = xyxy2xywhn(out, w=672, h=336)  # padded canvas
    np.testing.assert_allclose(rt.numpy(), [[0.5, 0.5, 160 / 672, 160 / 336]], atol=1e-6)
