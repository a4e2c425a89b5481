"""NMS tests: greedy semantics, thresholds, class-awareness, multi-label, vs torchvision."""

import numpy as np
import pytest

from yolov3_tpu.ops.nms import batched_nms, non_max_suppression


def make_pred(boxes_xywh, obj, cls_probs):
    """Assemble a (1, N, 5+nc) prediction array."""
    n = len(boxes_xywh)
    nc = len(cls_probs[0])
    x = np.zeros((1, n, 5 + nc), dtype=np.float32)
    x[0, :, :4] = boxes_xywh
    x[0, :, 4] = obj
    x[0, :, 5:] = cls_probs
    return x


def test_basic_suppression():
    # two heavily-overlapping boxes + one distant; keep the top scorer and the distant one
    boxes = [[50, 50, 20, 20], [52, 50, 20, 20], [200, 200, 20, 20]]
    obj = [0.9, 0.8, 0.7]
    cls = [[1.0, 0.0]] * 3
    out = non_max_suppression(make_pred(boxes, obj, cls), conf_thres=0.25, iou_thres=0.45)
    assert len(out) == 1
    det = out[0]
    assert det.shape[0] == 2
    # sorted by score
    assert det[0, 4] >= det[1, 4]
    np.testing.assert_allclose(det[0, :4], [40, 40, 60, 60], atol=1e-4)
    np.testing.assert_allclose(det[1, :4], [190, 190, 210, 210], atol=1e-4)


def test_classes_do_not_suppress_each_other():
    boxes = [[50, 50, 20, 20], [50, 50, 20, 20]]
    obj = [0.9, 0.8]
    cls = [[1.0, 0.0], [0.0, 1.0]]  # same box, different classes
    out = non_max_suppression(make_pred(boxes, obj, cls), conf_thres=0.25, iou_thres=0.45)
    assert out[0].shape[0] == 2
    # agnostic mode: one survives
    out = non_max_suppression(make_pred(boxes, obj, cls), conf_thres=0.25, iou_thres=0.45, agnostic=True)
    assert out[0].shape[0] == 1


def test_conf_threshold():
    boxes = [[50, 50, 20, 20], [200, 200, 20, 20]]
    obj = [0.9, 0.1]  # second below threshold
    cls = [[1.0, 0.0]] * 2
    out = non_max_suppression(make_pred(boxes, obj, cls), conf_thres=0.25, iou_thres=0.45)
    assert out[0].shape[0] == 1


def test_conf_is_obj_times_cls():
    boxes = [[50, 50, 20, 20]]
    obj = [0.6]
    cls = [[0.5, 0.1]]  # conf = 0.3
    out = non_max_suppression(make_pred(boxes, obj, cls), conf_thres=0.25, iou_thres=0.45)
    np.testing.assert_allclose(out[0][0, 4], 0.3, atol=1e-5)
    assert out[0][0, 5] == 0  # class id


def test_multi_label():
    boxes = [[50, 50, 20, 20]]
    obj = [0.9]
    cls = [[0.8, 0.7]]  # both above threshold
    out = non_max_suppression(make_pred(boxes, obj, cls), conf_thres=0.25, iou_thres=0.45, multi_label=True)
    assert out[0].shape[0] == 2
    assert set(out[0][:, 5].astype(int)) == {0, 1}


def test_class_filter():
    boxes = [[50, 50, 20, 20], [200, 200, 20, 20]]
    obj = [0.9, 0.9]
    cls = [[1.0, 0.0], [0.0, 1.0]]
    out = non_max_suppression(make_pred(boxes, obj, cls), conf_thres=0.25, classes=[1])
    assert out[0].shape[0] == 1
    assert int(out[0][0, 5]) == 1


def test_max_det():
    rng = np.random.default_rng(0)
    n = 50
    boxes = np.stack(
        [rng.uniform(0, 1000, n), rng.uniform(0, 1000, n), np.full(n, 5.0), np.full(n, 5.0)], axis=1
    )  # tiny non-overlapping boxes
    obj = rng.uniform(0.5, 1.0, n)
    cls = np.tile([[1.0, 0.0]], (n, 1))
    out = non_max_suppression(make_pred(boxes, obj, cls), conf_thres=0.25, max_det=10)
    assert out[0].shape[0] == 10


def greedy_nms_oracle(boxes_xyxy, scores, iou_thres):
    """Plain-python greedy NMS (torchvision semantics): sort by score, keep a
    box iff it doesn't overlap any previously-kept box above the threshold."""
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            b1, b2 = boxes_xyxy[i], boxes_xyxy[j]
            iw = max(0.0, min(b1[2], b2[2]) - max(b1[0], b2[0]))
            ih = max(0.0, min(b1[3], b2[3]) - max(b1[1], b2[1]))
            inter = iw * ih
            a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
            a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
            if inter / (a1 + a2 - inter + 1e-7) > iou_thres:
                ok = False
                break
        if ok:
            keep.append(i)
    return np.array(keep)


def test_against_numpy_oracle(rng):
    """Golden test: the fixed-shape loop == sequential greedy NMS (always runs)."""
    n = 300
    xy = rng.uniform(50, 600, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, size=(n, 2)).astype(np.float32)
    boxes_xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
    scores = rng.uniform(0.3, 1.0, size=n).astype(np.float32)

    keep = greedy_nms_oracle(boxes_xyxy, scores, 0.5)[:100]

    pred = np.zeros((1, n, 6), dtype=np.float32)
    pred[0, :, :4] = np.concatenate([xy, wh], axis=1)
    pred[0, :, 4] = scores
    pred[0, :, 5] = 1.0
    out, n_valid = map(np.asarray, batched_nms(pred, conf_thres=0.25, iou_thres=0.5, max_det=100))
    ours = out[0, : n_valid[0]]
    assert n_valid[0] == len(keep)
    np.testing.assert_allclose(ours[:, :4], boxes_xyxy[keep], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ours[:, 4], scores[keep], rtol=1e-5)


def test_against_torchvision(rng):
    """Golden test: our greedy loop == torchvision.ops.nms on random boxes."""
    torchvision = pytest.importorskip("torchvision")
    import torch

    n = 400
    xy = rng.uniform(50, 600, size=(n, 2)).astype(np.float32)
    wh = rng.uniform(10, 80, size=(n, 2)).astype(np.float32)
    boxes_xyxy = np.concatenate([xy - wh / 2, xy + wh / 2], axis=1)
    scores = rng.uniform(0.3, 1.0, size=n).astype(np.float32)

    keep_tv = torchvision.ops.nms(torch.from_numpy(boxes_xyxy), torch.from_numpy(scores), 0.5).numpy()

    # feed through our pipeline: single class, obj=score, cls=1
    pred = np.zeros((1, n, 6), dtype=np.float32)
    pred[0, :, :4] = np.concatenate([xy, wh], axis=1)
    pred[0, :, 4] = scores
    pred[0, :, 5] = 1.0
    out, n_valid = map(np.asarray, batched_nms(pred, conf_thres=0.25, iou_thres=0.5, max_det=300))
    ours = out[0, : n_valid[0]]

    keep_tv = keep_tv[:300]
    assert n_valid[0] == len(keep_tv)
    np.testing.assert_allclose(ours[:, :4], boxes_xyxy[keep_tv], rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(ours[:, 4], scores[keep_tv], rtol=1e-5)


def test_batched_shapes():
    pred = np.random.default_rng(1).uniform(0, 1, size=(4, 128, 85)).astype(np.float32)
    pred[..., :4] *= 640
    out, n_valid = batched_nms(pred, conf_thres=0.5, iou_thres=0.45, max_det=30)
    assert out.shape == (4, 30, 6)
    assert n_valid.shape == (4,)


def test_merge_nms_reference_semantics():
    """merge=True: weighted-mean boxes AND the reference's redundant filter —
    a kept detection overlapping no other candidate is dropped
    (reference general.py:735-742, `redundant` is always True there)."""
    boxes = [[50, 50, 20, 20], [52, 50, 20, 20], [200, 200, 20, 20]]
    obj = [0.9, 0.8, 0.7]
    cls = [[1.0, 0.0]] * 3
    out, n = batched_nms(make_pred(boxes, obj, cls), conf_thres=0.25, iou_thres=0.45, merge=True)
    out, n = np.asarray(out[0]), int(n[0])
    # the isolated box at (200,200) survives plain NMS but has no other
    # overlapping candidate -> dropped by the redundant filter
    assert n == 1
    # survivor = score-weighted mean of the two overlapping candidates
    w = np.array([0.9, 0.8])
    exp_x1 = (40 * w[0] + 42 * w[1]) / w.sum()
    np.testing.assert_allclose(out[0, :4], [exp_x1, 40, exp_x1 + 20, 60], atol=1e-3)
    assert (out[1:, 4] == 0).all()  # compacted, zero-padded tail

    # single-candidate image: the 1 < n gate disables merge entirely
    out1, n1 = batched_nms(make_pred([[50, 50, 20, 20]], [0.9], [[1.0, 0.0]]),
                           conf_thres=0.25, iou_thres=0.45, merge=True)
    assert int(n1[0]) == 1
    np.testing.assert_allclose(np.asarray(out1[0, 0, :4]), [40, 40, 60, 60], atol=1e-4)


def test_pallas_large_k_grids_over_batch():
    """batched_nms(use_pallas) with candidate counts exceeding the
    whole-batch-resident VMEM budget routes to the batch-GRIDDED kernel (one
    program per image, ops/nms_pallas.py grid_batch) and stays row-exact with
    the XLA loop. Run in interpret mode — the routing math is identical."""
    rng = np.random.default_rng(0)
    n = 25200
    x = np.zeros((16, n, 7), np.float32)  # 16*25200 candidates ~= 17 MB of VMEM planes
    x[..., :2] = rng.uniform(40, 600, (16, n, 2))
    x[..., 2:4] = rng.uniform(8, 60, (16, n, 2))
    x[..., 4] = rng.uniform(0, 1, (16, n))
    x[..., 5:] = rng.uniform(0, 1, (16, n, 2))
    out_p, n_p = batched_nms(x, conf_thres=0.6, iou_thres=0.45, use_pallas="interpret")
    out_x, n_x = batched_nms(x, conf_thres=0.6, iou_thres=0.45, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(n_p), np.asarray(n_x))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)
