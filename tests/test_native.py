"""Native (C++) host ops: exact-parity tests against the XLA NMS and cv2.

The native layer is the in-tree analog of the native kernels the reference
consumes through libraries (torchvision.ops.nms, reference general.py:733;
OpenCV C++). Contracts:
  - greedy NMS == ops/nms.py XLA greedy NMS, exactly;
  - uint8 INTER_LINEAR resize == cv2 byte-for-byte on downscale and on all
    interior rows; vertically-clamped border rows (upscale only) within 1 LSB
    (cv2 5.x uses an unidentified rounding variant there);
  - native letterbox == data/augment.letterbox under the same tolerance.
"""

import numpy as np
import pytest

from yolov3_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")


def _random_candidates(rng, bs=3, k=64, nc=5):
    boxes = rng.uniform(0, 600, (bs, k, 2)).astype(np.float32)
    wh = rng.uniform(4, 120, (bs, k, 2)).astype(np.float32)
    boxes = np.concatenate([boxes, boxes + wh], axis=-1)
    scores = rng.uniform(0.05, 1.0, (bs, k)).astype(np.float32)
    scores[:, -5:] = -1.0  # invalid tail slots
    cls_ids = rng.integers(0, nc, (bs, k)).astype(np.float32)
    return boxes, scores, cls_ids


def test_greedy_nms_matches_xla():
    from yolov3_tpu.ops.nms import MAX_WH, nms_from_candidates

    rng = np.random.default_rng(0)
    boxes, scores, cls_ids = _random_candidates(rng)
    off = boxes + (cls_ids * MAX_WH)[..., None]
    out_x, n_x = nms_from_candidates(boxes, scores, cls_ids, 0.45, 32)
    out_n, n_n = native.greedy_nms_batch(off, boxes, scores, cls_ids, 0.45, 32)
    np.testing.assert_array_equal(np.asarray(n_x), n_n)
    np.testing.assert_allclose(np.asarray(out_x), out_n, atol=1e-5)


def test_greedy_nms_tie_break_and_early_exit():
    from yolov3_tpu.ops.nms import MAX_WH, nms_from_candidates

    boxes = np.tile(np.array([[10, 10, 50, 50]], np.float32), (1, 6, 1)).reshape(1, 6, 4)
    boxes[0, 3:] += 200.0  # second cluster
    scores = np.array([[0.9, 0.9, 0.9, 0.5, -1.0, -1.0]], np.float32)
    cls = np.zeros((1, 6), np.float32)
    off = boxes + (cls * MAX_WH)[..., None]
    out_x, n_x = nms_from_candidates(boxes, scores, cls, 0.45, 8)
    out_n, n_n = native.greedy_nms_batch(off, boxes, scores, cls, 0.45, 8)
    assert int(np.asarray(n_x)[0]) == int(n_n[0]) == 2
    np.testing.assert_allclose(np.asarray(out_x), out_n, atol=1e-6)


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"multi_label": True},
        {"agnostic": True},
        {"classes": (1, 3)},
        {"conf_thres": 0.001, "multi_label": True},
    ],
)
def test_non_max_suppression_engines_agree(kw):
    from yolov3_tpu.ops.nms import non_max_suppression

    rng = np.random.default_rng(1)
    bs, n, nc = 2, 300, 6
    pred = np.zeros((bs, n, 5 + nc), np.float32)
    pred[..., 0:2] = rng.uniform(60, 500, (bs, n, 2))
    pred[..., 2:4] = rng.uniform(8, 90, (bs, n, 2))
    pred[..., 4] = rng.uniform(0, 1, (bs, n))
    pred[..., 5:] = rng.uniform(0, 1, (bs, n, nc))
    a = non_max_suppression(pred, engine="xla", **kw)
    b = non_max_suppression(pred, engine="native", **kw)
    assert len(a) == len(b)
    for xa, xb in zip(a, b):
        assert xa.shape == xb.shape
        np.testing.assert_allclose(xa, xb, atol=1e-4)


def test_nms_apriori_labels_native():
    from yolov3_tpu.ops.nms import non_max_suppression

    pred = np.zeros((1, 20, 10), np.float32)
    labels = [np.array([[2, 100, 100, 40, 40]], np.float32)]
    a = non_max_suppression(pred, labels=labels, engine="xla")
    b = non_max_suppression(pred, labels=labels, engine="native")
    assert len(a[0]) == len(b[0]) == 1
    np.testing.assert_allclose(a[0], b[0], atol=1e-4)
    assert int(b[0][0, 5]) == 2


def test_resize_downscale_byte_exact():
    import cv2

    rng = np.random.default_rng(2)
    for sh, sw, dh, dw in [(480, 640, 384, 512), (1080, 810, 640, 480),
                           (640, 640, 320, 320), (505, 303, 212, 202)]:
        im = rng.integers(0, 256, (sh, sw, 3), dtype=np.uint8)
        a = cv2.resize(im, (dw, dh), interpolation=cv2.INTER_LINEAR)
        b = native.resize_linear(im, (dw, dh))
        np.testing.assert_array_equal(a, b)


def test_resize_upscale_interior_exact_border_1lsb():
    import cv2

    rng = np.random.default_rng(3)
    for sh, sw, dh, dw in [(100, 100, 640, 640), (123, 457, 640, 640),
                           (200, 300, 417, 555)]:
        im = rng.integers(0, 256, (sh, sw, 3), dtype=np.uint8)
        a = cv2.resize(im, (dw, dh), interpolation=cv2.INTER_LINEAR)
        b = native.resize_linear(im, (dw, dh))
        d = np.abs(a.astype(int) - b.astype(int))
        assert d.max() <= 1
        # mismatches only in the vertically-clamped first/last output rows
        scale = sh / dh
        bad_rows = sorted(set(np.nonzero(d.any(axis=(1, 2)))[0].tolist()))
        clamped = [dy for dy in range(dh)
                   if (dy + 0.5) * scale - 0.5 < 0 or (dy + 0.5) * scale - 0.5 >= sh - 1]
        assert set(bad_rows) <= set(clamped)


def test_letterbox_matches_cv2_path():
    from yolov3_tpu.data.augment import letterbox as cv2_letterbox

    rng = np.random.default_rng(4)
    for shape, kw, exact in [
        ((1080, 810, 3), {}, True),                  # downscale, auto pad
        ((480, 640, 3), {"auto": False}, True),      # full square pad
        ((730, 1280, 3), {"scaleup": False}, True),
        ((200, 300, 3), {"scale_fill": True, "auto": False}, False),  # upscale
    ]:
        im = rng.integers(0, 256, shape, dtype=np.uint8)
        a, ra, pa = cv2_letterbox(im, 640, **kw)
        b, rb, pb = native.letterbox(im, 640, **kw)
        assert ra == rb and pa == pb and a.shape == b.shape
        if exact:  # downscale: byte-exact
            np.testing.assert_array_equal(a, b)
        else:  # upscale: clamped border rows within 1 LSB
            assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_letterbox_4channel_fill_in_bounds():
    # BGRA input with the default 3-tuple fill: the color buffer must be
    # padded to cn entries (np.resize wraps -> alpha fill = color[0]), not
    # read past a 3-byte buffer
    rng = np.random.default_rng(5)
    im = rng.integers(0, 256, (300, 500, 4), dtype=np.uint8)
    out, _, _ = native.letterbox(im, 640, auto=False)
    assert out.shape == (640, 640, 4)
    pad_rows = out[:5]  # top padding region
    assert (pad_rows[..., :3] == 114).all()
    assert (pad_rows[..., 3] == pad_rows[0, 0, 3]).all()  # deterministic fill

    # grayscale path still works with the 3-tuple default
    im1 = rng.integers(0, 256, (300, 500), dtype=np.uint8)
    out1, _, _ = native.letterbox(im1, 640, auto=False)
    assert out1.shape == (640, 640) and out1[0, 0] == 114
