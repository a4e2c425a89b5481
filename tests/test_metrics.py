"""Metric tests: AP math on hand-constructed cases, matching, fitness."""

import numpy as np

from yolov3_tpu.eval.metrics import ap_per_class, compute_ap, fitness, process_batch, smooth


def test_compute_ap_perfect():
    # all detections correct: AP should be ~1
    recall = np.array([0.25, 0.5, 0.75, 1.0])
    precision = np.ones(4)
    ap, _, _ = compute_ap(recall, precision)
    assert ap > 0.99


def test_compute_ap_half():
    # precision drops to 0.5 after half the detections
    recall = np.array([0.5, 1.0])
    precision = np.array([1.0, 0.5])
    ap, _, _ = compute_ap(recall, precision)
    # envelope: precision 1.0 up to r=0.5, then linear to 0.5 at r=1.0
    # => 0.5*1.0 + integral of the ramp (0.375) = 0.875
    assert abs(ap - 0.875) < 0.01


def test_fitness_weights():
    x = np.array([[1.0, 1.0, 0.5, 0.4]])
    np.testing.assert_allclose(fitness(x), [0.1 * 0.5 + 0.9 * 0.4])


def test_process_batch_exact_match():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([[10, 10, 50, 50, 0.9, 0]], np.float32)
    lab = np.array([[0, 10, 10, 50, 50]], np.float32)
    correct = process_batch(det, lab, iouv)
    assert correct.all()  # IoU=1 passes all thresholds


def test_process_batch_wrong_class():
    iouv = np.linspace(0.5, 0.95, 10)
    det = np.array([[10, 10, 50, 50, 0.9, 1]], np.float32)
    lab = np.array([[0, 10, 10, 50, 50]], np.float32)
    assert not process_batch(det, lab, iouv).any()


def test_process_batch_one_det_per_label():
    """Two detections over one label: only the higher-IoU one is a TP."""
    iouv = np.array([0.5])
    det = np.array(
        [[10, 10, 50, 50, 0.9, 0], [12, 12, 52, 52, 0.8, 0]], np.float32
    )
    lab = np.array([[0, 10, 10, 50, 50]], np.float32)
    correct = process_batch(det, lab, iouv)
    assert correct.sum() == 1
    assert correct[0, 0] and not correct[1, 0]


def test_ap_per_class_simple():
    """3 dets (2 TP, 1 FP) for one class with 2 GT -> known PR values."""
    tp = np.array([[True], [True], [False]])
    conf = np.array([0.9, 0.8, 0.7])
    pred_cls = np.zeros(3)
    target_cls = np.zeros(2)
    tp_c, fp_c, p, r, f1, ap, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert classes.tolist() == [0]
    assert ap[0, 0] > 0.99  # both GT found before the FP
    assert 0.9 < r[0] <= 1.0


def test_ap_per_class_multiclass():
    tp = np.array([[True], [False], [True]])
    conf = np.array([0.9, 0.8, 0.7])
    pred_cls = np.array([0.0, 0.0, 1.0])
    target_cls = np.array([0.0, 1.0, 1.0])
    _, _, p, r, f1, ap, classes = ap_per_class(tp, conf, pred_cls, target_cls)
    assert set(classes.tolist()) == {0, 1}
    assert ap[0, 0] > 0.99  # class 0: 1 GT, found first
    # class 1: 1 of 2 GT found at p=1 -> envelope integrates to 0.5 + ramp 0.25
    assert 0.7 < ap[1, 0] < 0.8


def test_smooth_preserves_length():
    y = np.random.default_rng(0).uniform(size=100)
    assert smooth(y, 0.1).shape == y.shape
