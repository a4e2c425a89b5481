"""In-tree COCO bbox evaluator (eval/cocoeval.py): hand-computed goldens for
the pycocotools-semantics pipeline (matching, ignore rules, 101-pt AP)."""

import numpy as np

from yolov3_tpu.eval.cocoeval import COCOBboxEval, evaluate_coco_json


def _gt(img_id, cat, x, y, w, h, ann_id, **kw):
    return {"id": ann_id, "image_id": img_id, "category_id": cat,
            "bbox": [x, y, w, h], "area": w * h, "iscrowd": 0, **kw}


def _dt(img_id, cat, x, y, w, h, score):
    return {"image_id": img_id, "category_id": cat, "bbox": [x, y, w, h], "score": score}


def _dataset(gts):
    imgs = sorted({g["image_id"] for g in gts})
    cats = sorted({g["category_id"] for g in gts})
    return {
        "images": [{"id": i} for i in imgs],
        "annotations": gts,
        "categories": [{"id": c} for c in cats],
    }


def test_perfect_predictions_ap1():
    gts = [_gt(1, 1, 10, 10, 50, 60, 1), _gt(1, 1, 100, 100, 40, 40, 2),
           _gt(2, 1, 5, 5, 80, 80, 3)]
    dts = [_dt(g["image_id"], 1, *g["bbox"], 0.9 - 0.1 * i) for i, g in enumerate(gts)]
    ev = COCOBboxEval(_dataset(gts), dts).accumulate()
    stats = ev.summarize(verbose=False)
    assert stats[0] == 1.0 and stats[1] == 1.0  # mAP50-95, mAP50
    assert stats[8] == 1.0  # AR@100


def test_one_missed_gt():
    # 2 gts, 1 perfect detection -> recall 0.5, precision 1 at that point.
    # 101-pt AP: precision 1 for recThrs <= 0.5 (51 points) -> AP = 51/101.
    gts = [_gt(1, 1, 10, 10, 50, 50, 1), _gt(1, 1, 200, 200, 50, 50, 2)]
    dts = [_dt(1, 1, 10, 10, 50, 50, 0.9)]
    stats = COCOBboxEval(_dataset(gts), dts).accumulate().summarize(verbose=False)
    np.testing.assert_allclose(stats[1], 51 / 101, atol=1e-9)


def test_false_positive_after_tp():
    # 1 gt; detections: TP at 0.9, FP at 0.5.
    # PR points: (r=1, p=1) then (r=1, p=0.5) -> envelope keeps p=1 at r<=1.
    gts = [_gt(1, 1, 10, 10, 50, 50, 1)]
    dts = [_dt(1, 1, 10, 10, 50, 50, 0.9), _dt(1, 1, 300, 300, 50, 50, 0.5)]
    stats = COCOBboxEval(_dataset(gts), dts).accumulate().summarize(verbose=False)
    assert stats[1] == 1.0
    # FP ranked ABOVE the TP instead: precision at recall 1 is 0.5
    dts2 = [_dt(1, 1, 10, 10, 50, 50, 0.5), _dt(1, 1, 300, 300, 50, 50, 0.9)]
    stats2 = COCOBboxEval(_dataset(gts), dts2).accumulate().summarize(verbose=False)
    np.testing.assert_allclose(stats2[1], 0.5, atol=1e-9)


def test_crowd_gt_is_ignored_not_fp():
    # detection overlapping only a crowd gt: ignored (not FP), crowd not counted
    gts = [_gt(1, 1, 10, 10, 50, 50, 1),
           _gt(1, 1, 200, 200, 100, 100, 2, iscrowd=1)]
    dts = [_dt(1, 1, 10, 10, 50, 50, 0.9), _dt(1, 1, 210, 210, 40, 40, 0.8)]
    stats = COCOBboxEval(_dataset(gts), dts).accumulate().summarize(verbose=False)
    assert stats[1] == 1.0  # the crowd-matched dt neither helps nor hurts


def test_iou_threshold_ladder():
    # detection with IoU ~0.6 vs gt: TP at thresholds .5/.55/.6, FP above
    gts = [_gt(1, 1, 0, 0, 100, 100, 1)]
    dts = [_dt(1, 1, 0, 0, 100, 60, 0.9)]  # IoU = 0.6
    ev = COCOBboxEval(_dataset(gts), dts).accumulate()
    ap_t = [ev._summary(True, iou=t) for t in np.linspace(0.5, 0.95, 10)]
    assert all(a == 1.0 for a in ap_t[:3]) and all(a == 0.0 for a in ap_t[3:])
    stats = ev.summarize(verbose=False)
    np.testing.assert_allclose(stats[0], 0.3, atol=1e-9)


def test_area_ranges_and_maxdets():
    # small gt (16x16=256 < 1024) counts in "small" but not "large"
    gts = [_gt(1, 1, 10, 10, 16, 16, 1)]
    dts = [_dt(1, 1, 10, 10, 16, 16, 0.9)]
    ev = COCOBboxEval(_dataset(gts), dts).accumulate()
    stats = ev.summarize(verbose=False)
    assert stats[3] == 1.0   # AP small
    assert stats[5] == -1.0  # AP large: no gts in range
    assert stats[6] == 1.0   # AR maxDet=1


def test_area_boundary_inclusive():
    # pycocotools ignores only if area < lo or area > hi: a 32x32 gt+dt
    # (area exactly 32**2) belongs to BOTH the small and medium buckets
    gts = [_gt(1, 1, 10, 10, 32, 32, 1)]
    dts = [_dt(1, 1, 10, 10, 32, 32, 0.9)]
    stats = COCOBboxEval(_dataset(gts), dts).accumulate().summarize(verbose=False)
    assert stats[3] == 1.0  # AP small (boundary included)
    assert stats[4] == 1.0  # AP medium (boundary included)
    # 96x96 likewise straddles medium/large
    gts = [_gt(1, 1, 10, 10, 96, 96, 1)]
    dts = [_dt(1, 1, 10, 10, 96, 96, 0.9)]
    stats = COCOBboxEval(_dataset(gts), dts).accumulate().summarize(verbose=False)
    assert stats[4] == 1.0 and stats[5] == 1.0


def test_iou_cache_reused_across_area_ranges():
    # accumulate() touches 4 area ranges; the (img, cat) IoU matrix must be
    # computed once (pycocotools caches in self.ious keyed the same way)
    gts = [_gt(1, 1, 10, 10, 50, 50, 1)]
    dts = [_dt(1, 1, 10, 10, 50, 50, 0.9)]
    ev = COCOBboxEval(_dataset(gts), dts)
    calls = {"n": 0}
    orig = ev._ious_for

    def counting(img_id, cat_id):
        fresh = (img_id, cat_id) not in ev._iou_cache
        out = orig(img_id, cat_id)
        calls["n"] += int(fresh)
        return out

    ev._ious_for = counting
    ev.accumulate()
    assert calls["n"] == 1


def test_maxdet_1_truncation():
    # 2 gts, 2 perfect dts: AR@maxDet=1 sees only the top-scoring detection
    gts = [_gt(1, 1, 10, 10, 50, 50, 1), _gt(1, 1, 200, 200, 50, 50, 2)]
    dts = [_dt(1, 1, 10, 10, 50, 50, 0.9), _dt(1, 1, 200, 200, 50, 50, 0.8)]
    ev = COCOBboxEval(_dataset(gts), dts).accumulate()
    stats = ev.summarize(verbose=False)
    np.testing.assert_allclose(stats[6], 0.5, atol=1e-9)  # AR@1
    assert stats[8] == 1.0  # AR@100


def test_json_roundtrip(tmp_path):
    gts = [_gt(1, 1, 10, 10, 50, 50, 1)]
    dts = [_dt(1, 1, 10, 10, 50, 50, 0.9)]
    import json

    (tmp_path / "anno.json").write_text(json.dumps(_dataset(gts)))
    (tmp_path / "pred.json").write_text(json.dumps(dts))
    m, m50 = evaluate_coco_json(tmp_path / "anno.json", tmp_path / "pred.json", verbose=False)
    assert m == 1.0 and m50 == 1.0
