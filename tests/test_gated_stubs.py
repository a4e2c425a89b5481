"""Gated paths executed with stubs (VERDICT r2 #7): branches gated on packages
absent in this image (albumentations, tf2onnx) run in the default suite
against injected fakes, and the in-tree COCO evaluator gets a differential
against an independent loop-based reimplementation on a larger randomized
synthetic dataset (the hand-computed goldens in test_cocoeval.py are tiny).
"""

import sys
import types
from collections import defaultdict
from pathlib import Path

import numpy as np
import pytest


# ------------------------------------------------------- fake albumentations
def _install_fake_albumentations(monkeypatch, calls):
    mod = types.ModuleType("albumentations")

    class _Compose:
        def __init__(self, transforms, bbox_params=None):
            self.transforms = transforms
            self.bbox_params = bbox_params

        def __call__(self, image=None, bboxes=None, class_labels=None):
            calls.append({"shape": image.shape, "n_boxes": len(bboxes)})
            return {
                "image": 255 - image,  # visible, invertible marker transform
                "bboxes": list(bboxes),
                "class_labels": list(class_labels),
            }

    mod.Compose = _Compose
    for name in ("Blur", "MedianBlur", "ToGray", "CLAHE"):
        setattr(mod, name, lambda p=0.01, _n=name: ("aug", _n, p))
    mod.BboxParams = lambda format=None, label_fields=None: ("bbox_params", format)
    monkeypatch.setitem(sys.modules, "albumentations", mod)
    return mod


def test_albumentations_runs_per_train_item(monkeypatch, tmp_path):
    """With the package present the transform must execute for every augmented
    __getitem__ (reference dataloaders.py:700) and its output must flow into
    the sample (marker inversion visible)."""
    import cv2

    calls = []
    _install_fake_albumentations(monkeypatch, calls)

    root = tmp_path / "ds"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        im = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / "train" / f"{i}.jpg"), im)
        (root / "labels" / "train" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.3\n")

    from yolov3_tpu.data.datasets import DetectionDataset

    hyp = {"mosaic": 0.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0, "fliplr": 0, "flipud": 0,
           "degrees": 0, "translate": 0, "scale": 0, "shear": 0, "perspective": 0,
           "mixup": 0, "copy_paste": 0}
    ds = DetectionDataset(str(root / "images" / "train"), imgsz=96, augment=True, hyp=hyp,
                          num_cls=2, cache_dir=tmp_path / "cache")
    assert ds.albumentations is not None and ds.albumentations.transform is not None
    n0 = len(calls)
    img, labels, _ = ds[0]
    assert len(calls) == n0 + 1, "albumentations must run once per train item"
    assert calls[-1]["n_boxes"] == 1
    # the marker transform actually reached the produced sample: re-fetch with
    # the package removed and compare
    monkeypatch.setitem(sys.modules, "albumentations", None)
    ds2 = DetectionDataset(str(root / "images" / "train"), imgsz=96, augment=True, hyp=hyp,
                           num_cls=2, cache_dir=tmp_path / "cache2")
    assert ds2.albumentations is None or ds2.albumentations.transform is None
    img2, _, _ = ds2[0]
    np.testing.assert_array_equal(np.asarray(img), 255 - np.asarray(img2))


# ------------------------------------------------------------- fake tf2onnx
def test_onnx_export_path_with_stub(monkeypatch, tmp_path):
    """export_onnx_tf — the ALTERNATIVE tf2onnx leg (the primary onnx format
    is the native emitter, models/onnx_native.py, tested for real in
    test_onnx_native.py) — runs end-to-end: real jax2tf SavedModel export,
    then the tf2onnx convert CLI stubbed as an on-disk package so the
    subprocess call exercises the real plumbing — and the metadata sidecar
    lands next to the .onnx."""
    pytest.importorskip("tensorflow")

    pkg = tmp_path / "fakepkgs" / "tf2onnx"
    pkg.mkdir(parents=True)
    (pkg / "__init__.py").write_text("__version__ = '0.0-stub'\n")
    (pkg / "convert.py").write_text(
        "import argparse, pathlib\n"
        "if __name__ == '__main__':\n"
        "    p = argparse.ArgumentParser()\n"
        "    p.add_argument('--saved-model'); p.add_argument('--output')\n"
        "    a = p.parse_args()\n"
        "    assert pathlib.Path(a.saved_model).exists(), a.saved_model\n"
        "    pathlib.Path(a.output).write_bytes(b'ONNXSTUB' + pathlib.Path(a.saved_model).name.encode())\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path / "fakepkgs"))
    import os

    monkeypatch.setenv("PYTHONPATH", str(tmp_path / "fakepkgs") + os.pathsep + os.environ.get("PYTHONPATH", ""))

    from yolov3_tpu import export as export_mod
    from yolov3_tpu.models.loading import load_weights

    model = load_weights("yolov3-tiny")
    out_dir = tmp_path / "export"
    out_dir.mkdir()
    onnx = export_mod.export_onnx_tf(model, out_dir / model.spec.name, imgsz=96, batch=1)
    assert onnx is not None and Path(onnx).exists()
    assert Path(onnx).read_bytes().startswith(b"ONNXSTUB")
    assert Path(onnx).with_suffix(".meta.json").exists(), (
        "metadata sidecar missing next to the onnx artifact"
    )


# --------------------------------- in-tree cocoeval vs independent reference
IOU_T = np.linspace(0.5, 0.95, 10)
REC_T = np.linspace(0, 1, 101)
AREAS = {"all": (0, 1e10), "small": (0, 32**2), "medium": (32**2, 96**2), "large": (96**2, 1e10)}


def _iou_single(d, g, crowd):
    dx1, dy1, dw, dh = d
    gx1, gy1, gw, gh = g
    ix = max(0.0, min(dx1 + dw, gx1 + gw) - max(dx1, gx1))
    iy = max(0.0, min(dy1 + dh, gy1 + gh) - max(dy1, gy1))
    inter = ix * iy
    union = dw * dh if crowd else dw * dh + gw * gh - inter
    return inter / union if union > 0 else 0.0


def _naive_cocoeval(gt, dt):
    """Independent, loop-based implementation of the published COCOeval bbox
    algorithm (greedy per-image/category matching in score order, crowd reuse,
    inclusive area bounds, 101-pt precision envelope), written without
    vectorization or caching as a differential oracle."""
    img_ids = sorted({im["id"] for im in gt["images"]})
    cat_ids = sorted({c["id"] for c in gt["categories"]})
    gts = defaultdict(list)
    for a in gt["annotations"]:
        gts[(a["image_id"], a["category_id"])].append(a)
    dts = defaultdict(list)
    for d in dt:
        if d["image_id"] in set(img_ids):
            dts[(d["image_id"], d["category_id"])].append(d)

    T, R = len(IOU_T), len(REC_T)
    maxdet = 100
    stats = {}
    for aname, (lo, hi) in AREAS.items():
        ap_per_cat, ar_per_cat = [], []
        for cat in cat_ids:
            # gather matches over all images
            all_scores, all_tp, all_ig = [], [], []
            npig = 0
            for img in img_ids:
                g = gts[(img, cat)]
                d = sorted(dts[(img, cat)], key=lambda x: -x["score"])[:maxdet]
                if not g and not d:
                    continue
                gig = [bool(a.get("ignore") or a.get("iscrowd") or a["area"] < lo or a["area"] > hi)
                       for a in g]
                order = sorted(range(len(g)), key=lambda i: gig[i])  # real gts first
                g = [g[i] for i in order]
                gig = [gig[i] for i in order]
                npig += sum(1 for x in gig if not x)
                tp = np.zeros((T, len(d)), bool)
                ig = np.zeros((T, len(d)), bool)
                for ti, thr in enumerate(IOU_T):
                    taken = [False] * len(g)
                    for di, det in enumerate(d):
                        best, bi = min(thr, 1 - 1e-10), -1
                        for gi, ann in enumerate(g):
                            if taken[gi] and not ann.get("iscrowd"):
                                continue
                            if bi > -1 and not gig[bi] and gig[gi]:
                                break
                            iou = _iou_single(det["bbox"], ann["bbox"], ann.get("iscrowd"))
                            if iou < best:
                                continue
                            best, bi = iou, gi
                        if bi > -1:
                            taken[bi] = True
                            tp[ti, di] = True
                            ig[ti, di] = gig[bi]
                    for di, det in enumerate(d):
                        a = det["bbox"][2] * det["bbox"][3]
                        if not tp[ti, di] and (a < lo or a > hi):
                            ig[ti, di] = True
                all_scores += [x["score"] for x in d]
                all_tp.append(tp)
                all_ig.append(ig)
            if npig == 0:
                continue
            scores = np.array(all_scores)
            order = np.argsort(-scores, kind="stable")
            tp = np.concatenate(all_tp, 1)[:, order] if all_tp else np.zeros((T, 0), bool)
            ig = np.concatenate(all_ig, 1)[:, order] if all_ig else np.zeros((T, 0), bool)
            aps, ars = [], []
            for ti in range(T):
                t_, i_ = tp[ti], ig[ti]
                keep = ~i_
                tps = np.cumsum(t_[keep])
                fps = np.cumsum(~t_[keep])
                rc = tps / npig if len(tps) else np.zeros(0)
                pr = tps / np.maximum(tps + fps, 1e-12) if len(tps) else np.zeros(0)
                # envelope + 101-pt sample
                for i in range(len(pr) - 2, -1, -1):
                    pr[i] = max(pr[i], pr[i + 1])
                q = np.zeros(R)
                idx = np.searchsorted(rc, REC_T, side="left")
                for ri, pi in enumerate(idx):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                aps.append(q.mean())
                ars.append(rc[-1] if len(rc) else 0.0)
            ap_per_cat.append(np.mean(aps))
            ar_per_cat.append(np.mean(ars))
        stats[aname] = (float(np.mean(ap_per_cat)) if ap_per_cat else -1.0,
                        float(np.mean(ar_per_cat)) if ar_per_cat else -1.0)
    return stats


def _random_coco(seed=0, n_images=40, n_cats=3):
    rng = np.random.default_rng(seed)
    images = [{"id": i} for i in range(n_images)]
    anns, dts = [], []
    aid = 1
    for i in range(n_images):
        for _ in range(int(rng.integers(1, 6))):
            cat = int(rng.integers(1, n_cats + 1))
            # area diversity incl. exact 32^2 / 96^2 boundary boxes
            side = float(rng.choice([8, 16, 32, 48, 96, 150, 32.0, 96.0]))
            w, h = side, side * float(rng.uniform(0.5, 2.0))
            if rng.random() < 0.15:
                w = h = side  # exact boundary square
            x, y = float(rng.uniform(0, 400)), float(rng.uniform(0, 400))
            crowd = int(rng.random() < 0.1)
            anns.append({"id": aid, "image_id": i, "category_id": cat,
                         "bbox": [x, y, w, h], "area": w * h, "iscrowd": crowd})
            aid += 1
            # detections: jittered TP (80%), plus noise FPs
            if rng.random() < 0.8:
                jx, jy = rng.normal(0, side * 0.08, 2)
                dts.append({"image_id": i, "category_id": cat,
                            "bbox": [x + jx, y + jy, w * float(rng.uniform(0.85, 1.15)),
                                     h * float(rng.uniform(0.85, 1.15))],
                            "score": float(rng.uniform(0.3, 1.0))})
        for _ in range(int(rng.integers(0, 3))):
            dts.append({"image_id": i, "category_id": int(rng.integers(1, n_cats + 1)),
                        "bbox": [float(rng.uniform(0, 450)), float(rng.uniform(0, 450)),
                                 float(rng.uniform(5, 120)), float(rng.uniform(5, 120))],
                        "score": float(rng.uniform(0.05, 0.9))})
    return {"images": images, "annotations": anns,
            "categories": [{"id": c} for c in range(1, n_cats + 1)]}, dts


@pytest.mark.parametrize("seed", [0, 7])
def test_cocoeval_differential_vs_naive(seed):
    from yolov3_tpu.eval.cocoeval import COCOBboxEval

    gt, dt = _random_coco(seed=seed)
    ev = COCOBboxEval(gt, dt).accumulate()
    stats = ev.summarize(verbose=False)
    naive = _naive_cocoeval(gt, dt)
    # AP all/small/medium/large (@100 dets) and AR@100 all
    np.testing.assert_allclose(stats[0], naive["all"][0], atol=1e-9)
    np.testing.assert_allclose(stats[3], naive["small"][0], atol=1e-9)
    np.testing.assert_allclose(stats[4], naive["medium"][0], atol=1e-9)
    np.testing.assert_allclose(stats[5], naive["large"][0], atol=1e-9)
    np.testing.assert_allclose(stats[8], naive["all"][1], atol=1e-9)
