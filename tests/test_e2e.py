"""End-to-end smoke: synthetic dataset -> train 2 epochs -> validate -> detect.

This is the counterpart of the reference's CI smoke matrix (SURVEY.md §4:
train/val/detect on coco128 at imgsz 64) but hermetic: the dataset is
generated on the fly (solid rectangles whose boxes ARE the labels, so even a
2-epoch micro-model produces meaningful mAP movement).
"""

from pathlib import Path

import cv2
import numpy as np
import pytest

MICRO_SPEC = {
    "nc": 2,
    "anchors": [[12, 12, 20, 20, 32, 32], [48, 48, 64, 64, 96, 96]],
    "layers": [
        {"from": -1, "n": 1, "op": "Conv", "args": [8, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": [3, 4], "n": 1, "op": "Detect", "args": ["nc", "anchors"]},
    ],
}


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """8 images of colored rectangles on gray, YOLO-format labels."""
    root = tmp_path_factory.mktemp("synthds")
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(8):
        im = np.full((96, 96, 3), 114, np.uint8)
        lines = []
        for _ in range(rng.integers(1, 3)):
            cls = int(rng.integers(0, 2))
            w, h = rng.integers(24, 48, 2)
            x1 = int(rng.integers(0, 96 - w))
            y1 = int(rng.integers(0, 96 - h))
            color = (0, 0, 220) if cls == 0 else (220, 0, 0)
            cv2.rectangle(im, (x1, y1), (x1 + int(w), y1 + int(h)), color, -1)
            lines.append(f"{cls} {(x1 + w / 2) / 96:.6f} {(y1 + h / 2) / 96:.6f} {w / 96:.6f} {h / 96:.6f}")
        cv2.imwrite(str(root / "images" / "train" / f"{i:03d}.jpg"), im)
        (root / "labels" / "train" / f"{i:03d}.txt").write_text("\n".join(lines))
    return {
        "path": str(root),
        "train": "images/train",
        "val": "images/train",
        "names": {0: "red", 1: "blue"},
    }


def test_train_val_detect_smoke(synth_dataset, tmp_path):
    from yolov3_tpu.train.loop import train

    hyp = {
        "lr0": 0.01, "lrf": 0.1, "momentum": 0.9, "weight_decay": 0.0, "warmup_epochs": 0.0,
        "box": 0.05, "cls": 0.5, "obj": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0,
        "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "degrees": 0.0, "translate": 0.0,
        "scale": 0.0, "shear": 0.0, "perspective": 0.0, "flipud": 0.0, "fliplr": 0.5,
        "mosaic": 0.0, "mixup": 0.0, "copy_paste": 0.0,
    }
    best_fitness, results, save_dir = train(
        data=synth_dataset,
        cfg=MICRO_SPEC,
        hyp=hyp,
        epochs=2,
        batch_size=8,
        imgsz=96,
        noautoanchor=True,
        patience=100,
        save_dir=tmp_path / "exp",
        max_labels=8,
        rect_val=False,
    )
    # artifacts
    assert (tmp_path / "exp" / "results.csv").exists()
    assert (tmp_path / "exp" / "hyp.yaml").exists()
    assert (tmp_path / "exp" / "weights" / "last" / "checkpoint.yaml").exists()
    assert (tmp_path / "exp" / "weights" / "best" / "checkpoint.yaml").exists()
    assert np.isfinite(best_fitness)

    # reload checkpoint -> detect on a training image
    from yolov3_tpu.cli import detect as detect_cli

    src = Path(synth_dataset["path"]) / "images" / "train" / "000.jpg"
    out_dir = detect_cli.run(
        weights=tmp_path / "exp" / "weights" / "last",
        source=str(src),
        imgsz=(96, 96),
        conf_thres=0.001,
        project=str(tmp_path / "detect"),
        save_txt=True,
    )
    assert (Path(out_dir) / "000.jpg").exists()


@pytest.mark.slow
def test_training_learns_to_detect(synth_dataset, tmp_path):
    """Training moves mAP, not just loss: the rectangles' boxes ARE the labels,
    so a micro model trained for a few dozen steps must separate from random
    init by a wide mAP50 margin on the train split. This is the in-suite analog
    of the reference CI's qualitative train->val gate (SURVEY.md §4) plus the
    benchmarks.py --hard-fail metric floor (reference benchmarks.py:114-117):
    it catches optimizer/loss/assignment regressions that keep the loss finite
    but stop the model from actually learning.
    """
    import numpy as np

    from yolov3_tpu.eval import validator
    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.models.loading import load_weights
    from yolov3_tpu.train.loop import train

    hyp = {
        "lr0": 0.05, "lrf": 0.2, "momentum": 0.9, "weight_decay": 0.0,
        "warmup_epochs": 0.0, "box": 0.05, "cls": 0.5, "obj": 1.0, "anchor_t": 4.0,
        "hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "degrees": 0.0, "translate": 0.0,
        "scale": 0.0, "shear": 0.0, "perspective": 0.0, "flipud": 0.0, "fliplr": 0.0,
        "mosaic": 0.0, "mixup": 0.0, "copy_paste": 0.0,
    }
    # 300 steps (1 batch/epoch) reaches mAP50 ~0.95+; 400 measured 0.986
    train(
        data=synth_dataset, cfg=MICRO_SPEC, hyp=hyp, epochs=300, batch_size=8,
        imgsz=96, noautoanchor=True, noval=True, max_labels=8,
        save_dir=tmp_path / "exp",
    )

    def map50_of(model):
        results, _, _ = validator.run(
            synth_dataset, model=model, batch_size=8, imgsz=96, rect=False,
            conf_thres=0.001, iou_thres=0.6, save_dir=tmp_path, workers=0,
        )
        return float(results[2])

    trained = map50_of(load_weights(tmp_path / "exp" / "weights" / "last"))
    untrained = map50_of(DetectionModel.from_config(dict(MICRO_SPEC), imgsz=96))
    assert trained > 0.5, f"trained mAP50 {trained:.3f} — training did not learn the dataset"
    assert trained > untrained + 0.4, f"trained {trained:.3f} vs untrained {untrained:.3f}"


def test_resume_roundtrip(synth_dataset, tmp_path):
    """Checkpoint save -> resume continues from the next epoch."""
    from yolov3_tpu.train.loop import train

    hyp = {"lr0": 0.01, "lrf": 0.1, "momentum": 0.9, "weight_decay": 0.0, "warmup_epochs": 0.0,
           "mosaic": 0.0, "fliplr": 0.0}
    kw = dict(
        data=synth_dataset, cfg=MICRO_SPEC, hyp=hyp, batch_size=8, imgsz=96,
        noautoanchor=True, noval=True, max_labels=8, save_dir=tmp_path / "exp",
    )
    train(epochs=1, **kw)
    best, results, save_dir = train(epochs=2, resume=True, **kw)
    import csv

    with open(save_dir / "results.csv") as f:
        rows = list(csv.reader(f))
    epochs_logged = [r[0] for r in rows[1:]]
    assert "1" in epochs_logged  # epoch index 1 = the resumed second epoch
