"""Full-scale training demo: yolov3 (61.9M params) @ 640 on TPU.

Synthetic rectangles dataset (zero-egress stand-in for COCO); demonstrates
stable full-resolution training of the flagship — loss curves, per-epoch EMA
validation, checkpointing — and records artifacts under docs/train640/.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
from pathlib import Path

import cv2
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def make_dataset(root: Path, n=64, size=640, seed=0):
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    rng = np.random.default_rng(seed)
    names = {0: "red-box", 1: "blue-box", 2: "green-disc"}
    for i in range(n):
        im = np.full((size, size, 3), 114, np.uint8)
        lines = []
        for _ in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(0, 3))
            w, h = int(rng.integers(80, 280)), int(rng.integers(80, 280))
            x1 = int(rng.integers(0, size - w))
            y1 = int(rng.integers(0, size - h))
            color = [(40, 40, 220), (220, 40, 40), (40, 200, 40)][cls]
            if cls == 2:
                cv2.ellipse(im, (x1 + w // 2, y1 + h // 2), (w // 2, h // 2), 0, 0, 360, color, -1)
            else:
                cv2.rectangle(im, (x1, y1), (x1 + w, y1 + h), color, -1)
            lines.append(
                f"{cls} {(x1 + w / 2) / size:.6f} {(y1 + h / 2) / size:.6f} {w / size:.6f} {h / size:.6f}"
            )
        cv2.imwrite(str(root / "images/train" / f"{i:04d}.jpg"), im)
        (root / "labels/train" / f"{i:04d}.txt").write_text("\n".join(lines))
    return {"path": str(root), "train": "images/train", "val": "images/train", "names": names}


def main(epochs=12, batch=16, imgsz=640):
    from yolov3_tpu.train.loop import train
    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()
    root = Path(tempfile.mkdtemp(prefix="train640_"))
    data = make_dataset(root, n=64, size=imgsz)
    save_dir = root / "exp"
    hyp = {
        "lr0": 0.01, "lrf": 0.1, "momentum": 0.937, "weight_decay": 0.0005,
        "warmup_epochs": 1.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.1,
        "box": 0.05, "obj": 1.0, "cls": 0.5, "anchor_t": 4.0,
        "mosaic": 1.0, "mixup": 0.0, "fliplr": 0.5, "flipud": 0.0,
        "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
        "degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0, "perspective": 0.0,
    }
    best, results, sd = train(
        data=data, cfg="yolov3", hyp=hyp, epochs=epochs, batch_size=batch, imgsz=imgsz,
        save_dir=save_dir, noautoanchor=True, workers=2, cache_images="ram", patience=300,
    )
    out = REPO / "docs" / "train640"
    out.mkdir(parents=True, exist_ok=True)
    for f in ("results.csv", "results.png", "labels.png", "labels_correlogram.jpg",
              "train_batch0.jpg", "PR_curve.png", "confusion_matrix.png"):
        src = save_dir / f
        if src.exists():
            shutil.copyfile(src, out / f)
    print(f"demo done: best fitness {best:.4f}, final results {results}")
    print(f"artifacts -> {out}")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--imgsz", type=int, default=640)
    a = p.parse_args()
    main(a.epochs, a.batch, a.imgsz)
