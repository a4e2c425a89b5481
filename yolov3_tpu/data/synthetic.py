"""Synthetic shapes dataset generator — a hermetic coco128 stand-in.

The reference's universal smoke-test dataset is coco128, auto-downloaded from
GitHub (reference data/coco128.yaml). In zero-egress environments this module
generates an equivalent fixture: images of colored geometric shapes on
textured backgrounds with exact YOLO labels, in the standard
images/labels layout.

    python -m yolov3_tpu.data.synthetic --out ../datasets/shapes128 --n 128
"""

from __future__ import annotations

from pathlib import Path

import cv2
import numpy as np

from yolov3_tpu.utils.general import LOGGER, yaml_save

CLASSES = ("circle", "square", "triangle", "ring", "cross")


def _draw_shape(im, cls, cx, cy, r, color):
    if cls == 0:  # circle
        cv2.circle(im, (cx, cy), r, color, -1)
    elif cls == 1:  # square
        cv2.rectangle(im, (cx - r, cy - r), (cx + r, cy + r), color, -1)
    elif cls == 2:  # triangle
        pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]], np.int32)
        cv2.fillPoly(im, [pts], color)
    elif cls == 3:  # ring
        cv2.circle(im, (cx, cy), r, color, max(2, r // 3))
    else:  # cross
        w = max(2, r // 3)
        cv2.rectangle(im, (cx - r, cy - w), (cx + r, cy + w), color, -1)
        cv2.rectangle(im, (cx - w, cy - r), (cx + w, cy + r), color, -1)


def generate(out_dir, n_images=128, imgsz=320, max_objects=6, seed=0, split="train"):
    """Generate the dataset; returns a dataset-dict usable by check_dataset."""
    out = Path(out_dir)
    img_dir = out / "images" / split
    lbl_dir = out / "labels" / split
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)

    for i in range(n_images):
        h = int(rng.integers(imgsz * 3 // 4, imgsz * 5 // 4))
        w = int(rng.integers(imgsz * 3 // 4, imgsz * 5 // 4))
        # textured background
        im = rng.integers(60, 190, (h // 8, w // 8, 3), dtype=np.uint8)
        im = cv2.resize(im, (w, h), interpolation=cv2.INTER_LINEAR)
        lines = []
        for _ in range(int(rng.integers(1, max_objects + 1))):
            cls = int(rng.integers(0, len(CLASSES)))
            r = int(rng.integers(max(6, imgsz // 24), imgsz // 5))
            cx = int(rng.integers(r, w - r))
            cy = int(rng.integers(r, h - r))
            color = tuple(int(c) for c in rng.integers(0, 255, 3))
            _draw_shape(im, cls, cx, cy, r, color)
            bw = bh = 2 * r
            lines.append(f"{cls} {cx / w:.6f} {cy / h:.6f} {bw / w:.6f} {bh / h:.6f}")
        noise = rng.normal(0, 6, im.shape)
        im = np.clip(im.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i:05d}.jpg"), im, [cv2.IMWRITE_JPEG_QUALITY, 90])
        (lbl_dir / f"{i:05d}.txt").write_text("\n".join(lines))

    data = {
        "path": str(out.resolve()),
        "train": f"images/{split}",
        "val": f"images/{split}",
        "names": dict(enumerate(CLASSES)),
    }
    yaml_save(out / "dataset.yaml", {**data, "names": {int(k): v for k, v in data["names"].items()}})
    LOGGER.info(f"synthetic shapes dataset: {n_images} images -> {out}")
    return data


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--out", default="../datasets/shapes128")
    p.add_argument("--n", type=int, default=128)
    p.add_argument("--imgsz", type=int, default=320)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()
    generate(a.out, a.n, a.imgsz, seed=a.seed)
