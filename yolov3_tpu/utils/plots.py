"""Plotting + annotation: box drawing, batch mosaics, results curves.

Host-side (PIL/cv2/matplotlib) counterparts of the reference's plotting stack
(reference utils/plots.py and the ultralytics Annotator/colors it imports).
"""

from __future__ import annotations

import contextlib
import math
from pathlib import Path

import cv2
import numpy as np

from yolov3_tpu.ops.boxes import xywh2xyxy
from yolov3_tpu.utils.general import LOGGER


class Colors:
    """Ultralytics-style color palette keyed by class id."""

    def __init__(self):
        hexs = (
            "FF3838", "FF9D97", "FF701F", "FFB21D", "CFD231", "48F90A", "92CC17", "3DDB86", "1A9334", "00D4BB",
            "2C99A8", "00C2FF", "344593", "6473FF", "0018EC", "8438FF", "520085", "CB38FF", "FF95C8", "FF37C7",
        )  # fmt: skip
        self.palette = [self._hex2rgb(f"#{c}") for c in hexs]
        self.n = len(self.palette)

    @staticmethod
    def _hex2rgb(h):
        return tuple(int(h[1 + i : 1 + i + 2], 16) for i in (0, 2, 4))

    def __call__(self, i, bgr=False):
        c = self.palette[int(i) % self.n]
        return (c[2], c[1], c[0]) if bgr else c


colors = Colors()


class Annotator:
    """Draw boxes/labels on an image (cv2 backend; input BGR uint8 HWC)."""

    def __init__(self, im, line_width=None, font_size=None):
        assert im.data.contiguous, "Annotator input must be contiguous (np.ascontiguousarray(im))"
        self.im = im
        self.lw = line_width or max(round(sum(im.shape) / 2 * 0.003), 2)

    def box_label(self, box, label="", color=(128, 128, 128), txt_color=(255, 255, 255)):
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(self.im, p1, p2, color, thickness=self.lw, lineType=cv2.LINE_AA)
        if label:
            tf = max(self.lw - 1, 1)
            w, h = cv2.getTextSize(label, 0, fontScale=self.lw / 3, thickness=tf)[0]
            outside = p1[1] - h >= 3
            p2 = p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3
            cv2.rectangle(self.im, p1, p2, color, -1, cv2.LINE_AA)
            cv2.putText(
                self.im, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                0, self.lw / 3, txt_color, thickness=tf, lineType=cv2.LINE_AA,
            )

    def rectangle(self, xy, fill=None, outline=(128, 128, 128), width=1):
        cv2.rectangle(self.im, (int(xy[0]), int(xy[1])), (int(xy[2]), int(xy[3])), outline, width)

    def result(self):
        return self.im


def save_one_box(xyxy, im, file=Path("im.jpg"), gain=1.02, pad=10, square=False, BGR=True, save=True):
    """Crop a box from an image with margin and save (detect --save-crop)."""
    b = np.asarray(xyxy, np.float32).reshape(-1, 4)
    xywh = np.concatenate([(b[:, :2] + b[:, 2:]) / 2, (b[:, 2:] - b[:, :2])], 1)
    if square:
        xywh[:, 2:] = xywh[:, 2:].max(1, keepdims=True)
    xywh[:, 2:] = xywh[:, 2:] * gain + pad
    b = xywh2xyxy(xywh).astype(int)
    h, w = im.shape[:2]
    x1, y1, x2, y2 = max(b[0, 0], 0), max(b[0, 1], 0), min(b[0, 2], w), min(b[0, 3], h)
    crop = im[y1:y2, x1:x2, :: (1 if BGR else -1)]
    if save:
        file.parent.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(file), crop)
    return crop


def plot_images(images, targets, masks=None, paths=None, fname="images.jpg", names=None, max_subplots=16):
    """Tiled batch mosaic with boxes (reference plots.py:82-145).

    images: (B,H,W,3) uint8 RGB; targets: (B,M,5) [cls,xywhn] (+mask) or
    (n,6) [img,cls,xywhn]."""
    bs = min(len(images), max_subplots)
    ns = math.ceil(bs**0.5)
    h, w = images.shape[1:3]
    grid = np.full((ns * h, ns * w, 3), 255, np.uint8)
    for i in range(bs):
        y, x = (i // ns) * h, (i % ns) * w
        grid[y : y + h, x : x + w] = images[i][..., ::-1]  # to BGR for cv2
        ann = Annotator(np.ascontiguousarray(grid))
        grid = ann.im
        if targets is not None:
            t = targets[i]
            valid = masks[i] if masks is not None else (t[:, 3] > 0)
            for row in t[valid]:
                cls, cx, cy, bw, bh = row[:5]
                box = [
                    x + (cx - bw / 2) * w, y + (cy - bh / 2) * h,
                    x + (cx + bw / 2) * w, y + (cy + bh / 2) * h,
                ]
                label = names.get(int(cls), str(int(cls))) if names else str(int(cls))
                ann.box_label(box, label, color=colors(cls, True))
            grid = ann.im
    cv2.imwrite(str(fname), grid)
    return grid


def plot_results(csv_file="results.csv", save_path=None):
    """Plot training curves from results.csv (reference plots.py:270-294)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(csv_file)
    cols = [c for c in df.columns if c != "epoch"]
    n = len(cols)
    ncols = 5
    nrows = math.ceil(n / ncols)
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 2.5 * nrows), tight_layout=True)
    for ax, c in zip(np.ravel(axes), cols):
        ax.plot(df["epoch"], df[c], marker=".", linewidth=1, markersize=4)
        ax.set_title(c, fontsize=9)
    out = save_path or Path(csv_file).with_name("results.png")
    fig.savefig(out, dpi=150)
    plt.close(fig)
    LOGGER.info(f"Saved results plot to {out}")
    return out


def feature_visualization(x, module_type, stage, n=32, save_dir=Path("runs/detect/exp")):
    """Save a grid of feature-map channels for one layer (reference plots.py:30-57)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    x = np.asarray(x)
    if x.ndim != 4:
        return
    _, h, w, c = x.shape
    if h <= 1 or w <= 1:
        return
    f = save_dir / f"stage{stage}_{module_type.split('.')[-1]}_features.png"
    n = min(n, c)
    fig, ax = plt.subplots(math.ceil(n / 8), 8, tight_layout=True)
    ax = np.ravel(ax)
    for i in range(n):
        ax[i].imshow(x[0, :, :, i])
        ax[i].axis("off")
    with contextlib.suppress(Exception):
        fig.savefig(f, dpi=300, bbox_inches="tight")
    plt.close(fig)
    LOGGER.info(f"Saved feature visualization to {f}")
