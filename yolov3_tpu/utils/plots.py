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


def plot_pr_curve(px, py, ap, save_path=Path("pr_curve.png"), names=()):
    """Per-class precision-recall curves + mean AP@0.5 (ultralytics plot_pr_curve analog)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(py, axis=1) if isinstance(py, list) else py
    if 0 < len(names) < 21:
        for i, y in enumerate(py.T):
            ax.plot(px, y, linewidth=1, label=f"{names[i]} {ap[i, 0]:.3f}")
    else:
        ax.plot(px, py, linewidth=1, color="grey")
    ax.plot(px, py.mean(1), linewidth=3, color="blue", label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(save_path, dpi=250)
    plt.close(fig)
    return save_path


def plot_mc_curve(px, py, save_path=Path("mc_curve.png"), names=(), xlabel="Confidence", ylabel="Metric"):
    """Metric-vs-confidence curves (F1/P/R) (ultralytics plot_mc_curve analog)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i, y in enumerate(py):
            ax.plot(px, y, linewidth=1, label=str(names[i]))
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = py.mean(0)
    ax.plot(px, y, linewidth=3, color="blue", label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(bbox_to_anchor=(1.04, 1), loc="upper left")
    fig.savefig(save_path, dpi=250)
    plt.close(fig)
    return save_path


def plot_confusion_matrix(matrix, names=(), save_path=Path("confusion_matrix.png"), normalize=True):
    """Confusion-matrix heatmap (reference metrics.py ConfusionMatrix.plot analog)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    m = matrix.copy().astype(float)
    if normalize:
        m /= (m.sum(0, keepdims=True) + 1e-9)
    m[m < 0.005] = np.nan
    fig, ax = plt.subplots(figsize=(10, 8), tight_layout=True)
    im = ax.imshow(m, cmap="Blues", vmin=0.0)
    fig.colorbar(im)
    labels = [*names, "background"] if names else None
    n = m.shape[0]
    if labels and len(labels) == n:
        ax.set_xticks(range(n), labels=labels, rotation=90, fontsize=8)
        ax.set_yticks(range(n), labels=labels, fontsize=8)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.savefig(save_path, dpi=250)
    plt.close(fig)
    return save_path


def plot_labels(labels, names=(), save_dir=Path(".")):
    """Label statistics: class histogram + box center/size distributions
    (reference plots.py:198-240 labels correlogram, matplotlib-only)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    c = labels[:, 0]
    boxes = labels[:, 1:5]
    fig, axes = plt.subplots(2, 2, figsize=(10, 10), tight_layout=True)
    nc = int(c.max() + 1) if len(c) else 1
    axes[0, 0].hist(c, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_xlabel("class")
    axes[0, 1].scatter(boxes[:, 0], boxes[:, 1], s=3, alpha=0.4)
    axes[0, 1].set_xlabel("x")
    axes[0, 1].set_ylabel("y")
    axes[1, 0].scatter(boxes[:, 2], boxes[:, 3], s=3, alpha=0.4)
    axes[1, 0].set_xlabel("width")
    axes[1, 0].set_ylabel("height")
    axes[1, 1].hist2d(boxes[:, 2], boxes[:, 3], bins=50, cmap="Blues")
    axes[1, 1].set_xlabel("width")
    axes[1, 1].set_ylabel("height")
    out = Path(save_dir) / "labels.png"
    fig.savefig(out, dpi=200)
    plt.close(fig)
    return out


def plot_evolve(evolve_csv, save_path=None):
    """Hyperparameter-evolution scatter matrix (reference plots.py:243-267)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import pandas as pd

    df = pd.read_csv(evolve_csv)
    keys = [c for c in df.columns if c not in ("P", "R", "mAP50", "mAP50-95")]
    f = (df[["P", "R", "mAP50", "mAP50-95"]].values * [0.0, 0.0, 0.1, 0.9]).sum(1)
    n = len(keys)
    ncols = 6
    nrows = int(np.ceil(n / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(2.5 * ncols, 2.5 * nrows), tight_layout=True)
    for ax, k in zip(np.ravel(axes), keys):
        ax.scatter(df[k], f, c=f, cmap="viridis", s=12, alpha=0.7)
        best = df[k].iloc[f.argmax()]
        ax.set_title(f"{k} = {best:.3g}", fontsize=8)
    out = save_path or Path(evolve_csv).with_suffix(".png")
    fig.savefig(out, dpi=200)
    plt.close(fig)
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


def plot_labels_correlogram(labels, save_dir=Path(".")):
    """Pairwise (x, y, w, h) label correlogram (reference plots.py:198-215
    seaborn pairplot); gated on seaborn availability."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import pandas as pd
        import seaborn as sn

        labels = np.asarray(labels)
        if not len(labels):
            return None
        df = pd.DataFrame(labels[:, 1:5], columns=["x", "y", "width", "height"])
        sn.pairplot(df, corner=True, diag_kind="auto", kind="hist",
                    diag_kws=dict(bins=50), plot_kws=dict(pmax=0.9))
        out = Path(save_dir) / "labels_correlogram.jpg"
        import matplotlib.pyplot as plt

        plt.savefig(out, dpi=200)
        plt.close()
        return out
    except Exception as e:  # noqa: BLE001
        LOGGER.warning(f"labels correlogram failed: {e}")
        return None
