"""AutoShape + Detections: the robust "pass anything" inference API.

Counterpart of reference models/common.py:771-1029: AutoShape accepts
filenames, URLs, PIL images, numpy arrays, or batches thereof; letterboxes to
a common stride-multiple shape; runs the jitted forward + NMS; and returns a
`Detections` object with xyxy/xywh (pixel + normalized) views, pandas export,
crop/save/render, and per-stage timing.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from yolov3_tpu.data.augment import letterbox
from yolov3_tpu.ops.boxes import scale_boxes, xyxy2xywh
from yolov3_tpu.utils.general import LOGGER, Profile, increment_path
from yolov3_tpu.utils.plots import Annotator, colors, save_one_box


class AutoShape:
    """Input-robust wrapper around a DetectionModel."""

    conf = 0.25
    iou = 0.45
    agnostic = False
    multi_label = False
    classes = None
    max_det = 1000

    def __init__(self, model):
        from yolov3_tpu.models.detection import optimize_for_inference

        if hasattr(model, "models"):  # Ensemble: optimize every member
            from yolov3_tpu.models.ensemble import Ensemble

            model = Ensemble([optimize_for_inference(m) for m in model.models])
        self.model = optimize_for_inference(model) if hasattr(model, "fuse") else model
        self.names = model.names
        self.stride = int(model.stride)
        self._infer = {}  # keyed on the NMS settings: attr mutations take effect

    def _build_infer(self):
        import jax
        import jax.numpy as jnp

        from yolov3_tpu.models.detect_head import decode_predictions
        from yolov3_tpu.ops.nms import batched_nms

        conf, iou = self.conf, self.iou
        classes = tuple(self.classes) if self.classes else None
        members = getattr(self.model, "models", None)  # Ensemble -> all members

        def decode_one(m, variables, x):
            feats = m.module.apply(variables, x, train=False)
            return decode_predictions(feats, m.anchors_px, m.spec.strides)

        @jax.jit
        def infer(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            if members is None:
                pred = decode_one(self.model, variables, x)
            else:  # concat-NMS ensemble (reference experimental.py:83)
                pred = jnp.concatenate(
                    [decode_one(m, v, x) for m, v in zip(members, variables)], axis=1
                )
            return batched_nms(
                pred, conf_thres=conf, iou_thres=iou, classes=classes,
                agnostic=self.agnostic, multi_label=self.multi_label,
                max_det=self.max_det, max_nms=8192,
            )

        return infer

    def __call__(self, ims, size=640):
        """Run inference on flexible input(s); returns a Detections object."""
        dt = (Profile(), Profile(), Profile())
        with dt[0]:
            ims_list = ims if isinstance(ims, (list, tuple)) else [ims]
            loaded, files, shape0 = [], [], []
            for i, im in enumerate(ims_list):
                f = f"image{i}"
                if isinstance(im, (str, Path)):
                    f = str(im)
                    im = _imread_any(im)
                elif hasattr(im, "convert"):  # PIL
                    f = getattr(im, "filename", f) or f
                    im = np.asarray(im.convert("RGB"))
                im = np.asarray(im)
                if im.ndim == 2:
                    im = np.stack([im] * 3, -1)
                if im.shape[0] < 5 and im.ndim == 3:  # CHW -> HWC
                    im = im.transpose(1, 2, 0)
                im = im[..., :3]
                # always keep an image suffix so Detections.save()'s imwrite
                # has a writable extension (reference common.py:792)
                files.append(Path(Path(f).name or f"image{i}").with_suffix(".jpg").name)
                shape0.append(im.shape[:2])
                loaded.append(im)
            # common letterbox shape (max over batch, snapped to stride)
            g = max(max(s) for s in shape0)
            target = int(np.ceil(size / self.stride) * self.stride)
            batch = np.stack(
                [letterbox(im[:, :, ::-1], (target, target), auto=False)[0][:, :, ::-1] for im in loaded]
            )

        with dt[1]:
            import jax

            # the reference AutoShape reads conf/iou/classes/... per forward
            # (common.py:771-812); cache one jitted program per settings tuple
            key = (self.conf, self.iou, tuple(self.classes) if self.classes else None,
                   self.agnostic, self.multi_label, self.max_det)
            if key not in self._infer:
                self._infer[key] = self._build_infer()
            dets, n_valid = self._infer[key](self.model.variables, jax.device_put(np.ascontiguousarray(batch)))
            dets = np.asarray(dets)
            n_valid = np.asarray(n_valid)

        with dt[2]:
            preds = []
            for i in range(len(loaded)):
                p = dets[i, : n_valid[i]].copy()
                if len(p):
                    p[:, :4] = np.asarray(scale_boxes((target, target), p[:, :4], shape0[i]))
                preds.append(p)

        return Detections(loaded, preds, files, [d.t * 1e3 for d in dt], self.names, batch.shape)


def _imread_any(path):
    import cv2

    p = str(path)
    if p.startswith("http"):
        import urllib.request

        from PIL import Image

        return np.asarray(Image.open(urllib.request.urlopen(p)).convert("RGB"))
    im = cv2.imread(p)
    assert im is not None, f"Image not found {p}"
    return im[:, :, ::-1]  # BGR -> RGB


class Detections:
    """Inference results container (reference common.py:881-1029)."""

    def __init__(self, ims, preds, files, times=(0, 0, 0), names=None, shape=None):
        self.ims = ims  # RGB numpy images
        self.pred = preds  # list of (n,6) [xyxy, conf, cls]
        self.files = files
        self.names = names or {}
        self.times = times
        self.n = len(ims)
        self.t = tuple(t / max(self.n, 1) for t in times)
        self.s = shape

    @property
    def xyxy(self):
        return self.pred

    @property
    def xywh(self):
        return [np.concatenate([xyxy2xywh(p[:, :4]), p[:, 4:]], 1) if len(p) else p for p in self.pred]

    @property
    def xyxyn(self):
        out = []
        for p, im in zip(self.pred, self.ims):
            g = np.array([im.shape[1], im.shape[0], im.shape[1], im.shape[0], 1, 1])
            out.append(p / g if len(p) else p)
        return out

    @property
    def xywhn(self):
        out = []
        for p, im in zip(self.xywh, self.ims):
            g = np.array([im.shape[1], im.shape[0], im.shape[1], im.shape[0], 1, 1])
            out.append(p / g if len(p) else p)
        return out

    def pandas(self):
        """Return a namespace of DataFrames keyed by box format."""
        import pandas as pd
        import types

        cols = ["xmin", "ymin", "xmax", "ymax", "confidence", "class"]
        out = types.SimpleNamespace()
        for attr, c in (("xyxy", cols), ("xyxyn", cols), ("xywh", ["xcenter", "ycenter", "width", "height", "confidence", "class"]), ("xywhn", ["xcenter", "ycenter", "width", "height", "confidence", "class"])):
            dfs = []
            for p in getattr(self, attr):
                df = pd.DataFrame(np.asarray(p, np.float64), columns=c)
                df["name"] = [self.names.get(int(x), str(int(x))) for x in df["class"]] if len(df) else []
                dfs.append(df)
            setattr(out, attr, dfs)
        return out

    def _run(self, pprint=False, show=False, save=False, crop=False, render=False, labels=True, save_dir=Path("")):
        s = ""
        crops = []
        for i, (im, pred) in enumerate(zip(self.ims, self.pred)):
            s += f"\nimage {i + 1}/{self.n}: {im.shape[0]}x{im.shape[1]} "
            if len(pred):
                for c in np.unique(pred[:, 5]):
                    n = int((pred[:, 5] == c).sum())
                    s += f"{n} {self.names.get(int(c), int(c))}{'s' * (n > 1)}, "
                im_bgr = np.ascontiguousarray(im[:, :, ::-1])
                annotator = Annotator(im_bgr)
                for *box, conf, cls in reversed(pred.tolist()):
                    label = f"{self.names.get(int(cls), int(cls))} {conf:.2f}"
                    if crop:
                        crops.append(
                            {
                                "box": box, "conf": conf, "cls": cls,
                                "label": label,
                                "im": save_one_box(box, im_bgr, file=save_dir / "crops" / f"{self.files[i]}", save=save),
                            }
                        )
                    else:
                        annotator.box_label(box, label if labels else "", color=colors(cls, True))
                result = annotator.result()[:, :, ::-1]
            else:
                s += "(no detections)"
                result = im
            if render:
                self.ims[i] = result
            if show:
                try:
                    from PIL import Image

                    Image.fromarray(result).show(self.files[i])
                except Exception as e:  # noqa: BLE001 — headless environments
                    LOGGER.warning(f"show() failed: {e}")
            if save:
                import cv2

                save_dir.mkdir(parents=True, exist_ok=True)
                cv2.imwrite(str(save_dir / self.files[i]), result[:, :, ::-1])
        if pprint:
            s += f"\nSpeed: {self.t[0]:.1f}ms pre, {self.t[1]:.1f}ms inference, {self.t[2]:.1f}ms post per image"
            LOGGER.info(s)
        return crops if crop else self

    def print(self):
        return self._run(pprint=True)

    def show(self, labels=True):
        return self._run(show=True, labels=labels)

    def save(self, labels=True, save_dir="runs/detect/exp", exist_ok=False):
        return self._run(save=True, labels=labels, save_dir=increment_path(save_dir, exist_ok, mkdir=True))

    def crop(self, save=True, save_dir="runs/detect/exp", exist_ok=False):
        return self._run(crop=True, save=save, save_dir=increment_path(save_dir, exist_ok, mkdir=True))

    def render(self, labels=True):
        self._run(render=True, labels=labels)
        return self.ims

    def tolist(self):
        """Split into a list of single-image Detections (reference common.py:1000-1007)."""
        return [
            Detections([self.ims[i]], [self.pred[i]], [self.files[i]],
                       self.times, self.names, self.s)
            for i in range(self.n)
        ]

    def __len__(self):
        return self.n

    def __repr__(self):
        self.print()
        return f"Detections(n={self.n})"
