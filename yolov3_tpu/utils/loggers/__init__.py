"""Loggers hub: fan-out of training events to CSV / TensorBoard / W&B / ClearML / Comet.

Counterpart of reference utils/loggers/__init__.py:63-420: a `Loggers` object
exposing the callback-hook methods; CSV always on, other sinks activate when
their packages + credentials exist. Third-party sinks are thin adapters —
they receive plain floats/paths, never device arrays.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path

from yolov3_tpu.utils.general import LOGGER, colorstr

LOGGERS = ("csv", "tb", "wandb", "clearml", "comet")

KEYS = (
    "train/box_loss", "train/obj_loss", "train/cls_loss",
    "metrics/precision", "metrics/recall", "metrics/mAP_0.5", "metrics/mAP_0.5:0.95",
    "val/box_loss", "val/obj_loss", "val/cls_loss", "x/lr0", "x/lr1", "x/lr2",
)  # fmt: skip


class Loggers:
    """Aggregates available logging sinks behind the callback-hook interface."""

    def __init__(self, save_dir=None, opt=None, hyp=None, include=LOGGERS, plots=True):
        self.save_dir = Path(save_dir or ".")
        self.opt = opt
        self.hyp = hyp
        self.plots = plots  # --noplots disables image artifacts (reference train.py:177)
        self.keys = KEYS
        self.csv_file = self.save_dir / "results.csv"
        self.tb = None
        self.wandb = None
        self.clearml = None
        self.comet = None
        # bbox-image logging cadence (reference wandb_utils.py:89-93 /
        # comet __init__.py:139-142): -1 resolves to epochs//10 (min 1)
        epochs = int(getattr(opt, "epochs", 0) or 0) if opt else 0
        self.bbox_interval = int(getattr(opt, "bbox_interval", -1) or -1) if opt else -1
        if self.bbox_interval == -1:
            self.bbox_interval = max(1, epochs // 10) if epochs > 10 else 1

        if "tb" in include:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(str(self.save_dir))
                LOGGER.info(f"{colorstr('TensorBoard:')} start with 'tensorboard --logdir {self.save_dir.parent}'")
            except Exception:  # noqa: BLE001
                try:
                    import tensorflow as tf

                    self.tb = _TFSummaryWriter(tf, str(self.save_dir))
                except Exception:  # noqa: BLE001
                    self.tb = None
        if "wandb" in include and os.environ.get("WANDB_API_KEY"):
            try:
                import wandb

                # project/name/entity/resume plumbing per reference
                # wandb_utils.py:64-73: project from --project (stem unless the
                # default), name from --name unless the default "exp", resume
                # by run id ("wandb-run://<id>" in --resume or WANDB_RUN_ID).
                project = getattr(opt, "project", None)
                project = Path(project).stem if project and Path(project).stem not in ("train", "runs") else "yolov3_tpu"
                name = getattr(opt, "name", None)
                run_id = os.environ.get("WANDB_RUN_ID")
                resume = getattr(opt, "resume", None)
                if isinstance(resume, str) and resume.startswith("wandb-run://"):
                    run_id = resume[len("wandb-run://"):]
                self.wandb = wandb.init(
                    project=project, entity=getattr(opt, "entity", None),
                    name=None if name in (None, "exp") else name,
                    id=run_id, resume="allow", allow_val_change=True,
                    config={"opt": opt, "hyp": hyp},
                )
            except Exception:  # noqa: BLE001
                self.wandb = None
        if "clearml" in include:
            try:
                from clearml import Task

                self.clearml = Task.init(project_name="yolov3_tpu", task_name=str(self.save_dir.name))
            except Exception:  # noqa: BLE001
                self.clearml = None
        if "comet" in include and os.environ.get("COMET_API_KEY"):
            try:
                import comet_ml

                self.comet = comet_ml.Experiment(project_name="yolov3_tpu")
            except Exception:  # noqa: BLE001
                self.comet = None
        # per-image prediction logging state (reference comet/__init__.py
        # logged_images_count/metadata_dict) + the epoch the val belongs to
        self._comet_pred_state = {}
        self._clearml_logged_images = 0
        self._epoch = 0

    # -- hook methods ------------------------------------------------------
    def on_val_image_end(self, predn, path, names, labelsn=None):
        """Per-image prediction logging during validation (reference
        loggers/__init__.py:210 -> ClearML bbox images, and the Comet
        prediction/annotation depth comet/__init__.py:258-296): detections in
        native image space with class names — Comet gets the image + an
        annotation-metadata entry (flushed as image-metadata.json at train
        end), ClearML gets the drawn bbox image (capped at 16/epoch like the
        reference's debug samples)."""
        names = names if isinstance(names, dict) else dict(enumerate(names or ()))
        if self.comet:
            from yolov3_tpu.utils.loggers.comet_utils import log_predictions

            log_predictions(self.comet, predn, labelsn, path, names,
                            self._comet_pred_state, curr_epoch=self._epoch)
        if self.clearml and self._clearml_logged_images < 16 and len(predn):
            from yolov3_tpu.utils.loggers.clearml_utils import log_image_with_boxes

            log_image_with_boxes(self.clearml, path, predn, names,
                                 iteration=self._epoch)
            self._clearml_logged_images += 1

    def on_fit_epoch_end(self, vals, epoch):
        """Log the 13 standard keys at epoch end."""
        self._epoch = epoch
        self._clearml_logged_images = 0  # re-arm the per-epoch debug-image cap
        x = dict(zip(self.keys, list(vals) + [0.0] * (len(self.keys) - len(vals))))
        new = not self.csv_file.exists()
        with open(self.csv_file, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["epoch", *self.keys])
            w.writerow([epoch, *[f"{float(v):.6f}" for v in x.values()]])
        if self.tb:
            for k, v in x.items():
                self.tb.add_scalar(k, float(v), epoch)
        if self.wandb:
            self._wandb_log({**x, "epoch": epoch})
        if self.comet:
            self.comet.log_metrics(x, epoch=epoch)

    def log_model_graph(self, model, imgsz=640):
        """TB graph-trace analog (reference loggers/__init__.py:242-244 add_graph):
        the jitted forward's StableHLO module logged as TB text (XLA's graph IS
        the executed program — more faithful than a torch module trace)."""
        if not self.tb:
            return
        try:
            import jax
            import jax.numpy as jnp

            x = jnp.zeros((1, int(imgsz), int(imgsz), 3), model.dtype)
            hlo = jax.jit(lambda v, a: model.module.apply(v, a, train=False)).lower(
                model.variables, x
            ).as_text()
            text = hlo[:100_000]  # cap: full flagship HLO is MBs
            if hasattr(self.tb, "add_text"):
                self.tb.add_text("model/stablehlo", f"```\n{text}\n```", 0)
            LOGGER.info(f"TensorBoard: logged model graph ({len(hlo)} chars of StableHLO)")
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"model graph logging failed: {e}")

    def on_pretrain_routine_end(self, labels=None, names=()):
        """Label statistics plots at train start (reference loggers/__init__.py:112-122)."""
        if labels is None or not len(labels) or not self.plots:
            return
        try:
            from yolov3_tpu.utils.plots import plot_labels, plot_labels_correlogram

            plot_labels(labels, names, self.save_dir)
            plot_labels_correlogram(labels, self.save_dir)
            self._log_image_files(sorted(self.save_dir.glob("labels*.jpg")) +
                                  sorted(self.save_dir.glob("labels*.png")), "Labels", 0)
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"label plots failed: {e}")

    def on_train_batch_end(self, ni, imgs=None, targets=None, mask=None):
        """Mosaic the first 3 train batches (reference loggers/__init__.py:124-136)."""
        if imgs is None or ni >= 3 or not self.plots:
            return
        try:
            from yolov3_tpu.utils.plots import plot_images

            f = self.save_dir / f"train_batch{ni}.jpg"
            plot_images(imgs, targets, masks=mask, fname=f)
            if ni == 2:
                self._log_image_files(sorted(self.save_dir.glob("train_batch*.jpg")), "Mosaics", 0)
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"train batch mosaic failed: {e}")

    def on_val_end(self, epoch=0):
        """Forward val plot artifacts (PR/F1/confusion, batch mosaics) to image
        sinks. Per-epoch val bbox mosaics follow the --bbox_interval cadence
        (reference wandb_utils.py:89-93: every Nth epoch, default epochs//10)
        so long runs don't push hundreds of near-identical images."""
        files = [self.save_dir / n for n in
                 ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png", "confusion_matrix.png")]
        if self.bbox_interval > 0 and (epoch + 1) % self.bbox_interval == 0:
            files += sorted(self.save_dir.glob("val_batch*.jpg"))
        files = [f for f in files if f.exists()]
        self._log_image_files(files, "Validation", epoch)
        if self.clearml and files:
            try:
                from yolov3_tpu.utils.loggers.clearml_utils import log_debug_samples

                log_debug_samples(self.clearml, files, "Validation")
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"ClearML debug samples failed: {e}")

    def on_model_save(self, last=None, epoch=0, final=False, fitness=0.0, best=False,
                      save_period=-1):
        """Checkpoint artifacts to experiment trackers (reference
        loggers/__init__.py:178-190, wandb_utils.py log_model,
        comet_utils.py log_model). Heavy artifact uploads are gated by
        save_period exactly like the reference (every epoch would push the
        full orbax dir — hundreds of MB for the flagship — per epoch)."""
        if not last:
            return
        if not (final or (save_period > 0 and epoch % save_period == 0)):
            return
        if self.wandb:
            try:
                from yolov3_tpu.utils.loggers.wandb_utils import log_model as wandb_log_model

                self.wandb.log({"model/checkpoint": str(last), "epoch": epoch})
                wandb_log_model(self.wandb, last, epoch=epoch, fitness=fitness, best=best or final)
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"W&B model artifact failed: {e}")
        if self.comet:
            try:
                from yolov3_tpu.utils.loggers.comet_utils import log_model as comet_log_model

                self.comet.log_other(f"checkpoint_epoch_{epoch}", str(last))
                comet_log_model(self.comet, last, epoch=epoch, fitness=fitness, best=best or final)
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"Comet model artifact failed: {e}")

    def on_train_end(self, results_csv=None):
        if self.comet and self._comet_pred_state.get("metadata"):
            # image-metadata.json asset with every logged prediction's
            # annotations (reference comet/__init__.py:436-439)
            try:
                from yolov3_tpu.utils.loggers.comet_utils import flush_prediction_metadata

                flush_prediction_metadata(self.comet, self._comet_pred_state, self._epoch)
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"Comet prediction metadata flush failed: {e}")
        if results_csv and Path(results_csv).exists() and self.plots:
            try:
                from yolov3_tpu.utils.plots import plot_results

                plot_results(results_csv)
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"results plot failed: {e}")
        # final artifact push: results plot + last val mosaics regardless of
        # the --bbox_interval cadence (reference loggers/__init__.py on_train_end)
        finals = [self.save_dir / "results.png"] + sorted(self.save_dir.glob("val_batch*.jpg"))
        self._log_image_files([f for f in finals if f.exists()], "Results", 0)
        if self.tb and hasattr(self.tb, "flush"):
            self.tb.flush()
        if self.wandb:
            self.wandb.finish()

    def log_dataset_artifact(self, data_dict):
        """--upload_dataset: push the dataset as a W&B artifact (reference
        comet/__init__.py:344-363 / wandb dataset artifacts): metadata is the
        resolved data dict; assets are the split dirs/listing files. A string
        value (e.g. "val") uploads only that split."""
        if not self.wandb:
            return
        which = getattr(self.opt, "upload_dataset", True) if self.opt else True
        try:
            import wandb

            meta = {k: str(v) for k, v in data_dict.items() if k != "names"}
            meta["nc"] = int(data_dict.get("nc", len(data_dict.get("names", {}))))
            art = wandb.Artifact(
                name=data_dict.get("dataset_name", "yolov3-dataset"),
                type="dataset", metadata=meta)
            for split in ("train", "val", "test"):
                if isinstance(which, str) and split != which:
                    continue
                p = data_dict.get(split)
                for one in (p if isinstance(p, list) else [p] if p else []):
                    one = Path(one)
                    if one.is_dir() and hasattr(art, "add_dir"):
                        art.add_dir(str(one), name=split)
                    elif one.is_file():
                        art.add_file(str(one), name=f"{split}/{one.name}")
            self.wandb.log_artifact(art)
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"dataset artifact upload failed: {e}")

    def _wandb_log(self, payload):
        """Commit to W&B with the reference's failure semantics
        (wandb_utils.py:137-151 end_epoch): on any wandb error, warn, finish
        the run, and DISABLE the logger — training proceeds uninterrupted
        instead of failing or retrying a dead connection every epoch."""
        try:
            self.wandb.log(payload)
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(
                f"An error occurred in wandb; training will proceed without it. {e}"
            )
            try:
                self.wandb.finish()
            except Exception:  # noqa: BLE001
                pass
            self.wandb = None

    def _log_image_files(self, files, name, step):
        """Push image files to TB/W&B/Comet (reference TB image support)."""
        for f in files:
            f = Path(f)
            try:
                if self.tb and hasattr(self.tb, "add_image"):
                    import cv2
                    import numpy as np

                    im = cv2.imread(str(f))
                    if im is not None:
                        self.tb.add_image(f"{name}/{f.stem}", im[:, :, ::-1], step, dataformats="HWC")
                if self.wandb:
                    import wandb

                    self.wandb.log({f"{name}/{f.stem}": wandb.Image(str(f))})
                if self.comet:
                    self.comet.log_image(str(f), name=f"{name}/{f.stem}", step=step)
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"image logging failed for {f}: {e}")

    def attach(self, callbacks):
        """Register the full hook fan-out on a Callbacks bus
        (reference loggers/__init__.py:112-240)."""
        callbacks.register_action(
            "on_pretrain_routine_end", "loggers",
            lambda labels=None, names=(), **kw: self.on_pretrain_routine_end(labels, names),
        )
        callbacks.register_action(
            "on_train_batch_end", "loggers",
            lambda ni=3, imgs=None, targets=None, mask=None, **kw: self.on_train_batch_end(ni, imgs, targets, mask),
        )
        callbacks.register_action(
            "on_fit_epoch_end", "loggers",
            lambda epoch=0, fitness=0.0, vals=(), **kw: self.on_fit_epoch_end(vals or [fitness], epoch),
        )
        callbacks.register_action(
            "on_train_epoch_end", "loggers",
            lambda epoch=0, **kw: setattr(self, "_epoch", epoch),
        )
        callbacks.register_action(
            "on_val_image_end", "loggers",
            lambda predn=None, path=None, names=(), labelsn=None, **kw:
                self.on_val_image_end(predn, path, names, labelsn),
        )
        callbacks.register_action(
            "on_val_end", "loggers", lambda epoch=0, **kw: self.on_val_end(epoch)
        )
        callbacks.register_action(
            "on_model_save", "loggers",
            lambda last=None, epoch=0, final=False, fitness=0.0, best=False, save_period=-1, **kw:
                self.on_model_save(last, epoch, final, fitness, best, save_period),
        )
        callbacks.register_action("on_train_end", "loggers", lambda **kw: self.on_train_end(self.csv_file))
        return callbacks


class _TFSummaryWriter:
    """Minimal TensorBoard writer on top of tf.summary (when torch.utils.tensorboard is absent)."""

    def __init__(self, tf, logdir):
        self._tf = tf
        self._writer = tf.summary.create_file_writer(logdir)

    def add_scalar(self, tag, value, step):
        with self._writer.as_default():
            self._tf.summary.scalar(tag, value, step=step)

    def add_image(self, tag, img_hwc, step, dataformats="HWC"):
        with self._writer.as_default():
            self._tf.summary.image(tag, img_hwc[None], step=step)

    def add_text(self, tag, text, step=0):
        with self._writer.as_default():
            self._tf.summary.text(tag, text, step=step)

    def flush(self):
        self._writer.flush()


class GenericLogger:
    """Non-train logger (reference loggers GenericLogger): CSV + TB for arbitrary runs."""

    def __init__(self, save_dir, include=("csv", "tb")):
        self.inner = Loggers(save_dir=save_dir, include=include)

    def log_metrics(self, metrics: dict, epoch: int):
        self.inner.on_fit_epoch_end(list(metrics.values()), epoch)

    def log_images(self, files, name="Images", epoch=0):
        self.inner._log_image_files([Path(f) for f in files], name, epoch)
