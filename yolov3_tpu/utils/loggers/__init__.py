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

    def __init__(self, save_dir=None, opt=None, hyp=None, include=LOGGERS):
        self.save_dir = Path(save_dir or ".")
        self.opt = opt
        self.hyp = hyp
        self.keys = KEYS
        self.csv_file = self.save_dir / "results.csv"
        self.tb = None
        self.wandb = None
        self.clearml = None
        self.comet = None

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

                self.wandb = wandb.init(project="yolov3_tpu", config={"opt": opt, "hyp": hyp})
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

    # -- hook methods ------------------------------------------------------
    def on_fit_epoch_end(self, vals, epoch):
        """Log the 13 standard keys at epoch end."""
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
            self.wandb.log({**x, "epoch": epoch})
        if self.comet:
            self.comet.log_metrics(x, epoch=epoch)

    def on_train_end(self, results_csv=None):
        if self.tb and hasattr(self.tb, "flush"):
            self.tb.flush()
        if results_csv and Path(results_csv).exists():
            try:
                from yolov3_tpu.utils.plots import plot_results

                plot_results(results_csv)
            except Exception as e:  # noqa: BLE001
                LOGGER.warning(f"results plot failed: {e}")
        if self.wandb:
            self.wandb.finish()

    def attach(self, callbacks):
        """Register hook adapters on a Callbacks bus."""
        callbacks.register_action(
            "on_fit_epoch_end", "loggers",
            lambda epoch=0, fitness=0.0, vals=(), **kw: self.on_fit_epoch_end(vals or [fitness], epoch),
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

    def flush(self):
        self._writer.flush()


class GenericLogger:
    """Non-train logger (reference loggers GenericLogger): CSV + TB for arbitrary runs."""

    def __init__(self, save_dir, include=("csv", "tb")):
        self.inner = Loggers(save_dir=save_dir, include=include)

    def log_metrics(self, metrics: dict, epoch: int):
        self.inner.on_fit_epoch_end(list(metrics.values()), epoch)

    def log_images(self, files, name="Images", epoch=0):
        pass  # image logging handled by plots; TB image support TODO
