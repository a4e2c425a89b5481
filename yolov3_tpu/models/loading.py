"""Shared weight resolution: checkpoint dir / reference .pt / config name.

One loader behind every entry point (val/detect/export/serve/benchmarks CLIs,
MultiBackend, Ensemble.attempt_load, hub) — the analog of the reference's
attempt_load funnel (reference models/experimental.py:88-136, hubconf.py:16-86).
"""

from __future__ import annotations

from pathlib import Path

from yolov3_tpu.models.detection import DetectionModel
from yolov3_tpu.utils.general import LOGGER


def load_weights(weights, ch=3, nc=None):
    """Resolve `weights` into a DetectionModel.

    Accepts: an orbax checkpoint dir (contains checkpoint.yaml), a reference
    torch .pt file (converted through models/convert.py), or a model config
    name / YAML path (random init). ch/nc only apply to config builds.
    """
    p = Path(str(weights))
    if p.exists() and (p / "checkpoint.yaml").exists():  # our checkpoint dir
        from yolov3_tpu.utils.checkpoint import load_model_from_checkpoint

        return load_model_from_checkpoint(weights)
    if p.suffix == ".pt" and not p.exists():
        # reference auto-downloads missing release weights (downloads.py:82-128,
        # wired through DetectMultiBackend/attempt_load); fails soft with a
        # clear message in zero-egress environments
        from yolov3_tpu.utils.downloads import attempt_download

        p = Path(attempt_download(p))
    if p.suffix == ".pt" and p.exists():  # reference torch checkpoint
        from yolov3_tpu.models.convert import convert_torch_checkpoint

        if "yolov3" in p.stem:
            cfg = p.stem
        else:
            cfg = "yolov3"
            LOGGER.warning(
                f"cannot infer the architecture from '{p.name}' — assuming the flagship "
                "yolov3 cfg; rename the file to its cfg (e.g. yolov3-tiny.pt) if wrong"
            )
        model = DetectionModel.from_config(cfg, ch=ch, nc=nc, imgsz=64)
        variables, report = convert_torch_checkpoint(str(p), model)
        if len(report["missed"]) > len(report["matched"]):
            # a mostly-random 62M-param model that "works" is worse than an error
            raise ValueError(
                f"{p}: {len(report['missed'])} tensors failed to convert "
                f"(only {len(report['matched'])} matched) — architecture mismatch; "
                "rename the file to its cfg or convert it explicitly"
            )
        if report["missed"]:
            LOGGER.warning(f"{len(report['missed'])} tensors failed to convert from {p}")
        return model.replace_variables(variables)
    return DetectionModel.from_config(str(weights), ch=ch, nc=nc, imgsz=64)
