"""Hub-style model factory — the torch.hub surface (reference hubconf.py:16-196)
as plain functions: yolov3(), yolov3_spp(), yolov3_tiny(), custom().

    import yolov3_tpu.hub as hub
    model = hub.yolov3_tiny()                 # random-init + AutoShape
    model = hub.custom("runs/train/exp/weights/best")   # trained checkpoint
    results = model(["data/images/bus.jpg"])
    results.print()
"""

from __future__ import annotations

from pathlib import Path

from yolov3_tpu.models.autoshape import AutoShape
from yolov3_tpu.models.detection import DetectionModel
from yolov3_tpu.utils.general import LOGGER


def _create(name, channels=3, classes=80, autoshape=True, ckpt=None):
    """Build a model from a config name, a checkpoint dir, or a torch .pt file."""
    path = Path(str(ckpt or name))
    if path.exists() and (path / "checkpoint.yaml").exists():  # our checkpoint dir
        from yolov3_tpu.utils.checkpoint import load_model_from_checkpoint

        model = load_model_from_checkpoint(path)
    elif path.suffix == ".pt" and path.exists():  # reference torch checkpoint
        from yolov3_tpu.models.convert import convert_torch_checkpoint

        cfg = path.stem if "yolov3" in path.stem else "yolov3"
        model = DetectionModel.from_config(cfg, ch=channels, nc=classes, imgsz=64)
        variables, report = convert_torch_checkpoint(str(path), model)
        if report["missed"]:
            LOGGER.warning(f"{len(report['missed'])} tensors failed to convert from {path}")
        model = model.replace_variables(variables)
    else:
        model = DetectionModel.from_config(str(name), ch=channels, nc=classes, imgsz=64)
    return AutoShape(model) if autoshape else model


def custom(path, autoshape=True):
    """Load a custom/trained checkpoint (reference hubconf.py:89-116)."""
    return _create(path, autoshape=autoshape, ckpt=path)


def yolov3(channels=3, classes=80, autoshape=True):
    return _create("yolov3", channels, classes, autoshape)


def yolov3_spp(channels=3, classes=80, autoshape=True):
    return _create("yolov3-spp", channels, classes, autoshape)


def yolov3_tiny(channels=3, classes=80, autoshape=True):
    return _create("yolov3-tiny", channels, classes, autoshape)


def load(name, **kwargs):
    """Generic entry: load('yolov3-tiny') or load('path/to/ckpt')."""
    fns = {"yolov3": yolov3, "yolov3-spp": yolov3_spp, "yolov3_spp": yolov3_spp,
           "yolov3-tiny": yolov3_tiny, "yolov3_tiny": yolov3_tiny}
    if str(name) in fns:
        return fns[str(name)](**kwargs)
    return custom(name, **kwargs)
