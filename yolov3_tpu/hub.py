"""Hub-style model factory — the torch.hub surface (reference hubconf.py:16-196)
as plain functions: yolov3(), yolov3_spp(), yolov3_tiny(), custom().

    import yolov3_tpu.hub as hub
    model = hub.yolov3_tiny()                 # random-init + AutoShape
    model = hub.custom("runs/train/exp/weights/best")   # trained checkpoint
    results = model(["data/images/bus.jpg"])
    results.print()
"""

from __future__ import annotations

from yolov3_tpu.models.autoshape import AutoShape


def _create(name, channels=3, classes=80, autoshape=True, ckpt=None):
    """Build a model from a config name, a checkpoint dir, or a torch .pt file
    (one shared loader behind every entry point — models/loading.py)."""
    from yolov3_tpu.models.loading import load_weights

    model = load_weights(ckpt or name, ch=channels, nc=classes)
    return AutoShape(model) if autoshape else model


def custom(path, autoshape=True, channels=3, classes=80):
    """Load a custom/trained checkpoint (reference hubconf.py:89-116)."""
    return _create(path, channels, classes, autoshape=autoshape, ckpt=path)


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
