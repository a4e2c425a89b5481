"""yolov3_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

A from-scratch re-design of the capabilities of ultralytics/yolov3 for TPU
hardware: NHWC tensors, static shapes, jit-compiled train/eval steps, SPMD
data-parallelism over a `jax.sharding.Mesh`, and fixed-shape NMS.

Public API (mirrors the reference's torch.hub surface, hubconf.py:118-196):

    from yolov3_tpu import load_model
    model = load_model("yolov3-tiny")          # random init (no AutoShape)
    model = load_model("path/to/ckpt")         # orbax checkpoint or .pt convert

    import yolov3_tpu.hub as hub               # AutoShape end-to-end wrapper
    results = hub.load("yolov3-tiny")(["data/images/bus.jpg"])
"""

__version__ = "0.1.0"

from yolov3_tpu.models.detection import DetectionModel, build_model  # noqa: F401


def load_model(weights, ch=3, nc=None):
    """Resolve a config name / checkpoint dir / reference .pt into a
    DetectionModel (models/loading.py — the attempt_load funnel analog)."""
    from yolov3_tpu.models.loading import load_weights

    return load_weights(weights, ch=ch, nc=nc)
