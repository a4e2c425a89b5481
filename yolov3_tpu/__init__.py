"""yolov3_tpu — a TPU-native (JAX/XLA/Pallas) object-detection framework.

A from-scratch re-design of the capabilities of ultralytics/yolov3 for TPU
hardware: NHWC tensors, static shapes, jit-compiled train/eval steps, SPMD
data-parallelism over a `jax.sharding.Mesh`, and fixed-shape NMS.

Public API (mirrors the reference's torch.hub surface, hubconf.py:118-196):

    from yolov3_tpu import load_model
    model = load_model("yolov3-tiny")          # random init
    model = load_model("path/to/ckpt")         # orbax checkpoint or .pt convert
"""

__version__ = "0.1.0"

from yolov3_tpu.models.detection import DetectionModel, build_model  # noqa: F401
