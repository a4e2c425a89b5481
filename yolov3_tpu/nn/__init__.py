from yolov3_tpu.nn.modules import MODULE_REGISTRY  # noqa: F401
