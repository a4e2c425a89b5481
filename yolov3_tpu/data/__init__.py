from yolov3_tpu.data.augment import letterbox  # noqa: F401
