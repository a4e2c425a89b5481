from yolov3_tpu.models.detection import DetectionModel, build_model  # noqa: F401
from yolov3_tpu.models.spec import ModelSpec, parse_spec  # noqa: F401
