from yolov3_tpu.ops.boxes import (  # noqa: F401
    bbox_iou,
    box_iou,
    clip_boxes,
    scale_boxes,
    xywh2xyxy,
    xywhn2xyxy,
    xyxy2xywh,
    xyxy2xywhn,
)
from yolov3_tpu.ops.nms import non_max_suppression  # noqa: F401
