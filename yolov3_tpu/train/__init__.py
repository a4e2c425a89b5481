from yolov3_tpu.train.loss import LossConfig, compute_loss  # noqa: F401
