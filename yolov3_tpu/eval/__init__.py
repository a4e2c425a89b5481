from yolov3_tpu.eval.metrics import ap_per_class, compute_ap, fitness  # noqa: F401
