from yolov3_tpu.utils.general import (  # noqa: F401
    LOGGER,
    check_img_size,
    colorstr,
    increment_path,
    init_seeds,
    make_divisible,
    yaml_load,
    yaml_save,
)
