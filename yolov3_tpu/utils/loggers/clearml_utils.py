"""ClearML adapter depth: `clearml://` dataset-version loading and debug-sample
/ bbox image logging (reference utils/loggers/clearml/clearml_utils.py:21-60
construct_dataset, 80-150 ClearmlLogger debug samples).

The clearml package is absent in this image; these functions exercise the real
SDK call surface and are covered by mocked-SDK tests (tests/test_loggers_sdk.py).
"""

from __future__ import annotations

from pathlib import Path

from yolov3_tpu.utils.general import LOGGER, yaml_load

CLEARML_PREFIX = "clearml://"


def construct_dataset(clearml_info_string):
    """Resolve a `clearml://<dataset_id>` data spec to a dataset dict
    (reference clearml_utils.construct_dataset): pull the versioned dataset's
    local copy, find exactly one yaml at its root, and rewrite the path keys
    to the local copy."""
    assert str(clearml_info_string).startswith(CLEARML_PREFIX)
    dataset_id = str(clearml_info_string)[len(CLEARML_PREFIX):]
    from clearml import Dataset

    dataset = Dataset.get(dataset_id=dataset_id)
    dataset_root = Path(dataset.get_local_copy())

    yaml_filenames = sorted(list(dataset_root.glob("*.yaml")) + list(dataset_root.glob("*.yml")))
    assert len(yaml_filenames) == 1, (
        "A ClearML dataset must have exactly one yaml file at its root describing "
        f"train/val/names; found {len(yaml_filenames)} in {dataset_root}"
    )
    data = yaml_load(yaml_filenames[0])
    assert {"train", "val", "names"} <= set(data), (
        "ClearML dataset yaml must define at least 'train', 'val' and 'names'"
    )
    out = dict(data)
    out["path"] = str(dataset_root)
    LOGGER.info(f"clearml:// dataset {dataset_id} resolved to {dataset_root}")
    return out


def log_debug_samples(task, files, title="Debug Samples"):
    """Report image files to the task's debug-samples tab, parsing the batch
    index out of the filename like the reference (clearml_utils.py:
    log_debug_samples)."""
    import re

    for f in files:
        f = Path(f)
        if not f.exists():
            continue
        it = re.search(r"_batch(\d+)", f.name)
        iteration = int(it.groups()[0]) if it else 0
        task.get_logger().report_image(
            title=title, series=f.name.replace(f"_batch{iteration}", ""),
            local_path=str(f), iteration=iteration,
        )


def log_image_with_boxes(task, image_path, boxes, class_names, conf_threshold=0.25, iteration=0):
    """Draw detections on an image and report it (reference clearml_utils.py
    log_image_with_boxes). boxes: (n, 6) [xyxy, conf, cls]."""
    import cv2
    import numpy as np

    from yolov3_tpu.utils.plots import Annotator, colors

    im = cv2.imread(str(image_path))
    if im is None:
        return
    annotator = Annotator(np.ascontiguousarray(im))
    for *xyxy, conf, cls in boxes:
        if float(conf) < conf_threshold:
            continue
        c = int(cls)
        label = f"{class_names.get(c, c)}: {round(100 * float(conf), 1)}%"
        annotator.box_label([int(v) for v in xyxy], label=label, color=colors(c))
    task.get_logger().report_image(
        title="Bounding Boxes", series=Path(image_path).name,
        iteration=iteration, image=annotator.result()[:, :, ::-1],
    )
