"""Comet adapter depth: model logging, `comet://` resume, and an Optimizer
HPO sweep (reference utils/loggers/comet/comet_utils.py:1-121 and
comet/hpo.py:1-120).

The comet_ml package is absent in this image; these functions exercise the
real SDK call surface and are covered by mocked-SDK tests
(tests/test_loggers_sdk.py).
"""

from __future__ import annotations

from pathlib import Path

from yolov3_tpu.utils.general import LOGGER, yaml_load

COMET_PREFIX = "comet://"
MODEL_NAME = "yolov3_tpu"


def log_model(experiment, ckpt_dir, epoch=0, fitness=0.0, best=False):
    """Register a checkpoint dir with the experiment's model registry
    (reference comet_utils CometLogger.log_model: experiment.log_model with
    file_or_folder + metadata)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return
    experiment.log_model(
        MODEL_NAME,
        file_or_folder=str(ckpt_dir),
        metadata={"epoch": int(epoch), "fitness": float(fitness), "best": bool(best)},
        overwrite=True,
    )


def check_comet_resume(resume):
    """Resolve a `comet://<experiment_path>` resume spec (reference
    comet_utils.check_comet_resume/download_model_checkpoint): fetch the
    experiment through the Comet API, download its logged model checkpoint
    next to the run, and return {'weights': <local path>, 'opt': <saved opt
    dict or None>} for the caller to re-hydrate. Returns None when `resume`
    is not a comet:// spec."""
    if not isinstance(resume, str) or not resume.startswith(COMET_PREFIX):
        return None
    import comet_ml

    experiment_path = resume[len(COMET_PREFIX):]
    api = comet_ml.API()
    experiment = api.get(experiment_path)
    assert experiment is not None, f"comet experiment not found: {experiment_path}"

    save_dir = Path("runs") / "comet_resume" / experiment_path.replace("/", "_")
    save_dir.mkdir(parents=True, exist_ok=True)

    # model checkpoint — log_model uploads the orbax checkpoint DIRECTORY, so
    # Comet holds one asset per contained file; a loadable checkpoint needs
    # every file restored under its relative path (checkpoint.yaml + orbax
    # payload), not just the newest single asset.
    assets = experiment.get_model_asset_list(MODEL_NAME)
    weights = None
    if assets:
        for asset in assets:
            out = save_dir / asset["fileName"]
            out.parent.mkdir(parents=True, exist_ok=True)
            out.write_bytes(experiment.get_asset(asset["assetId"], return_type="binary"))
        # the checkpoint root is the directory holding checkpoint.yaml
        metas = sorted(save_dir.rglob("checkpoint.yaml"), key=lambda p: len(p.parts))
        if metas:
            weights = metas[0].parent
        else:  # single-file checkpoint (e.g. a converted .pt)
            newest = sorted(assets, key=lambda a: a.get("step") or 0)[-1]
            weights = save_dir / newest["fileName"]

    # saved run options (the reference re-hydrates opt.yaml from the experiment)
    opt = None
    for asset in experiment.get_asset_list(asset_type="all"):
        if asset.get("fileName") == "opt.yaml":
            raw = experiment.get_asset(asset["assetId"], return_type="binary")
            f = save_dir / "opt.yaml"
            f.write_bytes(raw)
            opt = yaml_load(f)
            break

    LOGGER.info(f"comet:// resume resolved: weights={weights}, opt={'yes' if opt else 'no'}")
    return {"weights": weights, "opt": opt, "experiment": experiment_path}


def log_predictions(experiment, predn, labelsn, image_path, class_names, state,
                    curr_epoch=0, conf_thres=0.25, iou_thres=0.45, max_images=100):
    """Per-image prediction + ground-truth bbox logging (reference
    utils/loggers/comet/__init__.py:258-296 log_predictions): keep detections
    above conf_thres that IoU-match a label, log the native image once per
    (image, epoch), and accumulate Comet's annotation-metadata entries
    ("label"/"score"/"box") in `state` for the train-end
    image-metadata.json asset (reference comet/__init__.py:436-439).

    state: mutable dict carried by the caller across images/epochs —
    {"count": int, "names": [image_name], "metadata": {image_name: [...]}}.
    """
    import numpy as np

    from yolov3_tpu.ops.boxes import box_iou

    if state.setdefault("count", 0) >= max_images:
        return
    predn = np.asarray(predn, np.float32)
    labelsn = (np.asarray(labelsn, np.float32) if labelsn is not None and len(labelsn)
               else np.zeros((0, 5), np.float32))
    detections = predn[predn[:, 4] > conf_thres]
    if not len(detections) or not len(labelsn):
        return
    iou = np.asarray(box_iou(labelsn[:, 1:5], detections[:, :4]))
    label_idx, det_idx = np.where(iou > iou_thres)
    if len(label_idx) == 0:
        return
    filtered_detections = detections[np.unique(det_idx)]
    filtered_labels = labelsn[np.unique(label_idx)]

    image_id = Path(image_path).stem
    image_name = f"{image_id}_curr_epoch_{curr_epoch}"
    if image_name not in state.setdefault("names", []):
        experiment.log_image(str(image_path), name=image_name)
        state["names"].append(image_name)

    metadata = [
        {"label": f"{class_names.get(int(cls), int(cls))}-gt", "score": 100,
         "box": {"x": float(x1), "y": float(y1), "x2": float(x2), "y2": float(y2)}}
        for cls, x1, y1, x2, y2 in filtered_labels.tolist()
    ]
    metadata.extend(
        {"label": f"{class_names.get(int(cls), int(cls))}", "score": float(conf) * 100,
         "box": {"x": float(x1), "y": float(y1), "x2": float(x2), "y2": float(y2)}}
        for x1, y1, x2, y2, conf, cls in filtered_detections.tolist()
    )
    state.setdefault("metadata", {})[image_name] = metadata
    state["count"] += 1


def flush_prediction_metadata(experiment, state, curr_epoch=0):
    """Train-end upload of the accumulated per-image annotation metadata
    (reference comet/__init__.py on_train_end:436-439)."""
    if state.get("metadata"):
        experiment.log_asset_data(state["metadata"], "image-metadata.json",
                                  epoch=int(curr_epoch))


def run_comet_sweep(optimizer_config, train_fn):
    """Comet Optimizer HPO loop (reference comet/hpo.py): for each suggested
    parameter set, run `train_fn(hyp_overrides, experiment)` and report the
    returned fitness. `optimizer_config` is a dict or a path to the comet
    optimizer YAML/JSON ({algorithm, spec, parameters})."""
    import comet_ml

    if isinstance(optimizer_config, (str, Path)):
        optimizer_config = yaml_load(optimizer_config)
    opt = comet_ml.Optimizer(optimizer_config)
    results = []
    for experiment in opt.get_experiments():
        params = {k: experiment.get_parameter(k) for k in optimizer_config.get("parameters", {})}
        fitness = train_fn(params, experiment)
        experiment.log_metric("fitness", float(fitness))
        experiment.end()
        results.append((params, float(fitness)))
    return results
