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
