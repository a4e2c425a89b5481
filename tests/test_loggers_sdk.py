"""Third-party experiment-tracker depth against mocked SDKs (VERDICT r2 #6).

wandb/comet_ml/clearml are absent in this image, so these tests inject fake
modules (the same technique tests/ultralytics_shim.py uses for `ultralytics`)
and drive the REAL adapter code paths end-to-end: W&B model artifacts with
aliases, Comet model logging + `comet://` resume + Optimizer HPO sweep, and
ClearML `clearml://` dataset-version loading + debug samples + bbox images.
Reference surfaces: utils/loggers/wandb/wandb_utils.py:34-175,
comet/comet_utils.py:1-121, comet/hpo.py, clearml/clearml_utils.py:21-150.
"""

import sys
import types
from pathlib import Path

import numpy as np
import pytest


# ---------------------------------------------------------------- fake wandb
class _FakeArtifact:
    def __init__(self, name, type, metadata=None):
        self.name, self.type, self.metadata = name, type, metadata or {}
        self.dirs, self.files = [], []

    def add_dir(self, path, name=None):
        self.dirs.append((path, name))

    def add_file(self, path, name=None):
        self.files.append((path, name))


class _FakeWandbRun:
    def __init__(self):
        self.id = "abc123"
        self.logged = []
        self.artifacts = []

    def log(self, d):
        self.logged.append(d)

    def log_artifact(self, art, aliases=()):
        self.artifacts.append((art, list(aliases)))

    def finish(self):
        self.finished = True


def _install_fake_wandb(monkeypatch):
    mod = types.ModuleType("wandb")
    run = _FakeWandbRun()
    mod.Artifact = _FakeArtifact
    mod.init = lambda **kw: run
    mod.Image = lambda p: ("image", str(p))
    monkeypatch.setitem(sys.modules, "wandb", mod)
    return mod, run


# -------------------------------------------------------------- fake comet_ml
class _FakeExperiment:
    def __init__(self):
        self.models = []
        self.metrics = []
        self.others = []
        self.params = {}
        self.ended = False

    def log_model(self, name, file_or_folder=None, metadata=None, overwrite=False):
        self.models.append((name, file_or_folder, metadata))

    def log_metrics(self, d, epoch=None):
        self.metrics.append((d, epoch))

    def log_metric(self, k, v):
        self.metrics.append(({k: v}, None))

    def log_other(self, k, v):
        self.others.append((k, v))

    def log_image(self, *a, **kw):
        self.images = getattr(self, "images", [])
        self.images.append((a, kw))

    def log_asset_data(self, asset, name=None, epoch=None, **kw):
        self.asset_data = getattr(self, "asset_data", [])
        self.asset_data.append((asset, name or (kw.get("file_name")), epoch))

    def get_parameter(self, k):
        return self.params[k]

    def end(self):
        self.ended = True


class _FakeCometAPIExperiment:
    """API-side experiment holding downloadable assets."""

    def __init__(self, assets):
        self._assets = assets  # assetId -> (fileName, bytes, is_model)

    def get_model_asset_list(self, model_name):
        return [
            {"assetId": aid, "fileName": fn, "step": i}
            for i, (aid, (fn, _, is_model)) in enumerate(self._assets.items())
            if is_model
        ]

    def get_asset_list(self, asset_type="all"):
        return [{"assetId": aid, "fileName": fn} for aid, (fn, _, _) in self._assets.items()]

    def get_asset(self, asset_id, return_type="binary"):
        return self._assets[asset_id][1]


def _install_fake_comet(monkeypatch, api_experiment=None, sweep_params=None):
    mod = types.ModuleType("comet_ml")
    exp = _FakeExperiment()
    mod.Experiment = lambda **kw: exp

    class _API:
        def get(self, path):
            return api_experiment

    mod.API = _API

    class _Optimizer:
        def __init__(self, config):
            self.config = config

        def get_experiments(self):
            for p in sweep_params or []:
                e = _FakeExperiment()
                e.params = p
                yield e

    mod.Optimizer = _Optimizer
    monkeypatch.setitem(sys.modules, "comet_ml", mod)
    return mod, exp


# --------------------------------------------------------------- fake clearml
class _FakeTaskLogger:
    def __init__(self):
        self.images = []

    def report_image(self, title=None, series=None, local_path=None, iteration=0, image=None):
        self.images.append({"title": title, "series": series, "local_path": local_path,
                            "iteration": iteration, "has_array": image is not None})


class _FakeTask:
    def __init__(self):
        self._logger = _FakeTaskLogger()

    def get_logger(self):
        return self._logger


def _install_fake_clearml(monkeypatch, dataset_root=None):
    mod = types.ModuleType("clearml")
    task = _FakeTask()
    mod.Task = types.SimpleNamespace(init=lambda **kw: task)

    class _Dataset:
        @staticmethod
        def get(dataset_id=None):
            assert dataset_id == "ds42", dataset_id
            return types.SimpleNamespace(get_local_copy=lambda: str(dataset_root))

    mod.Dataset = _Dataset
    monkeypatch.setitem(sys.modules, "clearml", mod)
    return mod, task


# ------------------------------------------------------------------- tests
def test_wandb_model_artifact(monkeypatch, tmp_path):
    _, run = _install_fake_wandb(monkeypatch)
    from yolov3_tpu.utils.loggers.wandb_utils import log_model

    ckpt = tmp_path / "weights" / "last"
    ckpt.mkdir(parents=True)
    (ckpt / "checkpoint.yaml").write_text("epoch: 3\n")
    art = log_model(run, ckpt, epoch=3, fitness=0.42, best=True)
    assert art.name == "run_abc123_model" and art.type == "model"
    assert art.metadata["epoch"] == 3 and art.metadata["fitness"] == pytest.approx(0.42)
    assert art.dirs and art.dirs[0][0] == str(ckpt)
    (stored, aliases), = run.artifacts
    assert stored is art and "latest" in aliases and "best" in aliases


def test_loggers_hub_model_save_fans_out(monkeypatch, tmp_path):
    _install_fake_wandb(monkeypatch)
    _, comet_exp = _install_fake_comet(monkeypatch)
    monkeypatch.setenv("WANDB_API_KEY", "x")
    monkeypatch.setenv("COMET_API_KEY", "x")
    from yolov3_tpu.utils.loggers import Loggers

    lg = Loggers(save_dir=tmp_path, include=("csv", "wandb", "comet"))
    assert lg.wandb is not None and lg.comet is not None
    ckpt = tmp_path / "last"
    ckpt.mkdir()
    (ckpt / "checkpoint.yaml").write_text("epoch: 0\n")
    # mid-run epochs without save_period alignment upload NOTHING (the
    # reference gates artifact uploads by save_period; every-epoch uploads
    # of the full orbax dir would be ~100 GB over a 300-epoch run)
    lg.on_model_save(last=ckpt, epoch=5, fitness=0.3, best=True)
    assert not lg.wandb.artifacts and not comet_exp.models
    lg.on_model_save(last=ckpt, epoch=7, fitness=0.3, best=True, save_period=3)
    assert not lg.wandb.artifacts  # 7 % 3 != 0
    lg.on_model_save(last=ckpt, epoch=5, fitness=0.3, best=True, final=True)
    # wandb artifact landed
    assert lg.wandb.artifacts and lg.wandb.artifacts[0][0].metadata["epoch"] == 5
    # comet model registry landed
    assert comet_exp.models and comet_exp.models[0][0] == "yolov3_tpu"
    assert comet_exp.models[0][2]["best"] is True
    # save_period-aligned epoch uploads too
    lg.on_model_save(last=ckpt, epoch=6, fitness=0.3, best=False, save_period=3)
    assert len(lg.wandb.artifacts) == 2


def test_comet_resume_downloads_checkpoint_and_opt(monkeypatch, tmp_path):
    # log_model uploads the orbax checkpoint DIRECTORY -> one asset per file;
    # resume must restore ALL of them under their relative paths and point
    # weights at the directory holding checkpoint.yaml (a loadable checkpoint)
    assets = {
        "a1": ("last/checkpoint.yaml", b"epoch: 3\n", True),
        "a2": ("last/state/params.bin", b"PARAMS", True),
        "a3": ("opt.yaml", b"epochs: 7\nimgsz: 320\n", False),
    }
    _install_fake_comet(monkeypatch, api_experiment=_FakeCometAPIExperiment(assets))
    monkeypatch.chdir(tmp_path)
    from yolov3_tpu.utils.loggers.comet_utils import check_comet_resume

    assert check_comet_resume("runs/exp") is None  # non-comet specs pass through
    out = check_comet_resume("comet://ws/proj/exp1")
    assert out["weights"].is_dir() and out["weights"].name == "last"
    assert (out["weights"] / "checkpoint.yaml").read_bytes() == b"epoch: 3\n"
    assert (out["weights"] / "state" / "params.bin").read_bytes() == b"PARAMS"
    assert out["opt"] == {"epochs": 7, "imgsz": 320}


def test_comet_resume_single_file_checkpoint(monkeypatch, tmp_path):
    assets = {"a1": ("last.ckpt", b"WEIGHTS", True)}
    _install_fake_comet(monkeypatch, api_experiment=_FakeCometAPIExperiment(assets))
    monkeypatch.chdir(tmp_path)
    from yolov3_tpu.utils.loggers.comet_utils import check_comet_resume

    out = check_comet_resume("comet://ws/proj/exp1")
    assert out["weights"].read_bytes() == b"WEIGHTS"


def test_comet_hpo_sweep(monkeypatch):
    sweep = [{"lr0": 0.01, "momentum": 0.9}, {"lr0": 0.02, "momentum": 0.95}]
    _install_fake_comet(monkeypatch, sweep_params=sweep)
    from yolov3_tpu.utils.loggers.comet_utils import run_comet_sweep

    seen = []

    def train_fn(params, experiment):
        seen.append(params)
        return params["lr0"] * 10  # fake fitness

    cfg = {"algorithm": "bayes", "parameters": {"lr0": {}, "momentum": {}},
           "spec": {"metric": "fitness"}}
    results = run_comet_sweep(cfg, train_fn)
    assert seen == sweep
    assert [f for _, f in results] == [pytest.approx(0.1), pytest.approx(0.2)]


def test_clearml_dataset_version_loading(monkeypatch, tmp_path):
    root = tmp_path / "dsroot"
    (root / "images" / "train").mkdir(parents=True)
    (root / "images" / "val").mkdir(parents=True)
    (root / "data.yaml").write_text(
        "train: images/train\nval: images/val\nnames: [cat, dog]\n"
    )
    _install_fake_clearml(monkeypatch, dataset_root=root)
    from yolov3_tpu.data.dataset_yaml import check_dataset

    out = check_dataset("clearml://ds42", autodownload=False)
    assert out["nc"] == 2 and out["names"] == {0: "cat", 1: "dog"}
    assert Path(out["val"]).exists() and Path(out["val"]) == root / "images" / "val"


def test_clearml_debug_samples_and_boxes(monkeypatch, tmp_path):
    import cv2

    _, task = _install_fake_clearml(monkeypatch, dataset_root=tmp_path)
    from yolov3_tpu.utils.loggers.clearml_utils import log_debug_samples, log_image_with_boxes

    f0 = tmp_path / "val_batch0_pred.jpg"
    f2 = tmp_path / "val_batch2_labels.jpg"
    im = np.full((64, 64, 3), 128, np.uint8)
    cv2.imwrite(str(f0), im)
    cv2.imwrite(str(f2), im)
    log_debug_samples(task, [f0, f2, tmp_path / "missing.jpg"], "Validation")
    assert [x["iteration"] for x in task.get_logger().images] == [0, 2]
    assert task.get_logger().images[0]["series"] == "val_pred.jpg"

    boxes = [[4, 4, 40, 40, 0.9, 1], [2, 2, 10, 10, 0.1, 0]]  # second below conf
    log_image_with_boxes(task, f0, boxes, {0: "cat", 1: "dog"}, conf_threshold=0.25, iteration=3)
    last = task.get_logger().images[-1]
    assert last["title"] == "Bounding Boxes" and last["iteration"] == 3 and last["has_array"]


def test_comet_prediction_logging_depth(monkeypatch, tmp_path):
    """Per-image prediction/annotation logging at reference depth (reference
    utils/loggers/comet/__init__.py:258-296 + the train-end
    image-metadata.json flush :436-439), driven through the Loggers bus and
    the validator's on_val_image_end hook contract (VERDICT r4 next #7)."""
    import cv2

    _, exp = _install_fake_comet(monkeypatch)
    monkeypatch.setenv("COMET_API_KEY", "fake")
    from yolov3_tpu.utils.callbacks import Callbacks
    from yolov3_tpu.utils.loggers import Loggers

    lg = Loggers(save_dir=tmp_path, include=("comet",))
    assert lg.comet is exp
    cb = lg.attach(Callbacks())

    img = tmp_path / "000007.png"
    cv2.imwrite(str(img), np.full((64, 64, 3), 128, np.uint8))
    predn = np.array([[10, 10, 40, 40, 0.9, 1],      # IoU-matches the label
                      [50, 50, 60, 60, 0.8, 0],      # no label overlap
                      [12, 12, 38, 38, 0.1, 1]])     # below conf
    labelsn = np.array([[1, 11, 11, 41, 41]])
    cb.run("on_train_epoch_end", epoch=3)
    cb.run("on_val_image_end", predn=predn, path=str(img), names={0: "cat", 1: "dog"},
           labelsn=labelsn)
    # image logged once under the (image, epoch) name...
    assert len(exp.images) == 1 and exp.images[0][1]["name"] == "000007_curr_epoch_3"
    meta = lg._comet_pred_state["metadata"]["000007_curr_epoch_3"]
    # ...with gt + the one IoU-matched detection (not the unmatched/low-conf)
    assert [m["label"] for m in meta] == ["dog-gt", "dog"]
    assert meta[1]["score"] == pytest.approx(90.0)
    # same image again in the same epoch: no duplicate image upload
    cb.run("on_val_image_end", predn=predn, path=str(img), names={1: "dog"}, labelsn=labelsn)
    assert len(exp.images) == 1
    # train end flushes the metadata asset (comet/__init__.py:436-439)
    cb.run("on_train_end")
    assert exp.asset_data and exp.asset_data[0][1] == "image-metadata.json"
    assert "000007_curr_epoch_3" in exp.asset_data[0][0]


def test_clearml_val_image_hook_caps_at_16(monkeypatch, tmp_path):
    """ClearML bbox-image logging through the same hook (reference
    loggers/__init__.py:210), with the reference's 16-images/epoch cap."""
    import cv2

    _, task = _install_fake_clearml(monkeypatch, dataset_root=tmp_path)
    from yolov3_tpu.utils.callbacks import Callbacks
    from yolov3_tpu.utils.loggers import Loggers

    lg = Loggers(save_dir=tmp_path, include=("clearml",))
    assert lg.clearml is task
    cb = lg.attach(Callbacks())
    img = tmp_path / "x.png"
    cv2.imwrite(str(img), np.full((32, 32, 3), 100, np.uint8))
    predn = np.array([[2.0, 2.0, 20.0, 20.0, 0.9, 0]])
    for _ in range(20):
        cb.run("on_val_image_end", predn=predn, path=str(img), names={0: "cat"})
    assert len(task.get_logger().images) == 16  # capped
    cb.run("on_fit_epoch_end", epoch=0, vals=[0.0])  # re-arms per epoch
    cb.run("on_val_image_end", predn=predn, path=str(img), names={0: "cat"})
    assert len(task.get_logger().images) == 17


def test_clearml_hpo_analog(monkeypatch):
    """ClearML HPO over the evolve bounds (reference utils/loggers/clearml/
    hpo.py): full optimizer lifecycle against the mocked SDK."""
    calls = {}

    class _FakeRange:
        def __init__(self, name, min_value=None, max_value=None):
            self.name, self.min_value, self.max_value = name, min_value, max_value

    class _FakeHPO:
        def __init__(self, **kw):
            calls["init"] = kw

        def set_report_period(self, p):
            calls["report_period"] = p

        def set_time_limit(self, in_minutes=None):
            calls["time_limit"] = in_minutes

        def start_locally(self):
            calls["started"] = "local"

        def start(self):
            calls["started"] = "remote"

        def wait(self):
            calls["waited"] = True

        def stop(self):
            calls["stopped"] = True

    mod = types.ModuleType("clearml")
    mod.Task = types.SimpleNamespace(
        init=lambda **kw: calls.setdefault("task", kw),
        TaskTypes=types.SimpleNamespace(optimizer="optimizer"),
    )
    auto = types.ModuleType("clearml.automation")
    auto.HyperParameterOptimizer = _FakeHPO
    auto.UniformParameterRange = _FakeRange
    auto.RandomSearch = "random-search"
    monkeypatch.setitem(sys.modules, "clearml", mod)
    monkeypatch.setitem(sys.modules, "clearml.automation", auto)
    monkeypatch.delitem(sys.modules, "clearml.automation.optuna", raising=False)

    from yolov3_tpu.train.evolve import META
    from yolov3_tpu.utils.loggers.clearml_hpo import run_clearml_hpo

    run_clearml_hpo("task123", total_max_jobs=7)
    kw = calls["init"]
    assert kw["base_task_id"] == "task123" and kw["total_max_jobs"] == 7
    ranges = kw["hyper_parameters"]
    assert len(ranges) == len(META)  # the full 28-key evolve space
    names = {r.name for r in ranges}
    assert "Hyperparameters/lr0" in names and "Hyperparameters/copy_paste" in names
    lr0 = next(r for r in ranges if r.name == "Hyperparameters/lr0")
    assert (lr0.min_value, lr0.max_value) == (1e-5, 1e-1)
    # optuna absent -> RandomSearch fallback; lifecycle ran to completion
    assert kw["optimizer_class"] == "random-search"
    assert kw["objective_metric_series"] == "mAP_0.5" and kw["objective_metric_sign"] == "max"
    assert calls["started"] == "local" and calls["waited"] and calls["stopped"]
    assert calls["task"]["task_type"] == "optimizer"


def test_wandb_init_plumbs_project_name_entity_resume(monkeypatch, tmp_path):
    """Reference wandb_utils.py:64-73: project from --project (stem), name
    from --name unless the default "exp", resume by run id with
    resume="allow"."""
    mod, run = _install_fake_wandb(monkeypatch)
    seen = {}

    def init(**kw):
        seen.update(kw)
        return run

    mod.init = init
    monkeypatch.setenv("WANDB_API_KEY", "x")
    from yolov3_tpu.utils.loggers import Loggers

    opt = types.SimpleNamespace(project="runs/custom-proj", name="run7",
                                entity="team", resume="wandb-run://r42")
    lg = Loggers(save_dir=tmp_path, include=("wandb",), opt=opt)
    assert lg.wandb is run
    assert seen["project"] == "custom-proj"
    assert seen["name"] == "run7"
    assert seen["entity"] == "team"
    assert seen["id"] == "r42" and seen["resume"] == "allow"

    # defaults: project "runs/train" -> yolov3_tpu, name "exp" -> None
    seen.clear()
    opt = types.SimpleNamespace(project="runs/train", name="exp", entity=None, resume=False)
    Loggers(save_dir=tmp_path, include=("wandb",), opt=opt)
    assert seen["project"] == "yolov3_tpu" and seen["name"] is None and seen["id"] is None


def test_wandb_failure_disables_logger_and_training_proceeds(monkeypatch, tmp_path):
    """Reference wandb_utils.py:137-151 end_epoch: a wandb error mid-training
    must warn, finish the run, and disable the logger — subsequent epochs
    log nothing and raise nothing."""
    _, run = _install_fake_wandb(monkeypatch)
    monkeypatch.setenv("WANDB_API_KEY", "x")
    from yolov3_tpu.utils.loggers import Loggers

    lg = Loggers(save_dir=tmp_path, include=("csv", "wandb"))
    assert lg.wandb is run

    def boom(d):
        raise RuntimeError("network down")

    run.log = boom
    vals = list(range(len(lg.keys)))
    lg.on_fit_epoch_end(vals, epoch=0)  # must NOT raise
    assert lg.wandb is None and getattr(run, "finished", False)
    lg.on_fit_epoch_end(vals, epoch=1)  # logger stays off, still no raise
    # csv kept recording through both epochs
    assert (tmp_path / "results.csv").read_text().count("\n") == 3


def test_bbox_interval_gates_val_image_logging(monkeypatch, tmp_path):
    """Reference wandb_utils.py:89-93: --bbox_interval -1 resolves to
    epochs//10 and val bbox mosaics are only pushed on interval epochs."""
    _, run = _install_fake_wandb(monkeypatch)
    monkeypatch.setenv("WANDB_API_KEY", "x")
    import cv2
    import numpy as np

    from yolov3_tpu.utils.loggers import Loggers

    cv2.imwrite(str(tmp_path / "val_batch0_pred.jpg"),
                np.zeros((4, 4, 3), np.uint8))
    opt = types.SimpleNamespace(project="runs/train", name="exp", entity=None,
                                resume=False, epochs=30, bbox_interval=-1)
    lg = Loggers(save_dir=tmp_path, include=("csv", "wandb"), opt=opt)
    assert lg.bbox_interval == 3
    lg.on_val_end(epoch=0)  # (0+1) % 3 != 0 -> no push
    assert not any("val_batch" in k for d in run.logged for k in d)
    lg.on_val_end(epoch=2)  # (2+1) % 3 == 0 -> push
    assert any("val_batch" in k for d in run.logged for k in d)
    # short runs default to every epoch
    opt.epochs, opt.bbox_interval = 5, -1
    assert Loggers(save_dir=tmp_path, include=("csv",), opt=opt).bbox_interval == 1
    # final push ignores the cadence
    run.logged.clear()
    lg.on_train_end()
    assert any("val_batch" in k for d in run.logged for k in d)


def test_upload_dataset_artifact(monkeypatch, tmp_path):
    """--upload_dataset pushes a 'dataset' artifact with the resolved data
    dict as metadata; the "val" string uploads only that split (reference
    comet/__init__.py:344-363 semantics on the W&B sink)."""
    _, run = _install_fake_wandb(monkeypatch)
    monkeypatch.setenv("WANDB_API_KEY", "x")
    from yolov3_tpu.utils.loggers import Loggers

    (tmp_path / "images" / "train").mkdir(parents=True)
    (tmp_path / "images" / "val").mkdir(parents=True)
    data = {"path": tmp_path, "train": str(tmp_path / "images" / "train"),
            "val": str(tmp_path / "images" / "val"), "names": {0: "x"}, "nc": 1}

    opt = types.SimpleNamespace(project="runs/train", name="exp", entity=None,
                                resume=False, epochs=3, bbox_interval=-1,
                                upload_dataset="val")
    lg = Loggers(save_dir=tmp_path, include=("csv", "wandb"), opt=opt)
    lg.log_dataset_artifact(data)
    (art, _), = run.artifacts
    assert art.type == "dataset" and art.name == "yolov3-dataset"
    assert art.metadata["nc"] == 1
    assert [n for _, n in art.dirs] == ["val"], "only the val split uploads"

    # upload_dataset=True uploads every split
    run.artifacts.clear()
    opt.upload_dataset = True
    lg = Loggers(save_dir=tmp_path, include=("csv", "wandb"), opt=opt)
    lg.log_dataset_artifact(data)
    (art, _), = run.artifacts
    assert sorted(n for _, n in art.dirs) == ["train", "val"]
