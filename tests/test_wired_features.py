"""Round-2 feature wiring: every formerly-dead flag must observably change behavior.

Covers (VERDICT r1 #4-7): --quad collate, multi-worker loader, RAM/disk image
cache, TTA (--augment), host batch sharding, cutout.
"""

from pathlib import Path

import cv2
import numpy as np
import pytest

from yolov3_tpu.data.datasets import DataLoader, DetectionDataset


@pytest.fixture(scope="module")
def ds_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("wiredds")
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(8):
        im = rng.integers(0, 255, (64, 80, 3), np.uint8)  # non-square
        cv2.imwrite(str(root / "images" / "train" / f"{i}.jpg"), im)
        (root / "labels" / "train" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4\n1 0.3 0.3 0.2 0.2")
    return root / "images" / "train"


def test_quad_collate_reachable(ds_root):
    """--quad: batches come out (B/4, 2H, 2W, 3) with merged rescaled labels
    (reference train.py --quad -> collate_fn4, dataloaders.py:832-858)."""
    ds = DetectionDataset(str(ds_root), imgsz=64, augment=False, batch_size=8, num_cls=2)
    loader = DataLoader(ds, batch_size=8, quad=True, max_labels=32)
    imgs, targets, mask, _ = next(iter(loader))
    assert imgs.shape == (2, 128, 128, 3)
    assert mask[0].sum() == 8  # 4 images x 2 labels merged
    got = targets[0][mask[0]]
    assert (got[:, 3:5] <= 0.5).all()  # wh halved into the 2x canvas


def test_multiworker_loader_matches_serial(ds_root):
    ds = DetectionDataset(str(ds_root), imgsz=64, augment=False, batch_size=4, num_cls=2)
    b1 = [b for b in DataLoader(ds, batch_size=4, workers=1)]
    b4 = [b for b in DataLoader(ds, batch_size=4, workers=4)]
    assert len(b1) == len(b4)
    for (i1, t1, m1, _), (i4, t4, m4, _) in zip(b1, b4):
        np.testing.assert_array_equal(i1, i4)
        np.testing.assert_array_equal(t1, t4)
        np.testing.assert_array_equal(m1, m4)


@pytest.mark.parametrize("mode", ["ram", "disk"])
def test_image_cache_identical(ds_root, mode):
    """RAM/disk caches must return byte-identical pre-resized images
    (reference dataloaders.py:572-608)."""
    ds0 = DetectionDataset(str(ds_root), imgsz=64, augment=False, batch_size=4, num_cls=2)
    dsc = DetectionDataset(str(ds_root), imgsz=64, augment=False, batch_size=4, num_cls=2,
                           cache_images=mode)
    for i in range(4):
        a, hw0a, hwa = ds0.load_image(i)
        b, hw0b, hwb = dsc.load_image(i)
        np.testing.assert_array_equal(a, b)
        assert tuple(hw0a) == tuple(hw0b) and tuple(hwa) == tuple(hwb)
    if mode == "disk":  # clean up .npy litter next to images
        for f in Path(ds_root).glob("*.npy"):
            f.unlink()


def test_host_shard_round_robin_covers_all(ds_root):
    """Round-robin batch sharding: 2 hosts see disjoint batches covering everything."""
    ds = DetectionDataset(str(ds_root), imgsz=64, augment=False, batch_size=2, num_cls=2)
    seen = []
    for host in range(2):
        loader = DataLoader(ds, batch_size=2, shuffle=False)
        loader._host_shard = (host, 2)
        for batch_idx in loader._batches():
            seen.extend(batch_idx.tolist())
    assert sorted(seen) == list(range(8))


def test_host_shard_applies_to_index_override(ds_root):
    """Image-weights overrides must still respect the host shard (r1 weak #9)."""
    ds = DetectionDataset(str(ds_root), imgsz=64, augment=False, batch_size=2, num_cls=2)
    loader = DataLoader(ds, batch_size=2, shuffle=True)
    loader._host_shard = (0, 2)
    loader.set_indices(np.arange(8)[::-1])
    got = [b.tolist() for b in loader._batches()]
    assert got == [[7, 6], [3, 2]]  # host 0 takes batches 0 and 2 of the override


def test_cutout_flag_changes_image(ds_root):
    import random

    ds_on = DetectionDataset(str(ds_root), imgsz=64, augment=True, batch_size=4, num_cls=2,
                             hyp={"cutout": 1.0, "mosaic": 0.0, "fliplr": 0.0, "flipud": 0.0,
                                  "hsv_h": 0, "hsv_s": 0, "hsv_v": 0, "translate": 0, "scale": 0})
    ds_off = DetectionDataset(str(ds_root), imgsz=64, augment=True, batch_size=4, num_cls=2,
                              hyp={"cutout": 0.0, "mosaic": 0.0, "fliplr": 0.0, "flipud": 0.0,
                                   "hsv_h": 0, "hsv_s": 0, "hsv_v": 0, "translate": 0, "scale": 0})
    random.seed(0)
    img_on, _, _ = ds_on[0]
    random.seed(0)
    img_off, _, _ = ds_off[0]
    assert not np.array_equal(img_on, img_off)


def test_tta_predict_augmented():
    """--augment produces the TTA-concatenated prediction tensor
    (reference yolo.py:239-280: 3 scales, clipped tails -> more rows than plain)."""
    import jax.numpy as jnp

    from yolov3_tpu.models.detection import DetectionModel

    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    plain, _ = model.predict(x)
    tta = model.predict_augmented(x)
    assert tta.shape[0] == 1 and tta.shape[2] == plain.shape[2]
    assert tta.shape[1] != plain.shape[1]  # scales concatenated + tails clipped
    # TTA through the validator's cached forward (the --augment CLI path)
    from yolov3_tpu.eval.validator import _cached_forward

    fwd = _cached_forward(model, 0.25, 0.45, 100, 1024, augment=True)
    dets, n = fwd(model.variables, np.zeros((1, 64, 64, 3), np.uint8))
    assert np.asarray(dets).shape == (1, 100, 6)


def test_training_emits_logger_artifacts(ds_root, tmp_path):
    """A training run must produce label plots, correlogram, first-batch
    mosaics, val curves, and results plots (reference loggers/__init__.py:112-240)."""
    from yolov3_tpu.train.loop import train

    data = {"path": str(Path(ds_root).parents[1]), "train": "images/train",
            "val": "images/train", "names": {0: "a", 1: "b"}}
    cfg = {"nc": 2, "anchors": [[12, 12, 20, 20, 32, 32], [48, 48, 64, 64, 96, 96]],
           "layers": [{"from": -1, "n": 1, "op": "Conv", "args": [8, 3, 2]},
                      {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
                      {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
                      {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
                      {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
                      {"from": [3, 4], "n": 1, "op": "Detect", "args": ["nc", "anchors"]}]}
    sd = tmp_path / "exp"
    train(data=data, cfg=cfg, epochs=2, batch_size=4, imgsz=64, save_dir=sd,
          hyp={"lr0": 0.01, "lrf": 0.1, "momentum": 0.9, "weight_decay": 0.0,
               "warmup_epochs": 0.0, "box": 0.05, "obj": 1.0, "cls": 0.5, "mosaic": 0.0,
               "fliplr": 0.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0, "translate": 0.0,
               "scale": 0.0, "anchor_t": 4.0},
          noautoanchor=True)
    produced = {p.name for p in sd.glob("*")}
    # PR/F1 curves require nonzero TPs (random-noise micro-run has none);
    # confusion matrix is unconditional like the reference
    for expected in ("labels.png", "labels_correlogram.jpg", "train_batch0.jpg",
                     "train_batch1.jpg", "results.csv", "results.png",
                     "confusion_matrix.png"):
        assert expected in produced, f"{expected} missing; got {sorted(produced)}"


MICRO_CFG = {
    "nc": 2,
    "anchors": [[12, 12, 20, 20, 32, 32], [48, 48, 64, 64, 96, 96]],
    "layers": [{"from": -1, "n": 1, "op": "Conv", "args": [8, 3, 2]},
               {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
               {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
               {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
               {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
               {"from": [3, 4], "n": 1, "op": "Detect", "args": ["nc", "anchors"]}],
}


def test_val_save_hybrid_txt_conf(ds_root, tmp_path):
    """--save-hybrid injects GT as perfect-confidence NMS candidates (reference
    val.py:374): a random-weights model detects nothing at conf .25 without it,
    and detects every label with it; --save-txt/--save-conf write the rows."""
    from yolov3_tpu.eval import validator
    from yolov3_tpu.models.detection import DetectionModel

    data = {"path": str(Path(ds_root).parents[1]), "train": "images/train",
            "val": "images/train", "names": {0: "a", 1: "b"}}
    model = DetectionModel.from_config(MICRO_CFG, imgsz=64)

    d_plain = tmp_path / "plain"
    validator.run(data, model=model, batch_size=4, imgsz=64, rect=False, conf_thres=0.25,
                  save_txt=True, save_dir=d_plain)
    plain_rows = [ln for f in (d_plain / "labels").glob("*.txt") for ln in f.read_text().splitlines()]
    assert plain_rows == []  # random init at conf .25 -> no detections

    d_hyb = tmp_path / "hybrid"
    validator.run(data, model=model, batch_size=4, imgsz=64, rect=False, conf_thres=0.25,
                  save_hybrid=True, save_txt=True, save_conf=True, save_dir=d_hyb)
    txts = sorted((d_hyb / "labels").glob("*.txt"))
    assert len(txts) == 8
    rows = [ln.split() for f in txts for ln in f.read_text().splitlines()]
    assert len(rows) >= 8  # injected labels survive NMS
    assert all(len(r) == 6 for r in rows)  # cls xywhn + conf (save_conf)
    assert any(float(r[5]) > 0.99 for r in rows)  # perfect-confidence injected boxes


def test_val_batch_mosaics(ds_root, tmp_path):
    """plots=True writes val_batch{i}_labels/pred.jpg (reference val.py:417-419)."""
    from yolov3_tpu.eval import validator
    from yolov3_tpu.models.detection import DetectionModel

    data = {"path": str(Path(ds_root).parents[1]), "train": "images/train",
            "val": "images/train", "names": {0: "a", 1: "b"}}
    model = DetectionModel.from_config(MICRO_CFG, imgsz=64)
    validator.run(data, model=model, batch_size=4, imgsz=64, rect=False,
                  plots=True, save_dir=tmp_path)
    got = {p.name for p in tmp_path.glob("val_batch*")}
    assert {"val_batch0_labels.jpg", "val_batch0_pred.jpg",
            "val_batch1_labels.jpg", "val_batch1_pred.jpg"} <= got


def test_val_half_bf16(ds_root, tmp_path):
    """--half runs the val forward in bf16 (reference val.py:196 fp16 analog)."""
    from yolov3_tpu.eval import validator
    from yolov3_tpu.models.detection import DetectionModel

    data = {"path": str(Path(ds_root).parents[1]), "train": "images/train",
            "val": "images/train", "names": {0: "a", 1: "b"}}
    model = DetectionModel.from_config(MICRO_CFG, imgsz=64)
    results, _, _ = validator.run(data, model=model, batch_size=4, imgsz=64, rect=False,
                                  half=True, save_dir=tmp_path)
    assert all(np.isfinite(v) for v in results)


def test_train_rect_noplots_label_smoothing(ds_root, tmp_path):
    """--rect/--noplots/--label-smoothing/--sync-bn reach the engine: rect run
    completes on non-square buckets, plots are suppressed, hyp records eps."""
    import yaml

    from yolov3_tpu.train.loop import train

    data = {"path": str(Path(ds_root).parents[1]), "train": "images/train",
            "val": "images/train", "names": {0: "a", 1: "b"}}
    sd = tmp_path / "exp"
    train(data=data, cfg=MICRO_CFG, epochs=1, batch_size=4, imgsz=64, save_dir=sd,
          hyp={"lr0": 0.01, "lrf": 0.1, "momentum": 0.9, "weight_decay": 0.0,
               "warmup_epochs": 0.0, "box": 0.05, "obj": 1.0, "cls": 0.5, "mosaic": 1.0,
               "fliplr": 0.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0, "translate": 0.0,
               "scale": 0.0, "anchor_t": 4.0},
          noautoanchor=True, rect=True, noplots=True, label_smoothing=0.05, sync_bn=True)
    produced = {p.name for p in sd.glob("*")}
    assert "results.csv" in produced
    for banned in ("labels.png", "labels_correlogram.jpg", "train_batch0.jpg", "results.png"):
        assert banned not in produced, f"--noplots leaked {banned}"
    hyp_saved = yaml.safe_load((sd / "hyp.yaml").read_text())
    assert hyp_saved["label_smoothing"] == 0.05


def test_train_bf16_policy(ds_root, tmp_path):
    """half=True trains with a bf16 compute policy (the reference's AMP,
    train.py:214/345) — f32 params, bf16 forward, f32 loss; run completes."""
    import jax.numpy as jnp

    from yolov3_tpu.train.loop import train

    data = {"path": str(Path(ds_root).parents[1]), "train": "images/train",
            "val": "images/train", "names": {0: "a", 1: "b"}}
    sd = tmp_path / "exp"
    best, results, _ = train(
        data=data, cfg=MICRO_CFG, epochs=1, batch_size=4, imgsz=64, save_dir=sd,
        hyp={"lr0": 0.01, "lrf": 0.1, "momentum": 0.9, "weight_decay": 0.0,
             "warmup_epochs": 0.0, "box": 0.05, "obj": 1.0, "cls": 0.5, "mosaic": 0.0,
             "fliplr": 0.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0, "translate": 0.0,
             "scale": 0.0, "anchor_t": 4.0},
        noautoanchor=True, noplots=True, half=True,
    )
    assert np.isfinite(results[3])
    # params stored f32 (mixed precision, not weight casting)
    from yolov3_tpu.utils.checkpoint import load_model_from_checkpoint

    m = load_model_from_checkpoint(sd / "weights" / "last")
    leaf = next(iter(__import__("jax").tree.leaves(m.variables["params"])))
    assert leaf.dtype == jnp.float32


def test_env_probes_and_unicode_paths(tmp_path):
    """Env probes exist and run; cv2 wrappers handle non-ASCII paths
    (reference utils/general.py:92-155, 869-900)."""
    from yolov3_tpu.utils import env

    assert isinstance(env.is_colab(), bool)
    assert isinstance(env.is_kaggle(), bool)
    assert isinstance(env.is_docker(), bool)
    assert isinstance(env.is_jupyter(), bool)
    assert env.is_writeable(tmp_path, test=True)
    cfg = env.user_config_dir()
    assert cfg.exists()

    im = np.full((16, 16, 3), 99, np.uint8)
    p = tmp_path / "изображение_テスト.png"
    assert env.imwrite(p, im)
    back = env.imread(p)
    np.testing.assert_array_equal(back, im)

    # the dataset reader must survive non-ASCII image paths end-to-end
    root = tmp_path / "images" / "train"
    root.mkdir(parents=True)
    (tmp_path / "labels" / "train").mkdir(parents=True)
    env.imwrite(root / "картинка.jpg", np.full((32, 32, 3), 50, np.uint8))
    (tmp_path / "labels" / "train" / "картинка.txt").write_text("0 0.5 0.5 0.5 0.5")
    ds = DetectionDataset(str(root), imgsz=32, augment=False, batch_size=1, num_cls=1)
    img, labels, _ = ds[0]
    assert img.shape == (32, 32, 3) and len(labels) == 1


def test_profile_layers_param_accounting():
    """Per-layer profiler covers every layer; param sum equals the model total."""
    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.utils.profiling import profile_layers

    m = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    rows = profile_layers(m, imgsz=64, batch=1, reps=1)
    assert len(rows) == len(m.spec.layers)
    assert sum(r["params"] for r in rows) == m.num_params()
    # fused form must profile too (r2 regression: missing fused kwarg)
    mf = m.fuse()
    rows_f = profile_layers(mf, imgsz=64, batch=1, reps=1)
    assert len(rows_f) == len(m.spec.layers)
