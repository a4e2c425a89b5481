"""Hermetic tests for the in-tree dataset preparers (data/converters.py).

Each test builds a miniature raw dataset in the layout the real archive
extracts to, runs the registered converter (downloads never fire — the raw
files already exist), and checks the YOLO labels against hand-computed
values. This pins the conversion semantics of the reference's YAML-exec
recipes (reference data/*.yaml download blocks) without network access.
"""

import json
import zipfile
from pathlib import Path

import cv2
import numpy as np
import pytest

from yolov3_tpu.data import converters


def _img(path, w, h):
    path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(path), np.full((h, w, 3), 100, np.uint8))


def test_visdrone_conversion(tmp_path):
    root = tmp_path / "VisDrone"
    for s in ("VisDrone2019-DET-train", "VisDrone2019-DET-val", "VisDrone2019-DET-test-dev"):
        d = root / s
        _img(d / "images" / "0001.jpg", 200, 100)
        (d / "annotations").mkdir(parents=True)
        # x,y,w,h,score,cls,...; score==0 row is 'ignored regions' -> dropped
        (d / "annotations" / "0001.txt").write_text(
            "10,20,40,30,1,4,0,0\n"
            "0,0,200,100,0,0,0,0\n"
            "50,50,100,50,1,1,0,0\n")
    converters.prepare("visdrone", root)
    lab = (root / "VisDrone2019-DET-train" / "labels" / "0001.txt").read_text().splitlines()
    assert len(lab) == 2
    # cls 4 -> 3; cx=(10+20)/200, cy=(20+15)/100, w=40/200, h=30/100
    assert lab[0] == "3 0.150000 0.350000 0.200000 0.300000"
    assert lab[1].startswith("0 0.500000 0.750000")


def test_argoverse_conversion(tmp_path):
    root = tmp_path / "Argoverse"
    seq = "seq-0"
    _img(root / "Argoverse-1.1" / "tracking" / seq / "f0.jpg", 8, 8)
    ann = {
        "images": [{"name": "f0.jpg", "sid": 0}],
        "seq_dirs": [seq],
        "annotations": [
            {"image_id": 0, "category_id": 2, "bbox": [192.0, 120.0, 192.0, 240.0]},
            {"image_id": 0, "category_id": 5, "bbox": [0.0, 0.0, 1920.0, 1200.0]},
        ],
    }
    d = root / "Argoverse-HD" / "annotations"
    d.mkdir(parents=True)
    for s in ("train.json", "val.json"):
        (d / s).write_text(json.dumps(ann))
    converters.prepare("argoverse", root)
    assert (root / "Argoverse-1.1" / "images" / seq).exists(), "tracking/ not renamed"
    lab = (root / "Argoverse-1.1" / "labels" / seq / "f0.txt").read_text().splitlines()
    # (192+96)/1920=0.15, (120+120)/1200=0.2, 192/1920=0.1, 240/1200=0.2
    assert lab[0] == "2 0.15 0.2 0.1 0.2"
    assert lab[1] == "5 0.5 0.5 1.0 1.0"


def test_argoverse_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="manual"):
        converters.prepare("argoverse", tmp_path / "nope")


def test_sku110k_conversion(tmp_path):
    root = tmp_path / "SKU-110K"
    (root / "annotations").mkdir(parents=True)
    rows = ("im_a.jpg,10,20,110,70,object,200,100\n"
            "im_a.jpg,0,0,200,100,object,200,100\n"
            "im_b.jpg,50,25,150,75,object,200,100\n")
    for d in ("annotations_train.csv", "annotations_val.csv", "annotations_test.csv"):
        (root / "annotations" / d).write_text(rows)
    converters.prepare("sku110k", root)
    assert (root / "train.txt").read_text() == "./images/im_a.jpg\n./images/im_b.jpg\n"
    lab = (root / "labels" / "im_a.txt").read_text().splitlines()
    # cx=(10+110)/2/200=0.3, cy=(20+70)/2/100=0.45, w=100/200=0.5, h=50/100=0.5
    assert lab[0] == "0 0.30000 0.45000 0.50000 0.50000"
    assert len(lab) == 2
    assert (root / "labels" / "im_b.txt").read_text() == "0 0.50000 0.50000 0.50000 0.50000\n"


def test_global_wheat_regroup(tmp_path):
    root = tmp_path / "GlobalWheat2020"
    for d in ("arvalis_1", "ethz_1"):
        _img(root / d / "x.png", 4, 4)
        (root / f"{d}.json").write_text("{}")
    converters.prepare("global_wheat_2020", root)
    for d in ("arvalis_1", "ethz_1"):
        assert (root / "images" / d / "x.png").exists()
        assert (root / "annotations" / f"{d}.json").exists()
        assert not (root / d).exists()
    assert (root / "labels").is_dir()


def test_xview_conversion(tmp_path):
    root = tmp_path / "xView"
    _img(root / "train_images" / "100.tif", 100, 50)
    _img(root / "val_images" / "200.tif", 10, 10)
    feats = [
        # type_id 17 -> class 4; box clips to image
        {"properties": {"bounds_imcoords": "10,10,60,35", "image_id": "100.tif", "type_id": 17}},
        # unassigned type_id 75 -> class -1 -> skipped with a warning
        {"properties": {"bounds_imcoords": "0,0,10,10", "image_id": "100.tif", "type_id": 75}},
        # empty bounds -> skipped
        {"properties": {"bounds_imcoords": "", "image_id": "100.tif", "type_id": 17}},
        # missing image file -> skipped
        {"properties": {"bounds_imcoords": "0,0,5,5", "image_id": "missing.tif", "type_id": 17}},
    ]
    (root / "xView_train.geojson").write_text(json.dumps({"features": feats}))
    converters.prepare("xview", root)
    lab = (root / "labels" / "train" / "100.txt").read_text().splitlines()
    assert lab == ["4 0.350000 0.450000 0.500000 0.500000"]
    assert (root / "images" / "train" / "100.tif").exists()
    assert (root / "images" / "val" / "200.tif").exists()
    assert (root / "images" / "autosplit_train.txt").exists() or \
           (root / "images" / "autosplit_val.txt").exists()


def test_xview_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="manual"):
        converters.prepare("xview", tmp_path / "nope")


def test_objects365_conversion(tmp_path):
    root = tmp_path / "Objects365"
    # image arrives inside a patch dir -> must be flattened up
    _img(root / "images" / "val" / "patch0" / "img1.jpg", 4, 4)
    (root / "images" / "train").mkdir(parents=True)
    ann = {
        # out-of-order category ids: cls index = rank by sorted id
        "categories": [{"id": 7, "name": "b"}, {"id": 3, "name": "a"}],
        "images": [{"id": 9, "width": 200, "height": 100, "file_name": "patch0/img1.jpg"}],
        "annotations": [
            {"image_id": 9, "category_id": 7, "bbox": [10, 20, 100, 50], "iscrowd": 0},
            {"image_id": 9, "category_id": 3, "bbox": [0, 0, 200, 100], "iscrowd": 0},
            {"image_id": 9, "category_id": 3, "bbox": [0, 0, 9, 9], "iscrowd": 1},
        ],
    }
    for s in ("train", "val"):
        (root / f"zhiyuan_objv2_{s}.json").write_text(
            json.dumps(ann if s == "val" else {"categories": [], "images": [], "annotations": []}))
    converters.prepare("objects365", root)
    assert (root / "images" / "val" / "img1.jpg").exists(), "patch dir not flattened"
    lab = (root / "labels" / "val" / "img1.txt").read_text().splitlines()
    # cat 7 -> cls 1; cx=(10+60)/200=0.3, cy=(20+45)/100=0.45... bbox xywh:
    # x=10,y=20,w=100,h=50 -> xyxy (10,20,110,70) -> 0.3,0.45,0.5,0.5
    assert lab[0] == "1 0.30000 0.45000 0.50000 0.50000"
    assert lab[1] == "0 0.50000 0.50000 1.00000 1.00000"
    assert len(lab) == 2, "iscrowd annotation must be dropped"


def test_autosplit_deterministic(tmp_path):
    d = tmp_path / "ds" / "images"
    for i in range(20):
        _img(d / f"{i:02d}.jpg", 4, 4)
    files1 = converters.autosplit(d, weights=(0.8, 0.2, 0.0), seed=0)
    t1 = (tmp_path / "ds" / "autosplit_train.txt").read_text()
    files2 = converters.autosplit(d, weights=(0.8, 0.2, 0.0), seed=0)
    assert (tmp_path / "ds" / "autosplit_train.txt").read_text() == t1
    n = sum(len(f.read_text().splitlines()) for f in files2)
    assert n == 20
    assert t1.splitlines()[0].startswith("./images/")


def test_dataset_yaml_routes_converter(tmp_path, monkeypatch):
    from yolov3_tpu.data import dataset_yaml

    called = {}

    def fake(root):
        called["root"] = Path(root)
        _img(Path(root) / "images" / "val" / "a.jpg", 4, 4)

    monkeypatch.setitem(converters.CONVERTERS, "fake_ds", fake)
    data = {
        "path": str(tmp_path / "fake"),
        "train": "images/val",
        "val": "images/val",
        "names": {0: "x"},
        "download": "converter://fake_ds",
    }
    out = dataset_yaml.check_dataset(data)
    assert called["root"] == tmp_path / "fake"
    assert Path(out["val"]).exists()


def test_shipped_dataset_yamls_resolve_registered_converters():
    import yaml

    ddir = Path(converters.__file__).parent
    found = 0
    for f in ddir.glob("*.yaml"):
        d = yaml.safe_load(f.read_text())
        s = d.get("download", "")
        if isinstance(s, str) and s.startswith("converter://"):
            name = s[len("converter://"):]
            assert name in converters.CONVERTERS, f"{f.name} names unknown converter {name}"
            found += 1
    assert found >= 6


def test_download_extracts_local_zip(tmp_path):
    from yolov3_tpu.utils.downloads import download

    src = tmp_path / "payload.zip"
    with zipfile.ZipFile(src, "w") as z:
        z.writestr("inner/a.txt", "hello")
    download([str(src)], dir=tmp_path / "out")
    assert (tmp_path / "out" / "inner" / "a.txt").read_text() == "hello"
    assert src.exists(), "local source files must not be deleted"
