"""API-surface tests: AutoShape/Detections, hub, MultiBackend, serve, autoanchor."""

import threading
import time

import numpy as np
import pytest

MICRO = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
    "layers": [
        {"from": -1, "n": 1, "op": "Conv", "args": [8, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": [3, 4], "n": 1, "op": "Detect", "args": ["nc", "anchors"]},
    ],
}


@pytest.fixture(scope="module")
def micro_model():
    from yolov3_tpu.models.detection import DetectionModel

    return DetectionModel.from_config(MICRO, imgsz=64)


def test_autoshape_ndarray_and_path(micro_model, tmp_path, rng):
    import cv2

    from yolov3_tpu.models.autoshape import AutoShape

    m = AutoShape(micro_model)
    m.conf = 0.0001
    im = rng.integers(0, 255, (100, 140, 3), dtype=np.uint8)
    p = tmp_path / "im.jpg"
    cv2.imwrite(str(p), im[:, :, ::-1])

    results = m([im, str(p)], size=96)
    assert len(results) == 2
    assert results.xyxy[0].shape[1] == 6
    # normalized views bounded
    for x in results.xyxyn:
        if len(x):
            assert (x[:, :4] <= 1.01).all()
    df = results.pandas().xyxy[0]
    assert list(df.columns[:6]) == ["xmin", "ymin", "xmax", "ymax", "confidence", "class"]
    rendered = results.render()
    assert rendered[0].shape == im.shape
    # tolist(): per-image Detections views (reference common.py:1000-1007)
    singles = results.tolist()
    assert len(singles) == 2 and all(len(s) == 1 for s in singles)
    assert np.array_equal(singles[0].xyxy[0], results.xyxy[0])
    # labels=False renders boxes without text; shape must be preserved
    unlabeled = results.render(labels=False)
    assert unlabeled[0].shape == im.shape
    # show() must not raise in a headless environment (warns and continues)
    results.show()


def test_hub_load(micro_model):
    import yolov3_tpu.hub as hub

    m = hub.load("yolov3-tiny", autoshape=False)
    assert m.spec.name == "yolov3-tiny"
    m2 = hub.yolov3_tiny(classes=10, autoshape=False)
    assert m2.spec.nc == 10


def test_multibackend_roundtrip(micro_model, tmp_path, rng):
    from yolov3_tpu import export as ex
    from yolov3_tpu.models.backend import MultiBackend
    from yolov3_tpu.utils.checkpoint import save_checkpoint

    # save a checkpoint dir for load_weights
    ck = tmp_path / "ck"
    save_checkpoint(
        ck,
        {"params": micro_model.variables["params"], "batch_stats": micro_model.variables["batch_stats"]},
        spec=micro_model.spec,
        meta={"names": {0: "a", 1: "b"}},
    )
    res = ex.run(str(ck), include=("stablehlo",), imgsz=64, out_dir=tmp_path)
    assert res["stablehlo"] is not None

    mb = MultiBackend(res["stablehlo"])
    im = rng.integers(0, 255, (1, 64, 64, 3), dtype=np.uint8)
    pred = mb(im)
    mb_native = MultiBackend(str(ck))
    pred2 = mb_native(im)
    np.testing.assert_allclose(pred, pred2, atol=2e-2)  # bf16 native vs f32 hlo


def test_ensemble_val_and_detect(micro_model, tmp_path, rng):
    """--weights a b builds a concat-NMS Ensemble (reference experimental.py:
    74-124) that runs through the validator and the detect CLI."""
    import cv2
    import jax.numpy as jnp

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.models.ensemble import attempt_load
    from yolov3_tpu.utils.checkpoint import save_checkpoint

    m2 = DetectionModel.from_config(MICRO, imgsz=64, key=__import__("jax").random.PRNGKey(7))
    paths = []
    for i, m in enumerate((micro_model, m2)):
        p = tmp_path / f"ck{i}"
        save_checkpoint(p, {"params": m.variables["params"], "batch_stats": m.variables["batch_stats"]},
                        spec=m.spec, meta={"names": {0: "a", 1: "b"}})
        paths.append(str(p))

    ens = attempt_load(paths)
    assert len(ens.models) == 2
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    single, _ = micro_model.predict(x)
    merged, _ = ens.predict(x)
    assert merged.shape[1] == 2 * single.shape[1]  # candidates concatenated

    # autoshape wraps the FULL ensemble (not models[0]): its NMS sees the
    # concatenated candidates of both members
    ash = attempt_load(paths, autoshape=True)
    assert hasattr(ash.model, "models") and len(ash.model.models) == 2
    im = np.zeros((64, 64, 3), np.uint8)
    dets = ash(im, size=64)
    assert dets.xyxy is not None  # end-to-end ensemble inference runs

    # through the validator (non-native branch: Ensemble quacks like a backend)
    root = tmp_path / "ds"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    for i in range(2):
        im = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / "train" / f"{i}.jpg"), im)
        (root / "labels" / "train" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4")
    data = {"path": str(root), "train": "images/train", "val": "images/train",
            "names": {0: "a", 1: "b"}}
    from yolov3_tpu.eval import validator

    results, _, _ = validator.run(data, model=ens, batch_size=2, imgsz=64)
    assert all(np.isfinite(v) for v in results)

    # through the detect CLI path (multi-weights -> ensemble branch)
    from yolov3_tpu.cli import detect

    save_dir = detect.run(weights=paths, source=str(root / "images" / "train"), imgsz=(64, 64),
                          conf_thres=0.0001, project=str(tmp_path), name="ens")
    assert save_dir.exists()


def test_microbatcher_coalesces_and_matches(micro_model, rng):
    """Concurrent submits coalesce into fewer device calls, and every caller
    gets the same rows a standalone batched call would give it."""
    from yolov3_tpu.serve import MicroBatcher, build_batched_infer

    infer = build_batched_infer(micro_model, conf_thres=1e-4, fast=False)
    b = MicroBatcher(infer, max_batch=8, batch_wait_ms=500.0)
    b.warmup(64)
    assert b.buckets == [1, 2, 4, 8]

    ims = [np.ascontiguousarray(x) for x in rng.integers(0, 255, (6, 64, 64, 3), dtype=np.uint8)]
    results = [None] * len(ims)

    def worker(i):
        results[i] = b.submit(ims[i])

    calls0 = b.calls
    threads = [threading.Thread(target=worker, args=(i,)) for i in range(len(ims))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert all(r is not None for r in results)
    # 6 concurrent requests with a 500 ms window must not take 6 device calls
    assert b.calls - calls0 < len(ims)
    # row-level parity with a direct batched call
    dets_ref, n_ref = infer(np.stack(ims))
    dets_ref, n_ref = np.asarray(dets_ref), np.asarray(n_ref)
    for i, (dets, n) in enumerate(results):
        assert n == int(n_ref[i])
        np.testing.assert_allclose(dets, dets_ref[i, :n], rtol=1e-5, atol=1e-5)


def test_microbatcher_survives_malformed_frame(micro_model, rng):
    """A frame the dispatcher can't stack (mismatched channel count coalesced
    with normal frames) fails its waiters but must NOT kill the dispatcher
    thread — later submits still serve."""
    from yolov3_tpu.serve import MicroBatcher, build_batched_infer

    infer = build_batched_infer(micro_model, conf_thres=1e-4, fast=False)
    b = MicroBatcher(infer, max_batch=4, batch_wait_ms=200.0)
    b.warmup(64)

    good = np.ascontiguousarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    bad = np.ascontiguousarray(rng.integers(0, 255, (64, 64, 4), dtype=np.uint8))
    errs = {}

    def worker(key, im):
        try:
            errs[key] = b.submit(im)
        except Exception as e:  # noqa: BLE001
            errs[key] = e

    ts = [threading.Thread(target=worker, args=(k, im)) for k, im in [("g", good), ("b", bad)]]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert isinstance(errs["b"], Exception) or isinstance(errs["g"], Exception)
    # the dispatcher must still be alive and serving
    assert b._thread.is_alive()
    dets, n = b.submit(good)
    assert isinstance(n, int)


@pytest.mark.slow  # server warmup compile can exceed the wait on a loaded 1-core box
def test_serve_roundtrip(micro_model, tmp_path, rng):
    import cv2

    from yolov3_tpu.serve import RemoteModel, serve
    from yolov3_tpu.utils.checkpoint import save_checkpoint

    ck = tmp_path / "ck"
    save_checkpoint(
        ck,
        {"params": micro_model.variables["params"], "batch_stats": micro_model.variables["batch_stats"]},
        spec=micro_model.spec,
        meta={"names": {0: "a", 1: "b"}},
    )
    port = 8601
    t = threading.Thread(target=serve, args=(str(ck),), kwargs={"port": port, "imgsz": 64, "conf_thres": 0.0001},
                         daemon=True)
    t.start()
    for _ in range(120):
        try:
            client = RemoteModel(f"http://localhost:{port}")
            break
        except Exception:  # noqa: BLE001
            time.sleep(1)
    else:
        pytest.fail("server did not come up")
    im = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
    dets = client(im)
    assert dets.shape[1] == 6


def test_autoanchor_kmeans(rng):
    from yolov3_tpu.utils.autoanchor import anchor_metrics, kmean_anchors

    # synthetic wh clusters
    wh = np.concatenate([
        rng.normal(20, 2, (300, 2)),
        rng.normal(60, 5, (300, 2)),
        rng.normal(150, 10, (300, 2)),
    ]).clip(4)
    k = kmean_anchors(wh.astype(np.float32), n=6, gen=100)
    assert k.shape == (6, 2)
    bpr, _ = anchor_metrics(wh, k)
    assert bpr > 0.98  # evolved anchors cover the clusters
    # sorted by area
    areas = k.prod(1)
    assert (np.diff(areas) >= -1e-3).all()
