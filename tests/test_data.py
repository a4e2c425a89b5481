"""Data pipeline tests: letterbox geometry, dataset loading, label cache, collation."""

from pathlib import Path

import cv2
import numpy as np
import pytest

from yolov3_tpu.data.augment import augment_hsv, box_candidates, letterbox, mosaic4, random_perspective
from yolov3_tpu.data.datasets import DataLoader, DetectionDataset, collate_fixed, img2label_paths, verify_image_label


@pytest.fixture(scope="module")
def mini_ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
        im = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images" / "train" / f"{i}.jpg"), im)
        (root / "labels" / "train" / f"{i}.txt").write_text(f"{i % 2} 0.5 0.5 0.4 0.3\n")
    return root


def test_img2label_paths():
    out = img2label_paths(["/data/images/train/a.jpg"])
    assert out == ["/data/labels/train/a.txt"]


def test_letterbox_exact_square():
    im = np.zeros((480, 640, 3), np.uint8)
    out, ratio, pad = letterbox(im, 640, auto=False)
    assert out.shape == (640, 640, 3)
    assert ratio == (1.0, 1.0)
    assert pad == (0.0, 80.0)


def test_letterbox_auto_stride():
    im = np.zeros((480, 640, 3), np.uint8)
    out, _, _ = letterbox(im, 640, auto=True, stride=32)
    assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
    assert out.shape == (480, 640, 3)  # already multiples


def test_verify_image_label(mini_ds):
    imgs = sorted((mini_ds / "images" / "train").glob("*.jpg"))
    lb, shape, msg = verify_image_label(str(imgs[0]), str(mini_ds / "labels" / "train" / "0.txt"), 2)
    assert msg is None
    assert lb.shape == (1, 5)
    # bad label: out-of-range class
    bad = mini_ds / "labels" / "train" / "bad.txt"
    bad.write_text("7 0.5 0.5 0.5 0.5\n")
    lb, shape, msg = verify_image_label(str(imgs[0]), str(bad), 2)
    assert msg is not None


def test_dataset_and_cache(mini_ds, tmp_path):
    ds = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, augment=False, num_cls=2,
                          cache_dir=tmp_path / "c1")
    assert len(ds) == 4
    img, labels, meta = ds[0]
    assert img.dtype == np.uint8 and img.shape == (96, 96, 3)
    assert labels.shape[1] == 5
    assert (labels[:, 1:] <= 1).all() and (labels[:, 1:] >= 0).all()
    # cache reuse
    ds2 = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, augment=False, num_cls=2,
                           cache_dir=tmp_path / "c1")
    assert len(ds2) == 4


def test_rect_batches(mini_ds, tmp_path):
    ds = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, rect=True, stride=32, pad=0.5,
                          batch_size=2, num_cls=2, cache_dir=tmp_path / "c2")
    assert hasattr(ds, "batch_shapes")
    assert (ds.batch_shapes % 32 == 0).all()
    img, labels, meta = ds[0]
    bs = ds.batch_shapes[ds.batch_index[0]]
    assert img.shape[:2] == tuple(bs)


def test_collate_fixed(mini_ds, tmp_path):
    ds = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, num_cls=2, cache_dir=tmp_path / "c3")
    samples = [ds[i] for i in range(4)]
    imgs, targets, mask, shapes = collate_fixed(samples, max_labels=16)
    assert imgs.shape == (4, 96, 96, 3)
    assert targets.shape == (4, 16, 5)
    assert mask.shape == (4, 16)
    assert mask.sum() == sum(len(s[1]) for s in samples)


def test_label_bucket_selection():
    from yolov3_tpu.data.datasets import label_bucket

    assert label_bucket(0, 300) == 32  # floor
    assert label_bucket(5, 300) == 32
    assert label_bucket(33, 300) == 64
    assert label_bucket(100, 300) == 128
    assert label_bucket(200, 300) == 256
    assert label_bucket(257, 300) == 300  # cap, not 512
    assert label_bucket(400, 300) == 300
    assert label_bucket(40, 48) == 48  # cap below the power-of-two


def test_collate_bucketed_shrinks_pad_keeps_labels(mini_ds, tmp_path):
    ds = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, num_cls=2, cache_dir=tmp_path / "cb")
    samples = [ds[i] for i in range(4)]
    full = collate_fixed(samples, max_labels=300)
    bkt = collate_fixed(samples, max_labels=300, bucket=True)
    assert bkt[1].shape[1] == 32  # mini_ds images carry few labels
    assert bkt[2].sum() == full[2].sum()
    # identical label content where both are valid
    np.testing.assert_array_equal(bkt[1][bkt[2]], full[1][full[2]])


def test_dataloader_label_buckets(mini_ds, tmp_path):
    ds = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, num_cls=2, cache_dir=tmp_path / "cb2")
    for b_full, b_bkt in zip(DataLoader(ds, batch_size=2, max_labels=300),
                             DataLoader(ds, batch_size=2, max_labels=300, label_buckets=True)):
        assert b_bkt[1].shape[1] == 32 and b_full[1].shape[1] == 300
        np.testing.assert_array_equal(b_bkt[1][b_bkt[2]], b_full[1][b_full[2]])


def test_label_bucket_high_water_mark(mini_ds, tmp_path):
    """Once a wider bucket is seen, later batches keep it (each new width is
    an XLA recompile of the train step — widths must grow monotonically)."""
    ds = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, num_cls=2, cache_dir=tmp_path / "cb3")
    dl = DataLoader(ds, batch_size=2, max_labels=300, label_buckets=True)
    dl._label_hwm = 64  # simulate having seen a crowded batch
    widths = [b[1].shape[1] for b in dl]
    assert all(w == 64 for w in widths), widths
    # and a genuinely wider batch still raises the mark
    from yolov3_tpu.data.datasets import collate_fixed as cf

    out = cf([(np.zeros((8, 8, 3), np.uint8), np.zeros((90, 5), np.float32), None)],
             max_labels=300, bucket=True, floor=64)
    assert out[1].shape[1] == 128


def test_dataloader_iteration(mini_ds, tmp_path):
    ds = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, num_cls=2, cache_dir=tmp_path / "c4")
    dl = DataLoader(ds, batch_size=2, shuffle=True, max_labels=8)
    batches = list(dl)
    assert len(batches) == 2
    assert all(b[0].shape[0] == 2 for b in batches)


def test_mosaic(mini_ds, tmp_path):
    ds = DetectionDataset(
        str(mini_ds / "images" / "train"), imgsz=96, augment=True,
        hyp={"mosaic": 1.0, "translate": 0.1, "scale": 0.5, "fliplr": 0.0, "hsv_h": 0, "hsv_s": 0, "hsv_v": 0},
        num_cls=2, cache_dir=tmp_path / "c5",
    )
    img, labels, meta = ds[0]
    assert img.shape == (96, 96, 3)  # 2x canvas cropped back to imgsz by the border
    if len(labels):
        assert (labels[:, 1:] >= 0).all() and (labels[:, 1:] <= 1).all()


def test_random_perspective_identity():
    im = np.zeros((100, 100, 3), np.uint8)
    targets = np.array([[0, 20.0, 20.0, 60.0, 60.0]], np.float32)
    out_im, out_t = random_perspective(im, targets.copy(), degrees=0, translate=0, scale=0, shear=0)
    assert out_im.shape == im.shape
    np.testing.assert_allclose(out_t[:, 1:], targets[:, 1:], atol=1.0)


def test_box_candidates_filters_small():
    b1 = np.array([[0.0], [0.0], [50.0], [50.0]])
    b2_ok = np.array([[0.0], [0.0], [40.0], [40.0]])
    b2_small = np.array([[0.0], [0.0], [1.0], [1.0]])
    assert box_candidates(b1, b2_ok)[0]
    assert not box_candidates(b1, b2_small)[0]


def test_hsv_inplace(rng):
    im = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    before = im.copy()
    augment_hsv(im, 0.5, 0.5, 0.5)
    assert im.shape == before.shape
    assert im.dtype == np.uint8


def test_label_cache_stays_aligned_after_corrupt_drop(tmp_path):
    """A corrupt image is dropped by verify_image_label on the FIRST scan; the
    cache-hit path must restore the same filtered file list — otherwise every
    image after the corrupt one silently pairs with its neighbor's labels."""
    root = tmp_path / "ds"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    rng = np.random.default_rng(3)
    for i in range(4):
        name = f"{i}.jpg"
        if i == 1:  # corrupt: not a decodable image
            (root / "images" / "train" / name).write_bytes(b"not a jpeg")
        else:
            cv2.imwrite(str(root / "images" / "train" / name),
                        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
        (root / "labels" / "train" / f"{i}.txt").write_text(f"{i % 2} 0.5 0.5 0.4 0.3\n")

    kw = dict(imgsz=64, augment=False, num_cls=2, cache_dir=tmp_path / "cc")
    ds1 = DetectionDataset(str(root / "images" / "train"), **kw)
    ds2 = DetectionDataset(str(root / "images" / "train"), **kw)  # cache hit
    assert ds1.im_files == ds2.im_files
    assert len(ds2) == 3 and len(ds2.labels) == 3
    assert not any("1.jpg" in f for f in ds2.im_files)
    # labels still pair with their own image: file i has class i % 2
    for f, lb in zip(ds2.im_files, ds2.labels):
        i = int(Path(f).stem)
        assert int(lb[0, 0]) == i % 2, (f, lb)


def test_dataloader_multi_scale_in_workers(mini_ds, tmp_path):
    """Multi-scale resize runs inside the loader (VERDICT r3 #8: no cv2 loop
    or device fetch on the trainer's hot loop): batch H/W follows the bucket
    schedule with the given period, is deterministic given (seed, ms_offset),
    and labels (normalized xywhn) are untouched by the square resize."""
    ds = DetectionDataset(str(mini_ds / "images" / "train"), imgsz=96, num_cls=2, cache_dir=tmp_path / "ms")
    buckets = [64, 96, 128]

    def sizes_for(offset, workers):
        dl = DataLoader(ds, batch_size=2, shuffle=False, max_labels=8, workers=workers)
        dl.set_multi_scale(buckets, seed=3, period=1)  # period 1: new draw per batch
        dl.ms_offset = offset
        out = []
        for imgs, targets, mask, _ in dl:
            assert imgs.shape[1] == imgs.shape[2] and imgs.shape[1] in buckets
            out.append(imgs.shape[1])
        return out

    s0 = sizes_for(0, workers=1)
    assert s0 == sizes_for(0, workers=2)  # worker pool doesn't change the draw
    assert len(set(s0 + sizes_for(2, workers=1))) > 1  # schedule actually varies

    # period > 1 keeps the size constant within the window
    dl = DataLoader(ds, batch_size=2, shuffle=False, max_labels=8)
    dl.set_multi_scale(buckets, seed=3, period=10)
    assert len({b[0].shape[1] for b in dl}) == 1

    # labels are untouched: compare against a no-multi-scale epoch
    dl_ms = DataLoader(ds, batch_size=2, shuffle=False, max_labels=8)
    dl_ms.set_multi_scale([64], seed=0, period=1)
    dl_plain = DataLoader(ds, batch_size=2, shuffle=False, max_labels=8)
    for (im_a, t_a, m_a, _), (im_b, t_b, m_b, _) in zip(dl_ms, dl_plain):
        assert im_a.shape[1:3] == (64, 64) and im_b.shape[1:3] == (96, 96)
        np.testing.assert_array_equal(t_a, t_b)
        np.testing.assert_array_equal(m_a, m_b)
