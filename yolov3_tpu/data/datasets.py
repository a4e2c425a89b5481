"""Dataset + dataloader: host-side pipeline feeding fixed-shape TPU batches.

Re-design of the reference data layer (reference utils/dataloaders.py:432-858)
with one structural change: batches are **static-shape** — images come out as
(B, H, W, 3) uint8 with H, W fixed per bucket, and labels as a padded
(B, M, 5) float32 [cls, xywhn] plus a (B, M) bool mask, so the jitted train
step never recompiles. The reference's dynamic concat-collate
(dataloaders.py:824-830) is a torch convention that would force XLA
recompilation every step.

Kept semantics:
 - image/label discovery: images from dirs/txt lists, labels via the
   images->labels path substitution (ultralytics img2label_paths);
 - label .cache (npz) keyed by a hash of paths+sizes (dataloaders.py:489-495);
 - label verification: class bounds, normalized coords, dedup
   (dataloaders.py:864-912);
 - mosaic -> mixup -> HSV -> flips augmentation chain (dataloaders.py:659-735);
 - rect mode: aspect-ratio-sorted per-batch shapes ceil'd to stride multiples
   with pad margin (dataloaders.py:547-570) — here additionally snapped to a
   bounded set of shape buckets to cap XLA recompiles.
"""

from __future__ import annotations

import hashlib
import math
import os
import random
import threading
from pathlib import Path

import cv2
import numpy as np

from yolov3_tpu.data.augment import augment_hsv, letterbox, mixup, mosaic4
from yolov3_tpu.utils.general import LOGGER
from yolov3_tpu.ops.boxes import xywhn2xyxy, xyxy2xywhn

IMG_FORMATS = ("bmp", "dng", "jpeg", "jpg", "mpo", "png", "tif", "tiff", "webp", "pfm")
CACHE_VERSION = "yolov3_tpu-cache-v2"  # v2: caches the corrupt-filtered im_files


def img2label_paths(img_paths):
    """images/xxx.jpg -> labels/xxx.txt (reference convention)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


def list_images(path):
    """Expand a dir / txt-list / glob into a sorted list of image files."""
    files = []
    for p in path if isinstance(path, list) else [path]:
        p = Path(p)
        if p.is_dir():
            files += [str(f) for f in sorted(p.rglob("*.*"))]
        elif p.is_file() and p.suffix == ".txt":
            parent = str(p.parent) + os.sep
            with open(p) as f:
                lines = f.read().strip().splitlines()
            files += [x.replace("./", parent, 1) if x.startswith("./") else x for x in lines]
        elif p.is_file():
            files.append(str(p))
        else:
            import glob as _glob

            files += sorted(_glob.glob(str(p), recursive=True))
    files = [x for x in files if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS]
    assert files, f"No images found in {path}"
    return files


def _paths_hash(paths):
    h = hashlib.sha256()
    for p in paths:
        h.update(p.encode())
        try:
            h.update(str(os.path.getsize(p)).encode())
        except OSError:
            pass
    return h.hexdigest()


def verify_image_label(im_file, lb_file, num_cls):
    """Validate one image/label pair; returns (labels (n,5), shape (w,h), msg|None)."""
    try:
        from PIL import Image

        im = Image.open(im_file)
        im.verify()
        shape = im.size  # (w, h)
        assert (shape[0] > 9) and (shape[1] > 9), f"image size {shape} <10 pixels"
        if os.path.isfile(lb_file):
            with open(lb_file) as f:
                lb = [x.split() for x in f.read().strip().splitlines() if len(x)]
                if any(len(x) > 6 for x in lb):  # segments -> boxes
                    classes = np.array([x[0] for x in lb], dtype=np.float32)
                    segs = [np.array(x[1:], dtype=np.float32).reshape(-1, 2) for x in lb]
                    boxes = np.array(
                        [[s[:, 0].min(), s[:, 1].min(), s[:, 0].max(), s[:, 1].max()] for s in segs],
                        dtype=np.float32,
                    )
                    cxy = (boxes[:, :2] + boxes[:, 2:]) / 2
                    wh = boxes[:, 2:] - boxes[:, :2]
                    lb = np.concatenate([classes[:, None], cxy, wh], 1)
                else:
                    lb = np.array(lb, dtype=np.float32)
            if len(lb):
                assert lb.shape[1] == 5, f"labels require 5 columns, {lb.shape[1]} given"
                assert (lb >= 0).all(), "negative label values"
                assert (lb[:, 1:] <= 1).all(), "non-normalized coordinates"
                assert (lb[:, 0] < num_cls).all(), "class id out of range"
                _, idx = np.unique(lb, axis=0, return_index=True)
                if len(idx) < len(lb):
                    lb = lb[np.sort(idx)]
            else:
                lb = np.zeros((0, 5), dtype=np.float32)
        else:
            lb = np.zeros((0, 5), dtype=np.float32)
        return lb, shape, None
    except Exception as e:  # noqa: BLE001
        return None, None, f"ignoring corrupt image/label {im_file}: {e}"


class DetectionDataset:
    """Images + labels with mosaic/augment pipeline producing fixed-shape samples."""

    def __init__(
        self,
        path,
        imgsz=640,
        augment=False,
        hyp=None,
        rect=False,
        stride=32,
        pad=0.0,
        batch_size=16,
        num_cls=80,
        max_labels=300,
        cache_dir=None,
        single_cls=False,
        cache_images=None,
    ):
        self.imgsz = imgsz
        self.augment = augment
        self.hyp = hyp or {}
        self.rect = rect
        self.stride = stride
        self.pad = pad
        self.max_labels = max_labels
        self.mosaic = augment and not rect and self.hyp.get("mosaic", 0) > 0
        self.mosaic_border = [-imgsz // 2, -imgsz // 2]
        if augment:  # reference applies albumentations every train item (dataloaders.py:700)
            from yolov3_tpu.data.augment import Albumentations

            self.albumentations = Albumentations(size=imgsz)
        else:
            self.albumentations = None

        self.im_files = list_images(path)
        self.label_files = img2label_paths(self.im_files)
        cache_path = Path(cache_dir or Path(self.label_files[0]).parent).with_suffix(".cache.npz")
        labels, shapes = self._load_or_build_cache(cache_path, num_cls)
        self.labels = labels
        if single_cls:
            for lb in self.labels:
                if len(lb):
                    lb[:, 0] = 0
        self.shapes = np.array(shapes, dtype=np.float64)  # (n, 2) wh
        n = len(self.im_files)
        self.indices = np.arange(n)

        if rect:  # aspect-ratio sort + per-batch shapes (reference dataloaders.py:547-570)
            bi = np.floor(np.arange(n) / batch_size).astype(int)
            nb = bi[-1] + 1
            ar = self.shapes[:, 1] / self.shapes[:, 0]  # h/w
            irect = ar.argsort()
            self.im_files = [self.im_files[i] for i in irect]
            self.label_files = [self.label_files[i] for i in irect]
            self.labels = [self.labels[i] for i in irect]
            self.shapes = self.shapes[irect]
            ar = ar[irect]
            shapes_out = [[1, 1]] * nb
            for b in range(nb):
                ari = ar[bi == b]
                mini, maxi = ari.min(), ari.max()
                if maxi < 1:
                    shapes_out[b] = [maxi, 1]
                elif mini > 1:
                    shapes_out[b] = [1, 1 / mini]
            self.batch_shapes = (
                np.ceil(np.array(shapes_out) * imgsz / stride + pad).astype(int) * stride
            )
            self.batch_index = bi

        # RAM/disk image caching (reference dataloaders.py:572-608): caches the
        # PRE-RESIZED image (long side = imgsz), skipping decode+resize per epoch
        self.ims = [None] * len(self.im_files)
        self.im_meta = [None] * len(self.im_files)  # ((h0, w0), (h, w)) per cached image
        self.cache_mode = cache_images if cache_images in ("ram", "disk") else None
        if self.cache_mode:
            self._cache_images(self.cache_mode)

    def _cache_images(self, mode):
        """Pre-decode every image into RAM (with a fit check) or .npy files."""
        n = len(self.im_files)
        if mode == "ram":
            # estimate required bytes from a sample (reference check_cache_ram)
            est = 0
            for i in np.random.default_rng(0).choice(n, min(8, n), replace=False):
                im = cv2.imread(self.im_files[int(i)])
                r = self.imgsz / max(im.shape[:2])
                est += im.nbytes * min(r, 1.0) ** 2
            need = est * n / min(8, n) * 1.1
            try:
                avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
            except (ValueError, OSError):
                avail = float("inf")
            if need > avail * 0.8:
                LOGGER.warning(
                    f"image cache needs ~{need / 1e9:.1f}GB RAM but only {avail / 1e9:.1f}GB available — not caching"
                )
                self.cache_mode = None
                return
        gb = 0
        for i in range(n):
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if mode == "disk":
                if not npy.exists():
                    im, _, _ = self._read_resize(i)
                    np.save(str(npy), im)
                gb += npy.stat().st_size
            else:
                self.ims[i], hw0, hw = self._read_resize(i)
                self.im_meta[i] = (hw0, hw)
                gb += self.ims[i].nbytes
        LOGGER.info(f"cached {n} images to {mode} ({gb / 1e9:.2f}GB)")

    def _read_resize(self, i):
        """Decode + pre-resize one image so the long side is imgsz."""
        from yolov3_tpu.utils.env import imread

        im = imread(self.im_files[i])  # BGR; non-ASCII-path-safe (reference cv2 patch)
        assert im is not None, f"Image not found {self.im_files[i]}"
        h0, w0 = im.shape[:2]
        r = self.imgsz / max(h0, w0)
        if r != 1:
            interp = cv2.INTER_LINEAR if (self.augment or r > 1) else cv2.INTER_AREA
            im = cv2.resize(im, (math.ceil(w0 * r), math.ceil(h0 * r)), interpolation=interp)
        return im, (h0, w0), im.shape[:2]

    def _load_or_build_cache(self, cache_path, num_cls):
        key = _paths_hash(self.im_files + self.label_files)
        if cache_path.is_file():
            try:
                z = np.load(cache_path, allow_pickle=True)
                if str(z["version"]) == CACHE_VERSION and str(z["hash"]) == key:
                    # restore the corrupt-filtered file list too — labels and
                    # im_files must stay index-aligned (a dropped corrupt image
                    # would otherwise shift every later label one slot)
                    self.im_files = [str(f) for f in z["im_files"]]
                    self.label_files = img2label_paths(self.im_files)
                    return list(z["labels"]), z["shapes"]
            except Exception:  # noqa: BLE001
                pass
        labels, shapes, keep, msgs = [], [], [], []
        for im_f, lb_f in zip(self.im_files, self.label_files):
            lb, shape, msg = verify_image_label(im_f, lb_f, num_cls)
            if msg:
                msgs.append(msg)
                continue
            labels.append(lb)
            shapes.append(shape)
            keep.append(im_f)
        if msgs:
            LOGGER.warning("\n".join(msgs[:10]) + (f"\n... {len(msgs)} total" if len(msgs) > 10 else ""))
        self.im_files = keep
        self.label_files = img2label_paths(keep)
        try:
            np.savez(
                cache_path.with_suffix(""),
                version=CACHE_VERSION,
                hash=key,
                labels=np.array(labels, dtype=object),
                shapes=np.array(shapes, dtype=np.float64),
                im_files=np.array(keep),
            )
        except OSError as e:
            LOGGER.warning(f"cache not saved to {cache_path}: {e}")
        return labels, np.array(shapes, dtype=np.float64)

    def __len__(self):
        return len(self.im_files)

    def load_image(self, i):
        """Load + pre-resize so the long side is imgsz (reference dataloaders.py:736-754),
        honoring the RAM/disk image cache (dataloaders.py:572-608)."""
        if self.ims[i] is not None:  # RAM cache
            hw0, hw = self.im_meta[i]
            return self.ims[i], hw0, hw
        if self.cache_mode == "disk":
            npy = Path(self.im_files[i]).with_suffix(".npy")
            if npy.exists():
                im = np.load(str(npy))
                h0w0 = tuple(int(v) for v in self.shapes[i][::-1])  # shapes is (w, h)
                return im, h0w0, im.shape[:2]
        return self._read_resize(i)

    def __getitem__(self, index):
        """Returns (img HWC BGR uint8, labels (n,5) cls+xywhn, shapes_meta)."""
        hyp = self.hyp
        if self.mosaic and random.random() < hyp.get("mosaic", 1.0):
            img, labels = self._get_mosaic(index)
            shapes_meta = None
            if random.random() < hyp.get("mixup", 0.0):
                img2, labels2 = self._get_mosaic(random.randint(0, len(self) - 1))
                img, labels = mixup(img, labels, img2, labels2)
        else:
            img, (h0, w0), (h, w) = self.load_image(index)
            shape = self.batch_shapes[self.batch_index[index]] if self.rect else (self.imgsz, self.imgsz)
            img, ratio, pad = letterbox(img, tuple(shape), auto=False, scaleup=self.augment)
            shapes_meta = (h0, w0), ((h / h0, w / w0), pad)
            labels = self.labels[index].copy()
            if labels.size:
                labels[:, 1:] = xywhn2xyxy(labels[:, 1:], ratio[0] * w, ratio[1] * h, pad[0], pad[1])
            if self.augment:
                from yolov3_tpu.data.augment import random_perspective

                img, labels = random_perspective(
                    img,
                    labels,
                    degrees=hyp.get("degrees", 0.0),
                    translate=hyp.get("translate", 0.1),
                    scale=hyp.get("scale", 0.5),
                    shear=hyp.get("shear", 0.0),
                    perspective=hyp.get("perspective", 0.0),
                )

        nl = len(labels)
        if nl:
            labels[:, 1:5] = xyxy2xywhn(labels[:, 1:5], w=img.shape[1], h=img.shape[0], clip=True, eps=1e-3)

        if self.augment:
            if self.albumentations is not None:  # reference dataloaders.py:700
                img, labels = self.albumentations(img, labels)
                nl = len(labels)
            augment_hsv(img, hyp.get("hsv_h", 0.015), hyp.get("hsv_s", 0.7), hyp.get("hsv_v", 0.4))
            if random.random() < hyp.get("flipud", 0.0):
                img = np.flipud(img)
                if nl:
                    labels[:, 2] = 1 - labels[:, 2]
            if random.random() < hyp.get("fliplr", 0.5):
                img = np.fliplr(img)
                if nl:
                    labels[:, 1] = 1 - labels[:, 1]
            if hyp.get("cutout", 0.0) > 0:  # reference ships cutout default-off (augmentations.py:243)
                from yolov3_tpu.data.augment import cutout

                img = np.ascontiguousarray(img)
                labels = cutout(img, labels, p=hyp["cutout"])
                nl = len(labels)

        img = np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB, still HWC uint8
        return img, labels.astype(np.float32), shapes_meta

    def _get_mosaic(self, index):
        # O(1) draws — .tolist() would materialize the full index list (118k
        # entries for COCO) on every mosaic sample in the hot augment path
        idxs = [index] + [int(self.indices[random.randrange(len(self.indices))]) for _ in range(3)]
        random.shuffle(idxs)
        images, lbls, segs = [], [], []
        for i in idxs:
            im, _, _ = self.load_image(i)
            images.append(im)
            lbls.append(self.labels[i])
            segs.append([])
        return mosaic4(images, lbls, segs, self.imgsz, self.mosaic_border, self.hyp)


def label_bucket(n, max_labels, floor=32):
    """Smallest power-of-two bucket >= n (floored at `floor`, capped at
    max_labels). Bucketing the label dim per batch keeps the loss's candidate
    tensor (5*na*B*M slots) sized to the data instead of the worst case —
    at bs128 the M=300 pad is ~9x the slots a typical COCO batch needs — while
    the handful of distinct buckets keeps XLA recompiles bounded, the same
    static-shape discipline as multi-scale's 5 size buckets (train/loop.py)."""
    if n >= max_labels:
        return max_labels
    m = floor
    while m < n:
        m *= 2
    return min(m, max_labels)


def collate_fixed(samples, max_labels=300, bucket=False, floor=32):
    """Stack samples into fixed-shape arrays: (B,H,W,3) u8, (B,M,5) f32, (B,M) bool.

    With bucket=True, M is the smallest power-of-two bucket covering this
    batch's real max label count (instead of always max_labels) — padding
    semantics are unchanged, only the amount of masked-out padding shrinks.
    """
    imgs = np.stack([s[0] for s in samples])
    B = len(samples)
    M = label_bucket(max(len(s[1]) for s in samples), max_labels, floor) if bucket else max_labels
    targets = np.zeros((B, M, 5), np.float32)
    mask = np.zeros((B, M), bool)
    for b, s in enumerate(samples):
        lb = s[1][:M]
        targets[b, : len(lb)] = lb
        mask[b, : len(lb)] = True
    shapes = [s[2] for s in samples]
    return imgs, targets, mask, shapes


def collate_quad(samples, max_labels=300, bucket=False, floor=32):
    """Quad collate (reference collate_fn4, dataloaders.py:832-858): combine
    groups of 4 samples into one 2x-resolution image (stitched 2x2) with
    merged labels — trains large-image batches at 1/4 the batch count."""
    assert len(samples) % 4 == 0, "quad collate needs a batch divisible by 4"
    s = samples[0][0].shape[0]
    out = []
    for g in range(len(samples) // 4):
        quad = samples[g * 4 : (g + 1) * 4]
        im = np.zeros((2 * s, 2 * s, 3), np.uint8)
        lbs = []
        for j, (img, lb, _) in enumerate(quad):
            y0, x0 = (j // 2) * s, (j % 2) * s
            im[y0 : y0 + s, x0 : x0 + s] = img
            if len(lb):
                lb = lb.copy()
                lb[:, 1] = (lb[:, 1] + (j % 2)) / 2
                lb[:, 2] = (lb[:, 2] + (j // 2)) / 2
                lb[:, 3:5] /= 2
                lbs.append(lb)
        lbs = np.concatenate(lbs, 0) if lbs else np.zeros((0, 5), np.float32)
        out.append((im, lbs.astype(np.float32), quad[0][2]))
    return collate_fixed(out, max_labels, bucket=bucket, floor=floor)


class DataLoader:
    """Minimal iterable loader with background prefetch (the reference's
    InfiniteDataLoader/_RepeatSampler, dataloaders.py:132-170, exists to reuse
    torch worker processes — a non-problem here since decoding runs in plain
    threads that release the GIL inside cv2)."""

    def __init__(self, dataset, batch_size=16, shuffle=False, max_labels=300, seed=0, drop_last=False,
                 prefetch=2, quad=False, workers=1, label_buckets=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.max_labels = max_labels
        # pad the label dim to a per-batch power-of-two bucket instead of
        # max_labels. NOT safe under multi-process training: every process
        # must feed the global jit identical shapes, and bucket choice is
        # per-host-local (train/loop.py enables this only at process_count==1)
        self.label_buckets = label_buckets
        self._label_hwm = 32  # monotone bucket floor (see __iter__)
        self.rng = np.random.default_rng(seed)
        self.drop_last = drop_last or quad  # quad needs groups of 4
        self.prefetch = prefetch
        self.quad = quad  # reference --quad -> collate_fn4 (train.py, dataloaders.py:126)
        self.workers = max(int(workers), 1)
        if quad:
            assert batch_size % 4 == 0, "--quad requires batch size divisible by 4"

    def __len__(self):
        n = len(self.dataset)
        nb = n // self.batch_size if self.drop_last else math.ceil(n / self.batch_size)
        i0, nh = getattr(self, "_host_shard", (0, 1))
        # sharded: every host reports the COMMON count (see _batches) — each
        # global SPMD step consumes one batch per host, so per-host length IS
        # the number of train steps this host will take
        return nb // nh if nh > 1 else nb

    def set_indices(self, indices):
        """Override the sampling order for the next epoch (image-weights
        resampling, reference train.py:360-363)."""
        self._indices_override = np.asarray(indices)

    def set_multi_scale(self, sizes, seed=0, period=10):
        """Per-batch multi-scale resize done INSIDE the loader workers.

        The reference resizes on the hot loop (train.py:394-399); doing it
        here overlaps the cv2 resizes with device compute via the prefetch
        queue and needs no device fetch to pick the size. A new size is drawn
        from `sizes` every `period` batches; the trainer sets `ms_offset` to
        the epoch's first global step (a host-side counter) so draws are
        deterministic across resume. Labels are normalized xywhn — a square
        resize leaves them unchanged."""
        self._ms_sizes = [int(s) for s in sizes]
        self._ms_seed = int(seed)
        self._ms_period = max(int(period), 1)
        self.ms_offset = 0

    def _ms_for(self, nb):
        sizes = getattr(self, "_ms_sizes", None)
        if not sizes:
            return None
        step = int(getattr(self, "ms_offset", 0)) + nb
        g = np.random.default_rng(self._ms_seed + step - step % self._ms_period)
        return int(g.choice(sizes))

    def _get_sample(self, i, ms):
        sample = self.dataset[i]
        if ms is None or (sample[0].shape[0] == ms and sample[0].shape[1] == ms):
            return sample
        import cv2

        img = cv2.resize(sample[0], (ms, ms), interpolation=cv2.INTER_LINEAR)
        return (img, *sample[1:])

    def shard_per_host(self):
        """Restrict sampling to this host's shard — the DistributedSampler
        analog for multi-host SPMD (reference dataloaders.py:115). Sharding is
        at BATCH granularity, round-robin over hosts: a contiguous sample
        shard of an aspect-ratio-sorted rect dataset would give each host a
        biased shape distribution; round-robin batches keep rect batch-shape
        groups intact AND balanced, and compose with index overrides."""
        import jax

        self._host_shard = (jax.process_index(), jax.process_count())
        return self

    def _batches(self):
        idx = getattr(self, "_indices_override", None)
        if idx is None:
            idx = np.arange(len(self.dataset))
            if self.shuffle and not getattr(self.dataset, "rect", False):
                self.rng.shuffle(idx)
        else:
            idx = np.asarray(idx)
            self._indices_override = None
        n_batches = len(idx) // self.batch_size if self.drop_last else math.ceil(len(idx) / self.batch_size)
        i0, nh = getattr(self, "_host_shard", (0, 1))
        if nh > 1:
            # truncate to the COMMON per-host count: every step_fn call is one
            # global SPMD execution needing all hosts, so a host with one
            # extra batch would block forever in its last step's collective
            n_batches = (n_batches // nh) * nh
        for b in range(i0, n_batches, nh):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def __iter__(self):
        import queue

        q = queue.Queue(maxsize=self.prefetch)
        stop = object()
        base = collate_quad if self.quad else collate_fixed
        if self.label_buckets:
            # high-water-mark floor: once a wider bucket is seen, stay there —
            # each NEW width is an XLA recompile of the train step (minutes
            # through a remote-compile runtime), so widths grow monotonically
            # (<= 4 compiles ever: 32->64->128->256/max) and settle fast
            def collate(samples, max_labels):
                out = base(samples, max_labels, bucket=True, floor=self._label_hwm)
                self._label_hwm = max(self._label_hwm, out[1].shape[1])
                return out
        else:
            collate = base

        def produce():
            try:
                if self.workers > 1:
                    # decode/augment samples on a thread pool (cv2 releases the
                    # GIL) — the reference's num_workers analog (dataloaders.py:114)
                    from concurrent.futures import ThreadPoolExecutor

                    # one cv2-internal thread per worker: without this each cv2
                    # op fans out over every core, oversubscribing N workers ×
                    # T cv2 threads (reference clamps globally, general.py:74)
                    try:
                        import cv2

                        cv2.setNumThreads(0)
                    except ImportError:
                        pass

                    with ThreadPoolExecutor(self.workers) as pool:
                        pending = []
                        for nb, batch_idx in enumerate(self._batches()):
                            ms = self._ms_for(nb)
                            pending.append([pool.submit(self._get_sample, i, ms) for i in batch_idx])
                            # keep `prefetch` batches in flight beyond the queue
                            while len(pending) > self.prefetch:
                                futs = pending.pop(0)
                                q.put(collate([f.result() for f in futs], self.max_labels))
                        for futs in pending:
                            q.put(collate([f.result() for f in futs], self.max_labels))
                else:
                    for nb, batch_idx in enumerate(self._batches()):
                        ms = self._ms_for(nb)
                        samples = [self._get_sample(i, ms) for i in batch_idx]
                        q.put(collate(samples, self.max_labels))
            except BaseException as e:  # noqa: BLE001 — forward to the consumer:
                # a dead producer must fail the epoch loudly, not truncate it
                q.put(e)
            finally:
                q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
