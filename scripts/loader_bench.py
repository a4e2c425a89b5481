"""Input-pipeline microbench: host-side loader images/s at 640.

Measures the DataLoader (decode + mosaic/augment + static-shape collate)
throughput in isolation, across worker counts and cache modes, against the
device step rate it must feed (VERDICT round-1 #5: the loader must sustain
the chip). Run CPU-only:

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/loader_bench.py
"""

from __future__ import annotations

import argparse
import sys
import tempfile
import time
from pathlib import Path

import cv2
import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def make_dataset(root: Path, n=96, size=640, seed=0):
    (root / "images/train").mkdir(parents=True)
    (root / "labels/train").mkdir(parents=True)
    rng = np.random.default_rng(seed)
    for i in range(n):
        im = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        cv2.imwrite(str(root / "images/train" / f"{i:04d}.jpg"), im)
        lines = [
            f"{int(rng.integers(0, 3))} {rng.uniform(.3,.7):.4f} {rng.uniform(.3,.7):.4f} "
            f"{rng.uniform(.1,.25):.4f} {rng.uniform(.1,.25):.4f}"
            for _ in range(3)
        ]
        (root / "labels/train" / f"{i:04d}.txt").write_text("\n".join(lines))
    return root / "images/train"


def bench(loader, epochs=3):
    n = 0
    # first epoch warms caches; time the rest
    for _batch in loader:
        pass
    t0 = time.perf_counter()
    for _ in range(epochs):
        for imgs, *_rest in loader:
            n += imgs.shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main(imgsz=640, batch=16, n=96):
    from yolov3_tpu.data.datasets import DataLoader, DetectionDataset

    root = Path(tempfile.mkdtemp(prefix="loaderbench_"))
    img_dir = make_dataset(root, n=n, size=imgsz)
    hyp = {
        "mosaic": 1.0, "mixup": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
        "degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0,
        "perspective": 0.0, "fliplr": 0.5, "flipud": 0.0, "copy_paste": 0.0,
    }
    print(f"imgsz={imgsz} batch={batch} n={n}  (1-core VM; scales with cores)")
    for workers, cache in [(1, None), (2, None), (4, None), (2, "ram")]:
        ds = DetectionDataset(str(img_dir), imgsz=imgsz, batch_size=batch,
                              augment=True, hyp=hyp, cache_images=cache)
        dl = DataLoader(ds, batch_size=batch, shuffle=True, workers=workers)
        rate = bench(dl)
        print(f"workers={workers} cache={cache}: {rate:.1f} img/s")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--n", type=int, default=96)
    a = p.parse_args()
    main(a.imgsz, a.batch, a.n)
