"""Hyperparameter evolution: genetic search over the 29-key hyp space.

Counterpart of reference train.py:689-798: per-key (gain, min, max) meta
table, weighted parent selection from the top-5 of evolve.csv, gaussian
mutation (80% prob, sigma 0.2), fitness = 0.1*mAP50 + 0.9*mAP.
"""

from __future__ import annotations

import random
from pathlib import Path

import numpy as np

from yolov3_tpu.utils.general import LOGGER, yaml_save

# {key: (mutation gain, min, max)} — same bounds contract as the reference
META = {
    "lr0": (1, 1e-5, 1e-1),
    "lrf": (1, 0.01, 1.0),
    "momentum": (0.3, 0.6, 0.98),
    "weight_decay": (1, 0.0, 0.001),
    "warmup_epochs": (1, 0.0, 5.0),
    "warmup_momentum": (1, 0.0, 0.95),
    "warmup_bias_lr": (1, 0.0, 0.2),
    "box": (1, 0.02, 0.2),
    "cls": (1, 0.2, 4.0),
    "cls_pw": (1, 0.5, 2.0),
    "obj": (1, 0.2, 4.0),
    "obj_pw": (1, 0.5, 2.0),
    "iou_t": (0, 0.1, 0.7),
    "anchor_t": (1, 2.0, 8.0),
    "fl_gamma": (0, 0.0, 2.0),
    "hsv_h": (1, 0.0, 0.1),
    "hsv_s": (1, 0.0, 0.9),
    "hsv_v": (1, 0.0, 0.9),
    "degrees": (1, 0.0, 45.0),
    "translate": (1, 0.0, 0.9),
    "scale": (1, 0.0, 0.9),
    "shear": (1, 0.0, 10.0),
    "perspective": (0, 0.0, 0.001),
    "flipud": (1, 0.0, 1.0),
    "fliplr": (0, 0.0, 1.0),
    "mosaic": (1, 0.0, 1.0),
    "mixup": (1, 0.0, 1.0),
    "copy_paste": (1, 0.0, 1.0),
}


def mutate(hyp, evolve_csv: Path, mp=0.8, s=0.2, seed=None):
    """Produce a mutated hyp dict from the top-5 parents in evolve.csv."""
    rng = np.random.default_rng(seed)
    keys = [k for k in META if k in hyp]
    if evolve_csv.exists():
        x = np.loadtxt(evolve_csv, ndmin=2, delimiter=",", skiprows=1)
        n = min(5, len(x))
        x = x[np.argsort(-fitness_col(x))][:n]
        w = fitness_col(x) - fitness_col(x).min() + 1e-6
        method = random.choices(["single", "weighted"], k=1)[0]
        if method == "single" or len(x) == 1:
            parent = x[random.choices(range(n), weights=w)[0]]
        else:
            parent = (x * w.reshape(-1, 1)).sum(0) / w.sum()
        for i, k in enumerate(keys):
            hyp[k] = float(parent[i + 4])

    g = np.array([META[k][0] for k in keys])
    v = np.ones(len(keys))
    while (v == 1).all():
        v = (g * (rng.random(len(keys)) < mp) * rng.normal(0, 1, len(keys)) * rng.random() * s + 1).clip(0.3, 3.0)
    out = dict(hyp)
    for i, k in enumerate(keys):
        lo_gain, lo, hi = META[k]
        out[k] = float(np.clip(float(hyp[k]) * v[i], lo, hi))
        out[k] = round(out[k], 5)
    return out


def fitness_col(x):
    """fitness from evolve.csv rows: columns [P, R, mAP50, mAP, ...]."""
    w = np.array([0.0, 0.0, 0.1, 0.9])
    return (x[:, :4] * w).sum(1)


def log_generation(evolve_csv: Path, hyp, results, keys=None):
    """Append one generation's results + hyps to evolve.csv (print_mutation parity)."""
    keys = keys or [k for k in META if k in hyp]
    header = ["P", "R", "mAP50", "mAP50-95", *keys]
    vals = [*results[:4], *[hyp[k] for k in keys]]
    new = not evolve_csv.exists()
    with open(evolve_csv, "a") as f:
        if new:
            f.write(",".join(header) + "\n")
        f.write(",".join(f"{float(v):.6g}" for v in vals) + "\n")


def evolve(train_fn, base_hyp, generations=300, save_dir=Path("runs/evolve"), seed=0):
    """Run the evolution loop: mutate -> train -> log. `train_fn(hyp) -> results4`."""
    save_dir = Path(save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    evolve_csv = save_dir / "evolve.csv"
    best_fit, best_hyp = -1.0, dict(base_hyp)
    for gen in range(generations):
        hyp = mutate(dict(base_hyp), evolve_csv, seed=seed + gen)
        results = train_fn(hyp)
        log_generation(evolve_csv, hyp, results)
        fit = float(np.array(results[:4]) @ np.array([0.0, 0.0, 0.1, 0.9]))
        if fit > best_fit:
            best_fit, best_hyp = fit, hyp
            yaml_save(save_dir / "hyp_evolve.yaml", hyp)
        LOGGER.info(f"evolve gen {gen + 1}/{generations}: fitness {fit:.4f} (best {best_fit:.4f})")
    try:  # evolution scatter plot (reference train.py:778 -> plots.py:243-267)
        from yolov3_tpu.utils.plots import plot_evolve

        plot_evolve(evolve_csv)
    except Exception as e:  # noqa: BLE001
        LOGGER.warning(f"evolve plot failed: {e}")
    return best_hyp, best_fit
