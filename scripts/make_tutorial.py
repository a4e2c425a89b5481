"""Generate tutorial.ipynb — the reference tutorial.ipynb analog for yolov3_tpu.

Mirrors the reference notebook's walkthrough structure (setup -> detect ->
validate -> train -> visualize -> environments -> status -> appendix,
reference tutorial.ipynb) with this framework's CLIs and TPU specifics, plus
an export/serve section the reference lacks. Regenerate with:
    python scripts/make_tutorial.py
"""

import json
from pathlib import Path


def md(src):
    return {"cell_type": "markdown", "metadata": {}, "source": src.splitlines(keepends=True)}


def code(src):
    return {
        "cell_type": "code",
        "execution_count": None,
        "metadata": {},
        "outputs": [],
        "source": src.splitlines(keepends=True),
    }


CELLS = [
    md(
        """<div align="center">

# yolov3_tpu Tutorial

**TPU-native YOLOv3 object detection** — JAX/XLA/Pallas, from scratch.

This notebook walks the full workflow: detect → validate → train → visualize
→ export → serve. It is the analog of the reference `tutorial.ipynb`
(ultralytics/yolov3) for this framework.
</div>"""
    ),
    md(
        """# Setup

Clone the repository and verify the JAX runtime sees your accelerator. On a
Cloud TPU VM, `jax.devices()` lists the local chips; on Colab-TPU select the
TPU runtime first. Everything below also runs on CPU (slower) — the code is
identical, only the `jax` platform changes."""
    ),
    code(
        """!git clone https://github.com/your-org/yolov3_tpu  # clone
%cd yolov3_tpu

from yolov3_tpu.utils.env import notebook_init

display = notebook_init()  # prints python/jax versions, devices, RAM/disk"""
    ),
    md(
        """# 1. Detect

`yolov3_tpu.cli.detect` runs inference on a variety of sources and saves
results to `runs/detect`. Example sources:

```shell
python -m yolov3_tpu.cli.detect --source 0             # webcam
                                         img.jpg       # image
                                         vid.mp4       # video
                                         screen        # screenshot
                                         path/         # directory
                                         'path/*.jpg'  # glob
                                         'rtsp://...'  # RTSP/RTMP/HTTP stream
```

`--weights` accepts a model name (`yolov3`, `yolov3-spp`, `yolov3-tiny` —
random init), an orbax checkpoint directory, a reference torch `.pt` file
(auto-downloaded from the ultralytics/yolov3 release if missing, converted on
load), or any exported artifact (StableHLO / SavedModel / TFLite / ONNX) —
the backend is auto-detected (`DetectMultiBackend` analog)."""
    ),
    code(
        """!python -m yolov3_tpu.cli.detect --weights yolov3-tiny.pt --imgsz 640 --conf-thres 0.25 --source yolov3_tpu/data/images
# display.Image(filename='runs/detect/exp/sample1.jpg', width=600)"""
    ),
    md(
        """# 2. Validate

Validate accuracy on a dataset's val split (COCO-style 101-point mAP at
IoU 0.50:0.95). `--half` selects bf16 compute on TPU (the fp16 analog —
same mantissa budget, wider exponent, no GradScaler needed). Use `--verbose`
for per-class results and `--sharded` to shard validation over all local
chips (the reference validates on rank 0 only)."""
    ),
    code(
        """# Validate yolov3-tiny on COCO128 (downloads via the dataset YAML recipe)
!python -m yolov3_tpu.cli.val --weights yolov3-tiny.pt --data coco128.yaml --imgsz 640 --half"""
    ),
    md(
        """# 3. Train

Train on [COCO128](https://www.kaggle.com/datasets/ultralytics/coco128) with
`--data coco128.yaml` (auto-downloaded from the YAML's recipe). Key points on
TPU:

- **One compiled step**: forward, loss, backward, optimizer schedules and EMA
  are a single XLA program; static batch shapes mean the hot loop never
  recompiles.
- **All local chips are used automatically** (SPMD data parallelism over a
  `jax.sharding.Mesh`; gradient all-reduce rides ICI). Multi-host: run the
  same command per host with `--dist-init`.
- `--cache ram` keeps decoded images in RAM (COCO128 fits easily).
- Results save to `runs/train/exp`, `runs/train/exp2`, ..."""
    ),
    code(
        """#@title Select logger {run: 'auto'}
logger = 'TensorBoard'  #@param ['Comet', 'ClearML', 'TensorBoard']

if logger == 'Comet':
    %pip install -q comet_ml
    import comet_ml; comet_ml.init()
elif logger == 'ClearML':
    %pip install -q clearml
    import clearml; clearml.browser_login()
elif logger == 'TensorBoard':
    %load_ext tensorboard
    %tensorboard --logdir runs/train"""
    ),
    code(
        """# Train yolov3-tiny on COCO128 for 3 epochs
!python -m yolov3_tpu.cli.train --imgsz 640 --batch-size 16 --epochs 3 --data coco128.yaml --cfg yolov3-tiny --weights yolov3-tiny.pt --cache ram"""
    ),
    md(
        """## Datasets

Nine dataset YAMLs ship in `yolov3_tpu/data/`: COCO, COCO128, VOC, plus
Argoverse, GlobalWheat2020, Objects365, SKU-110K, VisDrone and xView. Each
YAML's `download:` recipe is either a shell script or a named in-tree
converter (`converter://<name>` → `yolov3_tpu/data/converters.py`) that
downloads the archives and converts the native annotations to YOLO labels —
this framework never executes code embedded in data files. For your own
data, point `train:`/`val:` at image dirs with YOLO-format `labels/`
alongside."""
    ),
    code(
        """# e.g. train on VisDrone — the converter:// recipe downloads + converts on first use
!python -m yolov3_tpu.cli.train --imgsz 640 --batch-size 16 --epochs 3 --data VisDrone.yaml --cfg yolov3-tiny --weights yolov3-tiny.pt"""
    ),
    md("""# 4. Visualize"""),
    md(
        """## Comet logging

[Comet](https://www.comet.com/) is integrated: metrics, hyperparameters,
checkpoints, and per-image prediction visualizations stream live. Enable with
`pip install comet_ml` + `export COMET_API_KEY=...` — training picks it up
automatically. Resume a run from its model registry with
`--resume comet://<workspace>/<project>/<experiment>`."""
    ),
    md(
        """## ClearML logging and automation

[ClearML](https://clear.ml/) tracks experiments, dataset versions, and debug
samples; `pip install clearml` + `clearml-init` enables it. Train directly on
a ClearML dataset version with `--data clearml://<dataset_id>`, and sweep
hyperparameters over a finished task (Optuna when installed, random search
otherwise) with:

```python
from yolov3_tpu.utils.loggers.clearml_hpo import run_clearml_hpo
run_clearml_hpo(base_task_id='<template task id>')
```"""
    ),
    md(
        """## Local logging

Training always logs CSV (`results.csv`) and TensorBoard scalars to
`runs/train/exp*`, plus label statistics plots, train mosaics, val
predictions, PR/F1 curves, and the confusion matrix. View with
`%tensorboard --logdir runs/train` (cell above) or open the PNGs directly."""
    ),
    md(
        """# 5. Export & serve

Export trained weights to deployment formats; every format round-trips
through the same `detect`/`val` CLIs via the backend router:

- **StableHLO** — PJRT-portable compiled artifact (TPU/GPU/CPU)
- **SavedModel / TFLite** — TF serving stacks; `--int8` applies
  post-training quantization calibrated on your dataset
- **ONNX** — hand-encoded native emitter, no onnx package required"""
    ),
    code(
        """!python -m yolov3_tpu.export --weights runs/train/exp/weights/best --include stablehlo onnx
# Validate the exported artifact end-to-end (backend auto-detected):
!python -m yolov3_tpu.cli.val --weights runs/train/exp/weights/best.stablehlo --data coco128.yaml
# Format benchmark matrix (speed + mAP per export format):
!python -m yolov3_tpu.cli.benchmarks --weights yolov3-tiny --data coco128.yaml"""
    ),
    code(
        """# HTTP serving with dynamic micro-batching (Triton dynamic-batching analog):
# concurrent requests coalesce into one batched TPU call on the fused fast path.
!python -m yolov3_tpu.serve --weights runs/train/exp/weights/best --port 8507 --max-batch 8 --batch-wait-ms 5 &
# then: curl -F "image=@yolov3_tpu/data/images/sample1.jpg" localhost:8507/predict"""
    ),
    md(
        """# Environments

Verified environments:

- **Cloud TPU VM** (v4/v5e/v5p/v6e) — `pip install -e .` on the VM; all local
  chips are used automatically
- **Colab / Kaggle TPU runtimes** — this notebook as-is
- **CPU** — identical code path (XLA:CPU); set
  `JAX_PLATFORMS=cpu` to force it; an 8-virtual-device CPU mesh
  (`--xla_force_host_platform_device_count=8`) exercises the full SPMD path
  without hardware
- **GPU** — JAX's CUDA backend runs the same programs (the Pallas NMS kernel
  falls back to the XLA implementation)"""
    ),
    md(
        """# Status

The test suite (`python -m pytest tests/ -q`) gates every feature: model
parity vs the torch reference (param counts, 24-step training-trajectory
equality, val-grade mAP gap < 0.005 on independent ground truth), NMS
goldens vs torchvision semantics, export round-trips, multi-process
distributed init, and an end-to-end learns-to-detect training gate."""
    ),
    md("""# Appendix

Additional content below."""),
    code(
        """# Python-API inference (AutoShape: accepts paths/URLs/PIL/numpy/lists)
import yolov3_tpu.hub as hub

model = hub.load('yolov3_tiny')  # or yolov3, yolov3_spp, custom('path/to/weights')
im = 'yolov3_tpu/data/images/sample1.jpg'
results = model(im)
results.print()  # or .show(), .save(), .crop(), .pandas(), etc."""
    ),
]

nb = {
    "cells": CELLS,
    "metadata": {
        "kernelspec": {"display_name": "Python 3", "language": "python", "name": "python3"},
        "language_info": {"name": "python", "version": "3.11"},
        "accelerator": "TPU",
    },
    "nbformat": 4,
    "nbformat_minor": 5,
}

out = Path(__file__).resolve().parent.parent / "tutorial.ipynb"
out.write_text(json.dumps(nb, indent=1) + "\n")
print(f"wrote {out} ({len(CELLS)} cells)")
