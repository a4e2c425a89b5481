"""Validation CLI — reference val.py:565-629 counterpart.

Usage:
    python -m yolov3_tpu.cli.val --weights runs/train/exp/weights/best \
        --data coco128.yaml --imgsz 640
Tasks: val/test (mAP), speed (conf .25 / iou .45 benchmark),
study (mAP-vs-imgsz sweep 256..1536 saved to study_*.txt).
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

from yolov3_tpu.utils.general import LOGGER, check_yaml, increment_path, print_args


def load_weights(weights):
    from yolov3_tpu.models.loading import load_weights as _load

    return _load(weights)


def run(
    data,
    weights="yolov3-tiny",
    batch_size=32,
    imgsz=640,
    conf_thres=0.001,
    iou_thres=0.6,
    max_det=300,
    task="val",
    single_cls=False,
    augment=False,
    verbose=False,
    save_json=False,
    save_txt=False,
    save_conf=False,
    save_hybrid=False,
    half=False,
    workers=1,
    project="runs/val",
    name="exp",
    exist_ok=False,
    sharded=False,
):
    from yolov3_tpu.eval import validator  # deferred: backend init must follow --device

    if isinstance(weights, (list, tuple)) and len(weights) == 1:
        weights = weights[0]
    if isinstance(weights, (list, tuple)):  # concat-NMS ensemble (reference experimental.py:74-124)
        from yolov3_tpu.models.ensemble import attempt_load

        model = attempt_load(list(weights))
    else:
        model = load_weights(weights)
    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok, mkdir=True)

    if task in ("val", "test", "train", "speed"):
        if task == "speed":  # speed-task settings (reference val.py:605-609)
            conf_thres, iou_thres, save_json = 0.25, 0.45, False
        results, maps, speeds = validator.run(
            data, model=model, batch_size=batch_size, imgsz=imgsz, conf_thres=conf_thres,
            iou_thres=iou_thres, max_det=max_det, task="val" if task == "speed" else task,
            single_cls=single_cls, augment=augment, verbose=verbose, save_json=save_json,
            save_txt=save_txt, save_conf=save_conf, save_hybrid=save_hybrid, half=half,
            workers=workers, save_dir=save_dir, sharded=sharded,
            plots=(task != "speed"),  # standalone val plots by default (reference val.py:192)
        )
        return results, maps, speeds

    if task == "study":  # mAP vs latency sweep (reference val.py:611-622)
        f = save_dir / f"study_{Path(str(data)).stem}_{Path(str(weights)).stem}.txt"
        x, y = list(range(256, 1536 + 128, 128)), []
        for sz in x:
            LOGGER.info(f"Running study imgsz={sz}...")
            t0 = time.time()
            r, _, spd = validator.run(data, model=model, batch_size=batch_size, imgsz=sz, task="val",
                                      save_dir=save_dir)
            y.append(list(r[:4]) + list(spd) + [time.time() - t0])
        np.savetxt(f, y, fmt="%10.4g")
        LOGGER.info(f"Study results saved to {f}")
        return None
    raise ValueError(f"unknown task {task}")


def parse_opt():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data", type=str, default="coco128.yaml")
    parser.add_argument("--weights", type=str, nargs="+", default="yolov3-tiny",
                        help="checkpoint(s); several -> concat-NMS ensemble")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--imgsz", "--img", "--img-size", type=int, default=640)
    parser.add_argument("--conf-thres", type=float, default=0.001)
    parser.add_argument("--iou-thres", type=float, default=0.6)
    parser.add_argument("--max-det", type=int, default=300)
    parser.add_argument("--task", default="val")
    parser.add_argument("--single-cls", action="store_true")
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--verbose", action="store_true")
    parser.add_argument("--save-json", action="store_true")
    parser.add_argument("--save-txt", action="store_true", help="save predictions to save_dir/labels/*.txt")
    parser.add_argument("--save-conf", action="store_true", help="append confidences to --save-txt rows")
    parser.add_argument("--save-hybrid", action="store_true",
                        help="inject ground-truth boxes into NMS (hybrid autolabelling)")
    parser.add_argument("--half", action="store_true", help="bf16 inference (reference --half fp16 analog)")
    parser.add_argument("--sharded", action="store_true",
                        help="data-parallel validation over all local devices (GSPMD batch sharding; "
                             "beyond the reference's single-GPU val.py)")
    parser.add_argument("--workers", type=int, default=1, help="dataloader decode threads")
    parser.add_argument("--device", default="", help="JAX platform, e.g. cpu or tpu (default: auto)")
    parser.add_argument("--project", default="runs/val")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--exist-ok", action="store_true")
    opt = parser.parse_args()
    opt.data = check_yaml(opt.data)
    print_args(vars(opt))
    return opt


def main(opt=None):
    opt = opt or parse_opt()
    from yolov3_tpu.utils.general import enable_compilation_cache, select_device

    select_device(vars(opt).pop("device", None))
    enable_compilation_cache()
    run(**vars(opt))


if __name__ == "__main__":
    main()
