"""Streaming inference CLI — reference detect.py:67-286 counterpart.

Usage:
    python -m yolov3_tpu.cli.detect --weights runs/train/exp/weights/best \
        --source data/images --imgsz 640 --conf-thres 0.25

Source router: int/webcam, screen, image/video file, dir, glob, URL,
*.streams. The forward+decode+NMS run as one jitted TPU program per input
shape bucket.
"""

from __future__ import annotations

import argparse
import os
import platform
from pathlib import Path

import cv2
import numpy as np

from yolov3_tpu.data.loaders import VID_FORMATS, LoadImages, LoadScreenshots, LoadStreams
from yolov3_tpu.data.datasets import IMG_FORMATS
from yolov3_tpu.ops.boxes import scale_boxes, xyxy2xywh
from yolov3_tpu.ops.nms import batched_nms
from yolov3_tpu.utils.general import LOGGER, Profile, check_img_size, increment_path, print_args
from yolov3_tpu.utils.plots import Annotator, colors, save_one_box


def run(
    weights="yolov3-tiny",
    source="data/images",
    data=None,
    imgsz=(640, 640),
    conf_thres=0.25,
    iou_thres=0.45,
    max_det=1000,
    view_img=False,
    save_txt=False,
    save_conf=False,
    save_crop=False,
    nosave=False,
    classes=None,
    agnostic_nms=False,
    augment=False,
    visualize=False,
    project="runs/detect",
    name="exp",
    exist_ok=False,
    line_thickness=3,
    hide_labels=False,
    hide_conf=False,
    vid_stride=1,
    update=False,
    half=None,
):
    """Run inference over a source; returns the save_dir."""
    import jax

    from yolov3_tpu.models.detect_head import decode_predictions
    from yolov3_tpu.models.detection import DetectionModel

    source = str(source)
    save_img = not nosave and not source.endswith(".txt")
    is_file = Path(source).suffix[1:].lower() in (IMG_FORMATS + VID_FORMATS)
    is_url = source.lower().startswith(("rtsp://", "rtmp://", "http://", "https://"))
    webcam = source.isnumeric() or source.endswith(".streams") or (is_url and not is_file)
    screenshot = source.lower().startswith("screen")

    save_dir = increment_path(Path(project) / name, exist_ok=exist_ok)
    (save_dir / "labels" if save_txt else save_dir).mkdir(parents=True, exist_ok=True)

    # model — exported artifacts route through MultiBackend (reference
    # detect.py:166 runs every DetectMultiBackend format)
    import jax.numpy as jnp

    from yolov3_tpu.models.backend import MultiBackend

    if isinstance(weights, (list, tuple)) and len(weights) == 1:
        weights = weights[0]
    if isinstance(weights, (list, tuple)):  # concat-NMS ensemble (reference experimental.py:74-124)
        from yolov3_tpu.models.ensemble import attempt_load

        assert not augment, "--augment with an ensemble is not supported in detect"
        ens = attempt_load(list(weights))
        model = ens
        stride = int(ens.stride)
        names = ens.names
        imgsz = check_img_size(list(imgsz) if not isinstance(imgsz, int) else [imgsz] * 2, s=stride)

        def infer(_variables, imgs_u8):
            pred = ens(np.asarray(imgs_u8))
            return batched_nms(
                jnp.asarray(pred), conf_thres=conf_thres, iou_thres=iou_thres,
                classes=tuple(classes) if classes else None, agnostic=agnostic_nms,
                max_det=max_det, max_nms=8192,
            )

        def visualize_features(imgs_u8, save_to):
            raise NotImplementedError("--visualize requires a single native checkpoint/config model")

        fmt = "ensemble"
    else:
        fmt = MultiBackend._sniff(Path(str(weights)))
    if fmt == "ensemble":
        pass
    elif fmt in ("stablehlo", "savedmodel", "tflite"):
        assert not augment, "--augment (TTA) is not supported for exported artifacts"
        backend = MultiBackend(weights, imgsz=imgsz[0] if not isinstance(imgsz, int) else imgsz)
        model = backend  # for .variables access below (None)
        stride = int(backend.stride)
        names = backend.names
        imgsz = check_img_size(list(imgsz) if not isinstance(imgsz, int) else [imgsz] * 2, s=stride)

        def infer(_variables, imgs_u8):
            pred = backend(np.asarray(imgs_u8))
            return batched_nms(
                jnp.asarray(pred), conf_thres=conf_thres, iou_thres=iou_thres,
                classes=tuple(classes) if classes else None, agnostic=agnostic_nms,
                max_det=max_det, max_nms=8192,
            )

        def visualize_features(imgs_u8, save_to):
            raise NotImplementedError("--visualize requires a native checkpoint/config model")
    else:
        if Path(str(weights)).exists() and (Path(str(weights)) / "checkpoint.yaml").exists():
            from yolov3_tpu.utils.checkpoint import load_model_from_checkpoint

            model = load_model_from_checkpoint(weights)
        else:
            model = DetectionModel.from_config(str(weights), imgsz=64)
        from yolov3_tpu.models.detection import optimize_for_inference

        # half=None -> bf16 on accelerators, f32 on CPU; --half forces bf16
        # (reference --half fp16, detect.py:80)
        model = optimize_for_inference(model, bf16=half)
        stride = int(model.stride)
        names = model.names
        imgsz = check_img_size(list(imgsz) if not isinstance(imgsz, int) else [imgsz] * 2, s=stride)

        module, anchors, strides = model.module, model.anchors_px, model.spec.strides

        @jax.jit
        def infer(variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            if augment:  # TTA (reference detect.py:196 -> yolo.py:239-280)
                from yolov3_tpu.models.detection import predict_augmented_pure

                pred = predict_augmented_pure(
                    module, variables, x, anchors, strides, model.spec.nl, stride
                )
            else:
                feats = module.apply(variables, x, train=False)
                pred = decode_predictions(feats, anchors, strides)
            return batched_nms(
                pred,
                conf_thres=conf_thres,
                iou_thres=iou_thres,
                classes=tuple(classes) if classes else None,
                agnostic=agnostic_nms,
                max_det=max_det,
                max_nms=8192,
            )

        def visualize_features(imgs_u8, save_to):
            """--visualize: save per-layer feature-map grids (reference plots.py:30-57)."""
            from yolov3_tpu.utils.plots import feature_visualization

            x = jnp.asarray(imgs_u8).astype(jnp.float32) / 255.0
            _, inter = module.apply(
                model.variables, x, train=False, capture_intermediates=lambda mdl, name: name == "__call__"
            )
            save_to.mkdir(parents=True, exist_ok=True)
            for lname, v in inter["intermediates"].items():
                out = v["__call__"][0]
                fmap = out[0] if isinstance(out, (tuple, list)) else out
                if hasattr(fmap, "ndim") and fmap.ndim == 4:  # NHWC feature map
                    feature_visualization(np.asarray(fmap), lname, lname, save_dir=save_to)

    # source
    if webcam:
        dataset = LoadStreams(source, img_size=imgsz[0], stride=stride, auto=False, vid_stride=vid_stride)
        bs = len(dataset)
    elif screenshot:
        dataset = LoadScreenshots(source, img_size=imgsz[0], stride=stride, auto=False)
        bs = 1
    else:
        dataset = LoadImages(source, img_size=imgsz[0], stride=stride, auto=False, vid_stride=vid_stride)
        bs = 1
    vid_path, vid_writer = [None] * bs, [None] * bs

    seen, dt = 0, (Profile(), Profile(), Profile())
    for path, im, im0s, vid_cap, s in dataset:
        with dt[0]:
            if im.ndim == 3:
                im = im[None]
        with dt[1]:
            variables = getattr(model, "variables", None)
            dets, n_valid = infer(variables, jax.device_put(im) if variables is not None else im)
            dets = np.asarray(dets)
            n_valid = np.asarray(n_valid)
        if visualize:
            visualize_features(im, save_dir / Path(path[0] if webcam else path).stem)

        for i in range(im.shape[0]):
            seen += 1
            if webcam:
                p, im0 = path[i], im0s[i].copy()
                s_i = f"{s}{i}: "
            else:
                p, im0 = path, im0s.copy()
                s_i = s
            p = Path(p)
            save_path = str(save_dir / p.name)
            txt_path = str(save_dir / "labels" / p.stem) + (
                "" if dataset.mode == "image" else f"_{getattr(dataset, 'frame', 0)}"
            )
            det = dets[i, : n_valid[i]].copy()
            s_i += "{:g}x{:g} ".format(*im.shape[1:3])
            annotator = Annotator(np.ascontiguousarray(im0), line_width=line_thickness)
            if len(det):
                with dt[2]:  # postprocess: boxes back to native resolution
                    det[:, :4] = np.asarray(scale_boxes(im.shape[1:3], det[:, :4], im0.shape[:2])).round()
                for c in np.unique(det[:, 5]):
                    n = int((det[:, 5] == c).sum())
                    s_i += f"{n} {names.get(int(c), int(c))}{'s' * (n > 1)}, "
                for *xyxy, conf, cls in reversed(det.tolist()):
                    c = int(cls)
                    if save_txt:
                        gn = np.array([im0.shape[1], im0.shape[0], im0.shape[1], im0.shape[0]])
                        xywh = (xyxy2xywh(np.array(xyxy).reshape(1, 4)) / gn).reshape(-1).tolist()
                        line = (c, *xywh, conf) if save_conf else (c, *xywh)
                        with open(f"{txt_path}.txt", "a") as f:
                            f.write(("%g " * len(line)).rstrip() % line + "\n")
                    if save_img or save_crop or view_img:
                        label = None if hide_labels else (names.get(c, c) if hide_conf else f"{names.get(c, c)} {conf:.2f}")
                        annotator.box_label(xyxy, label, color=colors(c, True))
                    if save_crop:
                        save_one_box(xyxy, im0, file=save_dir / "crops" / str(names.get(c, c)) / f"{p.stem}.jpg")

            im0 = annotator.result()
            if view_img and (platform.system() != "Linux" or os.environ.get("DISPLAY")):
                cv2.imshow(str(p), im0)
                cv2.waitKey(1)
            if save_img:
                if dataset.mode == "image":
                    cv2.imwrite(save_path, im0)
                else:  # video/stream writer (reference detect.py:252-272)
                    if vid_path[i] != save_path:
                        vid_path[i] = save_path
                        if isinstance(vid_writer[i], cv2.VideoWriter):
                            vid_writer[i].release()
                        if vid_cap:
                            fps = vid_cap.get(cv2.CAP_PROP_FPS)
                            wv = int(vid_cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                            hv = int(vid_cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                        else:
                            fps, wv, hv = 30, im0.shape[1], im0.shape[0]
                        save_path = str(Path(save_path).with_suffix(".mp4"))
                        vid_writer[i] = cv2.VideoWriter(save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (wv, hv))
                    vid_writer[i].write(im0)

            LOGGER.info(f"{s_i}{'' if len(det) else '(no detections), '}{dt[1].dt * 1e3:.1f}ms")

    if update:
        # strip the optimizer from the checkpoint after a successful run
        # (reference detect.py:283-286 strip_optimizer --update)
        wp = Path(str(weights))
        if wp.is_dir() and (wp / "checkpoint.yaml").exists():
            from yolov3_tpu.utils.checkpoint import strip_checkpoint

            strip_checkpoint(wp)

    t = tuple(x.t / max(seen, 1) * 1e3 for x in dt)
    LOGGER.info(f"Speed: %.1fms pre, %.1fms inference+NMS, %.1fms post per image" % t)
    if save_txt or save_img:
        LOGGER.info(f"Results saved to {save_dir}")
    return save_dir


def parse_opt():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, nargs="+", default="yolov3-tiny",
                        help="checkpoint dir(s) or model cfg name; several -> concat-NMS ensemble")
    parser.add_argument("--source", type=str, default="data/images", help="file/dir/URL/glob/screen/0(webcam)")
    parser.add_argument("--data", type=str, default=None, help="(optional) dataset.yaml for names")
    parser.add_argument("--imgsz", "--img", "--img-size", nargs="+", type=int, default=[640], help="inference size")
    parser.add_argument("--conf-thres", type=float, default=0.25)
    parser.add_argument("--iou-thres", type=float, default=0.45)
    parser.add_argument("--max-det", type=int, default=1000)
    parser.add_argument("--view-img", action="store_true")
    parser.add_argument("--save-txt", action="store_true")
    parser.add_argument("--save-conf", action="store_true")
    parser.add_argument("--save-crop", action="store_true")
    parser.add_argument("--nosave", action="store_true")
    parser.add_argument("--classes", nargs="+", type=int)
    parser.add_argument("--agnostic-nms", action="store_true")
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--visualize", action="store_true")
    parser.add_argument("--project", default="runs/detect")
    parser.add_argument("--name", default="exp")
    parser.add_argument("--exist-ok", action="store_true")
    parser.add_argument("--line-thickness", default=3, type=int)
    parser.add_argument("--hide-labels", default=False, action="store_true")
    parser.add_argument("--hide-conf", default=False, action="store_true")
    parser.add_argument("--vid-stride", type=int, default=1)
    parser.add_argument("--update", action="store_true", help="strip optimizer from checkpoint after run")
    parser.add_argument("--half", action="store_true", default=None,
                        help="force bf16 inference (default: bf16 on accelerators, f32 on CPU)")
    parser.add_argument("--device", default="", help="JAX platform, e.g. cpu or tpu (default: auto)")
    opt = parser.parse_args()
    opt.imgsz = opt.imgsz * 2 if len(opt.imgsz) == 1 else opt.imgsz
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
