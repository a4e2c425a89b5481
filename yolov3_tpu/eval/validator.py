"""Validation engine: mAP evaluation of a DetectionModel over a dataset.

Counterpart of the reference val.py:192-489 with TPU-shaped execution:
the forward runs as one jitted program per (batch, height, width) bucket
(rect batches produce a bounded set of shapes), decode+NMS run fixed-shape
on device, and the matching/AP math runs on host numpy exactly like the
reference (process_batch at 10 IoUs 0.5:0.95, val.py:313; ap_per_class
101-pt COCO integration).

Defaults are the mAP-defining settings: conf 0.001, iou 0.6, max_det 300,
multi-label NMS, rect pad 0.5 (reference val.py:196-199, 325).
"""

from __future__ import annotations

import functools
import json
from pathlib import Path

import jax
import numpy as np

from yolov3_tpu.data.datasets import DataLoader, DetectionDataset
from yolov3_tpu.data.dataset_yaml import check_dataset
from yolov3_tpu.eval.metrics import ConfusionMatrix, ap_per_class, process_batch
from yolov3_tpu.models.detect_head import decode_predictions
from yolov3_tpu.ops.boxes import scale_boxes, xywh2xyxy
from yolov3_tpu.ops.nms import batched_nms
from yolov3_tpu.train.loss import compute_loss
from yolov3_tpu.utils.general import LOGGER, Profile, coco80_to_coco91_class


def run(
    data,
    model=None,
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
    save_dir=Path("."),
    dataloader=None,
    loss_cfg=None,
    compute_loss_flag=False,
    rect=True,
    max_nms=30000,
    plots=False,
    names=None,
    save_txt=False,
    save_conf=False,
    save_hybrid=False,
    workers=1,
    half=False,
    sharded=False,
    callbacks=None,
):
    """Evaluate `model` (a DetectionModel handle OR a MultiBackend wrapping any
    exported artifact — stablehlo/savedmodel/tflite, reference val.py:293 runs
    every DetectMultiBackend format) on `data` (dataset yaml/dict or DataLoader).

    save_txt/save_conf: per-image prediction txt in save_dir/labels (reference
    val.py:94-103 save_one_txt). save_hybrid: inject ground-truth boxes as
    perfect-confidence NMS candidates (autolabelling, reference val.py:374,
    general.py:689-695) — NMS then runs host-side on decoded predictions.
    half: bf16 inference (the reference's --half fp16 analog, val.py:196).

    Returns ((mp, mr, map50, map, *losses), per_class_maps, speeds_ms).
    """
    assert model is not None, "validator requires a DetectionModel or MultiBackend"
    is_native = hasattr(model, "module")
    if half and is_native:
        from yolov3_tpu.models.detection import optimize_for_inference

        model = optimize_for_inference(model, bf16=True)
    stride = int(model.stride)

    if not is_native:
        rect = False  # exported artifacts are fixed-shape: square letterbox only
    data_dict = data if isinstance(data, dict) else None
    if dataloader is None:
        data_dict = check_dataset(data)
        names = names or data_dict["names"]
        split = data_dict.get(task) or data_dict["val"]
        dataset = DetectionDataset(
            split,
            imgsz=imgsz,
            augment=False,
            rect=rect,
            stride=stride,
            pad=0.5 if rect else 0.0,
            batch_size=batch_size,
            num_cls=model.spec.nc if is_native else len(model.names),
            single_cls=single_cls,
        )
        dataloader = DataLoader(dataset, batch_size=batch_size, shuffle=False, workers=workers)
    names = names or model.names
    nc = 1 if single_cls else (model.spec.nc if is_native else len(model.names))

    iouv = np.linspace(0.5, 0.95, 10)
    niou = iouv.shape[0]

    if task == "speed":  # benchmark settings (reference val.py:605-609)
        conf_thres, save_json = 0.25, False
    nms_iou = 0.45 if task == "speed" else iou_thres
    with_loss = bool(compute_loss_flag and loss_cfg is not None and is_native and not save_hybrid)
    mesh = None
    if sharded and is_native and jax.device_count() > 1:
        from jax.sharding import Mesh

        from yolov3_tpu.parallel.mesh import create_mesh

        # in-train val passes the TRAINING mesh (possibly a device subset when
        # the batch doesn't divide the device count — loop.py) so the jitted
        # forward sees the same device set the EMA params are committed to
        mesh = sharded if isinstance(sharded, Mesh) else create_mesh()
        if any(d.process_index != jax.process_index() for d in mesh.devices.flat):
            # the val dataloader is host-local (process 0 only in multi-host
            # training); feeding host-local numpy into a cross-host sharding
            # would reject/hang — validate unsharded on this host instead
            LOGGER.warning("sharded val: mesh spans multiple hosts — falling back to local validation")
            mesh = None
    if is_native:
        forward = _cached_forward(
            model, conf_thres, nms_iou, max_det, max_nms,
            loss_cfg=loss_cfg if with_loss else None, augment=augment, decode_only=save_hybrid,
            mesh=mesh,
        )
        if mesh is not None:
            ndev = mesh.devices.size

            def forward(variables, imgs_u8, *rest, _s=[forward, None]):
                # partial tail batches (B % ndev != 0) run the unsharded
                # program — exact, one extra (cached) compile at most
                if imgs_u8.shape[0] % ndev == 0:
                    return _s[0](variables, imgs_u8, *rest)
                if _s[1] is None:
                    _s[1] = _cached_forward(
                        model, conf_thres, nms_iou, max_det, max_nms,
                        loss_cfg=loss_cfg if with_loss else None, augment=augment,
                        decode_only=save_hybrid,
                    )
                return _s[1](variables, imgs_u8, *rest)
    else:  # MultiBackend: decoded predictions from the artifact, NMS here

        def forward(_vars, imgs_u8):
            pred = model(np.asarray(imgs_u8))
            if save_hybrid:
                return pred
            return batched_nms(
                jax.numpy.asarray(pred), conf_thres=conf_thres, iou_thres=nms_iou,
                multi_label=True, max_det=max_det, max_nms=max_nms,
            )

    stats = []
    loss_sum = np.zeros(3)
    n_batches = 0
    batch_i = 0
    confusion = ConfusionMatrix(nc=nc) if plots else None
    jdict = []
    # COCO80->91 category remap applies only to the real COCO dataset
    # (reference val.py:311,344) — a custom dataset's class ids pass through
    # unmapped (remapping them would corrupt ids and overflow at nc > 80)
    _val_split = (data_dict or {}).get("val")
    is_coco = isinstance(_val_split, str) and _val_split.replace("\\", "/").endswith("coco/val2017.txt")
    class_map = coco80_to_coco91_class() if is_coco else list(range(1000))
    dt = (Profile(), Profile(), Profile())
    seen = 0

    variables = getattr(model, "variables", None)
    for imgs, targets, mask, shapes in dataloader:
        with dt[0]:
            # sharded: keep the batch as host numpy — jit's in_shardings
            # places it per-device; a device_put here would commit it to
            # device 0 and conflict with the GSPMD placement
            imgs_dev = jax.device_put(imgs) if (is_native and mesh is None) else imgs
        with dt[1]:
            if save_hybrid:  # apriori label injection -> host NMS (reference val.py:374)
                from yolov3_tpu.ops.nms import non_max_suppression

                hb, wb = imgs.shape[1:3]
                gain = np.array([wb, hb, wb, hb], np.float32)
                lb = [
                    np.concatenate([t[:, 0:1], t[:, 1:5] * gain], 1) if len(t) else np.zeros((0, 5), np.float32)
                    for t in (targets[si][mask[si]] for si in range(imgs.shape[0]))
                ]
                pred_dec = np.asarray(forward(variables, imgs_dev))
                dets_list = non_max_suppression(
                    pred_dec, conf_thres, nms_iou, multi_label=True, labels=lb,
                    max_det=max_det, max_nms=max_nms,
                )
                n_valid = np.array([len(d) for d in dets_list])
                dets = np.zeros((imgs.shape[0], max_det, 6), np.float32)
                for si, d in enumerate(dets_list):
                    dets[si, : len(d)] = d
            elif with_loss:  # loss folded into the same jitted program (no eager re-trace per batch)
                dets, n_valid, comps = forward(variables, imgs_dev, targets, mask)
                dets, n_valid = _fetch_valid(dets, n_valid, max_det)
            else:
                dets, n_valid = forward(variables, imgs_dev)
                dets, n_valid = _fetch_valid(dets, n_valid, max_det)
        if with_loss:
            loss_sum += np.asarray(comps)
            n_batches += 1

        if plots and batch_i < 3:  # label + prediction mosaics (reference val.py:417-419)
            _plot_val_batch(imgs, targets, mask, dets, n_valid, batch_i, Path(save_dir), names)
        batch_i += 1

        with dt[2]:
            h, w = imgs.shape[1:3]
            for si in range(imgs.shape[0]):
                seen += 1
                pred = dets[si, : n_valid[si]].copy()  # (n, 6) xyxy conf cls in letterbox space
                lbls = targets[si][mask[si]]  # (m, 5) cls xywhn
                nl = len(lbls)
                shape_meta = shapes[si]

                # labels -> native-space xyxy
                if nl:
                    tbox = xywh2xyxy(lbls[:, 1:5] * np.array([w, h, w, h], np.float32))
                    if shape_meta is not None:
                        (h0, w0), ratio_pad = shape_meta
                        tbox = scale_boxes((h, w), tbox, (h0, w0), ratio_pad)
                    labelsn = np.concatenate([lbls[:, 0:1], tbox], 1)
                else:
                    labelsn = np.zeros((0, 5), np.float32)

                if len(pred):
                    if single_cls:
                        pred[:, 5] = 0
                    if shape_meta is not None:
                        (h0, w0), ratio_pad = shape_meta
                        pred[:, :4] = np.asarray(scale_boxes((h, w), pred[:, :4], (h0, w0), ratio_pad))
                    correct = process_batch(pred, labelsn, iouv)
                else:
                    correct = np.zeros((0, niou), bool)
                stats.append((correct, pred[:, 4] if len(pred) else np.zeros(0), pred[:, 5] if len(pred) else np.zeros(0), labelsn[:, 0]))
                if confusion is not None:
                    confusion.process_batch(pred, labelsn)
                if callbacks is not None:
                    # per-image hook with native-space predictions + labels
                    # (reference val.py:414 on_val_image_end -> logger depth)
                    callbacks.run("on_val_image_end", predn=pred,
                                  path=dataloader.dataset.im_files[seen - 1],
                                  names=names, labelsn=labelsn)
                if save_txt:  # save_conf only modifies the txt format (reference val.py:410)
                    h0w0 = shape_meta[0] if shape_meta is not None else (h, w)
                    _save_one_txt(pred, Path(save_dir) / "labels",
                                  Path(dataloader.dataset.im_files[seen - 1]).stem, h0w0, save_conf)
                if save_json and len(pred):
                    _append_coco_json(jdict, pred, Path(dataloader.dataset.im_files[seen - 1]), class_map)

    # aggregate (guard the zero-batch and zero-TP paths — they must not crash)
    if stats:
        stats_cat = [np.concatenate([s[i] for s in stats], 0) for i in range(4)]
    else:
        stats_cat = [np.zeros((0, niou), bool), np.zeros(0), np.zeros(0), np.zeros(0)]
    p = r = ap50 = ap_mean = np.zeros(0)
    if len(stats_cat) and stats_cat[0].any():
        tp, fp, p, r, f1, ap, ap_class, curves = ap_per_class(*stats_cat, curves=True)
        ap50, ap_mean = ap[:, 0], ap.mean(1)
        mp, mr, map50, map_ = p.mean(), r.mean(), ap50.mean(), ap_mean.mean()
        if plots:
            from yolov3_tpu.utils.plots import plot_mc_curve, plot_pr_curve

            px, py, p_curve, r_curve, f1_curve = curves
            cls_names = [str(names.get(int(c), c)) for c in ap_class]
            plot_pr_curve(px, py, ap, Path(save_dir) / "PR_curve.png", cls_names)
            plot_mc_curve(px, f1_curve[: len(cls_names)], Path(save_dir) / "F1_curve.png", cls_names, ylabel="F1")
            plot_mc_curve(px, p_curve[: len(cls_names)], Path(save_dir) / "P_curve.png", cls_names, ylabel="Precision")
            plot_mc_curve(px, r_curve[: len(cls_names)], Path(save_dir) / "R_curve.png", cls_names, ylabel="Recall")
    else:
        mp = mr = map50 = map_ = 0.0
        ap_mean = np.zeros(nc)
        ap_class = np.array([], int)
    if plots and confusion is not None:
        # the reference plots the confusion matrix whenever plots=True, even
        # with zero TPs (val.py confusion_matrix.plot is unconditional)
        from yolov3_tpu.utils.plots import plot_confusion_matrix

        cls_names = [str(names.get(i, i)) for i in range(nc)]
        plot_confusion_matrix(confusion.matrix, cls_names, Path(save_dir) / "confusion_matrix.png")

    nt = np.bincount(stats_cat[3].astype(int), minlength=nc) if len(stats_cat[3]) else np.zeros(nc)
    LOGGER.info(f"{'all':>12}{seen:>11}{int(nt.sum()):>11}{mp:>11.3g}{mr:>11.3g}{map50:>11.3g}{map_:>11.3g}")
    if verbose and nc > 1 and len(ap_class):
        for i, c in enumerate(ap_class):
            LOGGER.info(f"{str(names.get(int(c), c)):>12}{seen:>11}{int(nt[c]):>11}{p[i]:>11.3g}{r[i]:>11.3g}{ap50[i]:>11.3g}{ap_mean[i]:>11.3g}")

    speeds = tuple(x.t / max(seen, 1) * 1e3 for x in dt)  # ms per image
    LOGGER.info(f"Speed: {speeds[0]:.1f}ms pre, {speeds[1]:.1f}ms inference+NMS, {speeds[2]:.1f}ms post per image")

    if save_json and jdict:
        pred_json = Path(save_dir) / "predictions.json"
        pred_json.parent.mkdir(parents=True, exist_ok=True)
        with open(pred_json, "w") as f:
            json.dump(jdict, f)
        LOGGER.info(f"COCO JSON saved to {pred_json}")
        try:
            map_, map50 = _coco_eval(pred_json, data)
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"COCO eval not run: {e}")

    losses = tuple(loss_sum / max(n_batches, 1))
    maps = np.zeros(nc) + map_
    for i, c in enumerate(ap_class):
        maps[int(c)] = ap_mean[i]
    return (mp, mr, map50, map_, *losses), maps, speeds


_FORWARD_CACHE = {}


def _plot_val_batch(imgs, targets, mask, dets, n_valid, bi, save_dir, names, conf=0.25, max_boxes=15):
    """val_batch{i}_labels.jpg + val_batch{i}_pred.jpg (reference val.py:417-419)."""
    try:
        from yolov3_tpu.utils.plots import plot_images

        names = {int(k): v for k, v in dict(names).items()} if names else None
        plot_images(imgs, targets, masks=mask, fname=save_dir / f"val_batch{bi}_labels.jpg", names=names)
        h, w = imgs.shape[1:3]
        pt = np.zeros((imgs.shape[0], max_boxes, 5), np.float32)
        pm = np.zeros((imgs.shape[0], max_boxes), bool)
        for si in range(imgs.shape[0]):
            d = dets[si, : n_valid[si]]
            d = d[d[:, 4] > conf][:max_boxes]  # letterbox-space xyxy conf cls
            if len(d):
                pt[si, : len(d), 0] = d[:, 5]
                pt[si, : len(d), 1] = (d[:, 0] + d[:, 2]) / 2 / w
                pt[si, : len(d), 2] = (d[:, 1] + d[:, 3]) / 2 / h
                pt[si, : len(d), 3] = (d[:, 2] - d[:, 0]) / w
                pt[si, : len(d), 4] = (d[:, 3] - d[:, 1]) / h
                pm[si, : len(d)] = True
        plot_images(imgs, pt, masks=pm, fname=save_dir / f"val_batch{bi}_pred.jpg", names=names)
    except Exception as e:  # noqa: BLE001 — plotting must never fail a val run
        from yolov3_tpu.utils.general import LOGGER as _log

        _log.warning(f"val batch plot failed: {e}")


def _save_one_txt(pred, labels_dir, stem, h0w0, save_conf):
    """Write one image's predictions as `cls xc yc w h [conf]` normalized to
    the native image (reference val.py:94-103 save_one_txt)."""
    from yolov3_tpu.ops.boxes import xyxy2xywh

    labels_dir.mkdir(parents=True, exist_ok=True)
    gn = np.array([h0w0[1], h0w0[0], h0w0[1], h0w0[0]], np.float32)
    lines = []
    for row in pred:  # native-space xyxy conf cls
        xywh = np.asarray(xyxy2xywh(row[None, :4]))[0] / gn
        vals = (int(row[5]), *xywh, row[4]) if save_conf else (int(row[5]), *xywh)
        lines.append(" ".join(f"{v:.6g}" for v in vals))
    (labels_dir / f"{stem}.txt").write_text("\n".join(lines) + ("\n" if lines else ""))


def _fetch_valid(dets, n_valid, max_det):
    """n-first device fetch: materialize the counts, then only the valid
    score-sorted prefix dets[:, :n.max()] — every consumer reads
    dets[si, :n_valid[si]], so the max_det tail is zero padding. Through a
    slow D2H link the full (B, max_det, 6) fetch dominated val batch time
    (scripts/fetch_overlap_probe.py: +25 ms/batch at bs128)."""
    n_valid = np.asarray(n_valid)
    return np.asarray(dets[:, : min(int(n_valid.max()), max_det)]), n_valid


def _cached_forward(model, conf_thres, iou_thres, max_det, max_nms, loss_cfg=None, augment=False,
                    decode_only=False, mesh=None):
    """Jitted forward+decode+NMS (+ optional val loss / TTA), cached by
    (module, nms params, loss_cfg, augment, mesh).

    The linen module is a frozen dataclass (spec/dtype/fused), so equal
    architectures share one jitted function — without this, per-epoch
    validation re-traced and re-COMPILED the whole model every epoch
    (minutes per compile through a remote-compile TPU runtime). The in-train
    val loss (reference val.py:367-368) runs INSIDE the same program: tracing
    compute_loss eagerly per batch on host numpy was both slow and wasteful.

    With `mesh` the whole program is one GSPMD partition over the batch axis
    (replicated params, batch-sharded inputs/detections) — data-parallel
    validation across every local device, a capability the reference's
    single-GPU val.py lacks (its DDP covers training only, train.py:680-683).
    Callers route batches whose size the mesh doesn't divide to the
    unsharded program instead (exactness over GSPMD's implicit padding)."""
    key = (model.module, float(conf_thres), float(iou_thres), int(max_det), int(max_nms), loss_cfg, augment,
           decode_only, mesh)
    fn = _FORWARD_CACHE.get(key)
    if fn is None:
        module = model.module
        anchors = model.anchors_px
        strides = model.spec.strides
        nl, gs = model.spec.nl, int(model.stride)

        def _pred(variables, x):
            if augment:  # TTA val (reference val.py forward w/ augment -> yolo.py:239-280)
                from yolov3_tpu.models.detection import predict_augmented_pure

                return predict_augmented_pure(module, variables, x, anchors, strides, nl, gs)
            feats = module.apply(variables, x, train=False)
            return decode_predictions(feats, anchors, strides)

        if mesh is None:
            fwd_kw = loss_kw = dec_kw = {}
        else:
            from yolov3_tpu.parallel.mesh import batch_sharding, replicated

            data, rep = batch_sharding(mesh), replicated(mesh)
            fwd_kw = {"in_shardings": (rep, data), "out_shardings": (data, data)}
            dec_kw = {"in_shardings": (rep, data), "out_shardings": data}
            loss_kw = {"in_shardings": (rep, data, data, data),
                       "out_shardings": (data, data, rep)}

        # Val-grade NMS runs the Pallas kernel on TPU (gridded over images at
        # max_nms=30000 — see ops/nms_pallas.py grid_batch); row-exactness vs
        # the XLA loop at these settings is pinned by
        # tests/test_nms_pallas.py::test_grid_batch_val_grade_matches_xla.
        # Sharded (GSPMD) val keeps the kernel too: batched_nms shard_maps it
        # over the mesh's data axis (GSPMD cannot partition a pallas_call
        # directly; batch NMS is embarrassingly parallel across images).
        # Pallas does not lower on CPU — that path keeps the XLA loop.
        use_pallas = jax.default_backend() == "tpu"

        @functools.partial(jax.jit, **fwd_kw)
        def forward(variables, imgs_u8):
            x = imgs_u8.astype(jax.numpy.float32) / 255.0
            pred = _pred(variables, x)
            dets, n_valid = batched_nms(
                pred, conf_thres=conf_thres, iou_thres=iou_thres,
                multi_label=True, max_det=max_det, max_nms=max_nms,
                use_pallas=use_pallas, spmd_mesh=mesh,
            )
            return dets, n_valid

        @functools.partial(jax.jit, **dec_kw)
        def forward_decode(variables, imgs_u8):  # save_hybrid: NMS runs on host after label injection
            x = imgs_u8.astype(jax.numpy.float32) / 255.0
            return _pred(variables, x)

        @functools.partial(jax.jit, **loss_kw)
        def forward_with_loss(variables, imgs_u8, targets, tmask):
            x = imgs_u8.astype(jax.numpy.float32) / 255.0
            feats = module.apply(variables, x, train=False)
            pred = decode_predictions(feats, anchors, strides)
            dets, n_valid = batched_nms(
                pred, conf_thres=conf_thres, iou_thres=iou_thres,
                multi_label=True, max_det=max_det, max_nms=max_nms,
                use_pallas=use_pallas, spmd_mesh=mesh,
            )
            _, comps = compute_loss(list(feats), targets, tmask, loss_cfg)
            return dets, n_valid, comps

        if len(_FORWARD_CACHE) > 8:
            _FORWARD_CACHE.clear()
        fn = forward_decode if decode_only else (forward_with_loss if loss_cfg is not None else forward)
        _FORWARD_CACHE[key] = fn
    return fn


def _append_coco_json(jdict, pred, path, class_map):
    """Accumulate COCO-format detections: xywh top-left boxes (reference val.py:106-144)."""
    image_id = int(path.stem) if path.stem.isnumeric() else path.stem
    box = pred[:, :4].copy()
    box[:, 2:] -= box[:, :2]  # xyxy -> xywh
    for p, b in zip(pred.tolist(), box.tolist()):
        jdict.append(
            {
                "image_id": image_id,
                "category_id": class_map[int(p[5])],
                "bbox": [round(x, 3) for x in b],
                "score": round(p[4], 5),
            }
        )


def _coco_eval(pred_json, data):
    """COCO-JSON eval: official pycocotools when importable (reference
    val.py:454-479), otherwise the in-tree pycocotools-semantics evaluator
    (eval/cocoeval.py) — the eval is never silently skipped."""
    data_dict = check_dataset(data) if not isinstance(data, dict) else data
    anno_json = str(Path(data_dict["path"]) / "annotations" / "instances_val2017.json")
    try:
        from pycocotools.coco import COCO
        from pycocotools.cocoeval import COCOeval
    except ImportError:
        from yolov3_tpu.eval.cocoeval import evaluate_coco_json

        LOGGER.info("pycocotools not installed — using the in-tree COCO bbox evaluator")
        return evaluate_coco_json(anno_json, str(pred_json))
    anno = COCO(anno_json)
    pred = anno.loadRes(str(pred_json))
    ev = COCOeval(anno, pred, "bbox")
    ev.evaluate()
    ev.accumulate()
    ev.summarize()
    return ev.stats[0], ev.stats[1]  # mAP50-95, mAP50
