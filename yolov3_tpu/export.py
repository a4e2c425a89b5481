"""Model export — TPU-native serving formats.

Counterpart of reference export.py (TorchScript/ONNX/OpenVINO/TensorRT/CoreML/
TF/Paddle, export.py:164-653), re-based on the JAX serving stack:

| format          | produces                  | runtime                    |
|-----------------|---------------------------|----------------------------|
| checkpoint      | orbax dir (native)        | yolov3_tpu                 |
| stablehlo       | serialized StableHLO      | any PJRT plugin (TPU/GPU/CPU), IREE |
| savedmodel      | TF SavedModel (jax2tf)    | TF Serving                 |
| tflite          | .tflite (via jax2tf)      | LiteRT / edge              |
| onnx            | .onnx                     | onnxruntime                |

StableHLO is the first-class path: it is what jit produces anyway, needs no
extra dependencies, and is the portable deployment artifact for XLA runtimes.
TF-family and ONNX exports are gated on their (optional) packages, mirroring
the reference's per-format optional imports. Each exporter embeds
{stride, names, imgsz} metadata like the reference (export.py:744).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from yolov3_tpu.utils.general import LOGGER, colorstr, file_size

EXPORT_FORMATS = ("checkpoint", "stablehlo", "savedmodel", "tflite", "onnx")


def try_export(fn):
    """Decorator: time + log + catch per-format failures (reference export.py:138-161)."""

    def wrapper(*args, **kwargs):
        prefix = colorstr(f"{fn.__name__.replace('export_', '')}:")
        t = time.time()
        try:
            out = fn(*args, **kwargs)
            LOGGER.info(f"{prefix} export success, {time.time() - t:.1f}s, saved as {out} ({file_size(out):.1f} MB)")
            return out
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"{prefix} export failure {time.time() - t:.1f}s: {e}")
            return None

    return wrapper


def _make_serving_fn(model, include_nms=False, conf_thres=0.25, iou_thres=0.45, max_det=300):
    """Pure serving function: uint8 NHWC -> decoded (or NMS'd) detections."""
    import jax.numpy as jnp

    from yolov3_tpu.models.detect_head import decode_predictions
    from yolov3_tpu.ops.nms import batched_nms

    module, anchors, strides = model.module, model.anchors_px, model.spec.strides
    variables = model.variables

    def serve(imgs_u8):
        x = imgs_u8.astype(jnp.float32) / 255.0
        feats = module.apply(variables, x, train=False)
        pred = decode_predictions(feats, anchors, strides)
        if include_nms:
            return batched_nms(pred, conf_thres=conf_thres, iou_thres=iou_thres, max_det=max_det, max_nms=8192)
        return pred

    return serve


def _write_metadata(path, model, imgsz):
    meta = {"stride": int(model.stride), "names": {int(k): v for k, v in model.names.items()}, "imgsz": imgsz}
    Path(path).with_suffix(".meta.json").write_text(json.dumps(meta))


@try_export
def export_checkpoint(model, file, imgsz=640):
    """Native orbax checkpoint (inference-only)."""
    from yolov3_tpu.utils.checkpoint import save_checkpoint

    out = Path(file).with_suffix("") if Path(file).suffix else Path(file)
    save_checkpoint(
        out,
        {"params": model.variables["params"], "batch_stats": model.variables.get("batch_stats", {})},
        spec=model.spec,
        # `fused` must round-trip: a BN-folded tree loaded into an unfused
        # graph is missing every bn param (export --half fuses the model)
        meta={"names": {int(k): v for k, v in model.names.items()}, "stripped": True,
              "fused": bool(model.fused)},
    )
    return out


@try_export
def export_stablehlo(model, file, imgsz=640, batch=1, include_nms=False, dynamic=False):
    """Serialized StableHLO artifact via jax.export — runs on any PJRT backend.

    dynamic=True exports with a symbolic batch dimension (shape polymorphism —
    the XLA-native analog of the reference's ONNX/TF dynamic axes,
    export.py:798 --dynamic): one artifact serves any batch size.
    """
    import jax
    from jax import export as jexport

    serve = _make_serving_fn(model, include_nms=include_nms)
    if dynamic:
        (bdim,) = jexport.symbolic_shape("b")
        spec = jax.ShapeDtypeStruct((bdim, imgsz, imgsz, 3), np.uint8)
    else:
        spec = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), np.uint8)
    try:
        # multi-platform lowering: the artifact must load on any PJRT plugin
        # (a default export is pinned to the exporting host's platform)
        exported = jexport.export(jax.jit(serve), platforms=("cpu", "tpu", "cuda"))(spec)
    except Exception as e:  # noqa: BLE001 — an op without cross-platform lowering
        LOGGER.warning(f"multi-platform stablehlo export failed ({e}); exporting for this platform only")
        exported = jexport.export(jax.jit(serve))(spec)
    out = Path(file).with_suffix(".stablehlo")
    out.write_bytes(exported.serialize())
    _write_metadata(out, model, imgsz)
    return out


@try_export
def export_savedmodel(model, file, imgsz=640, batch=1, include_nms=False, dynamic=False):
    """TF SavedModel via jax2tf (requires tensorflow); dynamic=True exports a
    polymorphic batch dimension (reference --dynamic analog)."""
    import tensorflow as tf
    from jax.experimental import jax2tf

    serve = _make_serving_fn(model, include_nms=include_nms)
    poly = [f"(b, {imgsz}, {imgsz}, 3)"] if dynamic else None
    tf_fn = tf.function(
        jax2tf.convert(serve, with_gradient=False, polymorphic_shapes=poly),
        input_signature=[tf.TensorSpec((None if dynamic else batch, imgsz, imgsz, 3), tf.uint8)],
        autograph=False,
    )
    out = str(Path(file).with_suffix("")) + "_savedmodel"
    module = tf.Module()
    module.serve = tf_fn
    tf.saved_model.save(module, out)
    _write_metadata(Path(out), model, imgsz)
    return out


def _calibration_batches(imgsz, batch, data=None, n=32, stride=32):
    """Yield uint8 NHWC calibration batches for post-training quantization.

    With a dataset YAML, letterboxes real val images (the reference calibrates
    its OpenVINO INT8 export on the dataset the same way, export.py:295-339);
    without one, falls back to random uint8 (calibration quality warning logged).
    """
    import cv2

    imgs = []
    if data is not None:
        from yolov3_tpu.data.augment import letterbox
        from yolov3_tpu.data.dataset_yaml import check_dataset
        from yolov3_tpu.data.datasets import list_images

        d = check_dataset(data)
        files = list_images(d.get("val") or d["train"])[: n * batch]
        for f in files:
            im = cv2.imread(str(f))
            if im is None:
                continue
            im = letterbox(im, imgsz, stride=stride, auto=False)[0]
            imgs.append(im[:, :, ::-1])  # BGR -> RGB
    if not imgs:
        if data is not None:
            LOGGER.warning("int8 calibration: no readable images found; using random data")
        else:
            LOGGER.warning("int8 calibration on random data — pass a dataset YAML for representative ranges")
        rng = np.random.default_rng(0)
        imgs = [rng.integers(0, 255, (imgsz, imgsz, 3), dtype=np.uint8) for _ in range(n * batch)]
    for i in range(0, max(len(imgs) - batch + 1, 1), batch):
        chunk = imgs[i : i + batch]
        while len(chunk) < batch:
            chunk.append(chunk[-1])
        yield np.ascontiguousarray(np.stack(chunk).astype(np.uint8))


@try_export
def export_tflite(model, file, imgsz=640, batch=1, include_nms=False, int8=False, data=None):
    """TFLite flatbuffer via the SavedModel path (requires tensorflow).

    int8=True applies post-training quantization calibrated on `data`
    (reference export.py:667,798 exposes the same --int8/--data surface for its
    OpenVINO/CoreML quantized exports); ops without int8 kernels fall back to
    float, so the artifact always converts.
    """
    import tensorflow as tf

    sm = export_savedmodel(model, file, imgsz, batch, include_nms)
    assert sm is not None, "savedmodel export failed"
    converter = tf.lite.TFLiteConverter.from_saved_model(str(sm))
    converter.target_spec.supported_ops = [tf.lite.OpsSet.TFLITE_BUILTINS, tf.lite.OpsSet.SELECT_TF_OPS]
    suffix = ".tflite"
    if int8:
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.representative_dataset = lambda: (
            [b] for b in _calibration_batches(imgsz, batch, data, stride=int(model.stride))
        )
        suffix = "-int8.tflite"
    out = Path(file).with_suffix("")
    out = out.parent / (out.name + suffix)
    out.write_bytes(converter.convert())
    _write_metadata(out, model, imgsz)
    return out


@try_export
def export_onnx(model, file, imgsz=640, batch=1, include_nms=False, dynamic=False):
    """ONNX via the native emitter (models/onnx_native.py): the graph + full
    Detect decode is encoded straight from the ModelSpec and fused weights —
    no tensorflow/tf2onnx needed, parity-tested elementwise against the JAX
    forward (tests/test_onnx_native.py). The reference's ONNX contract
    (export.py:196-264): input "images" f32 (N,3,H,W), output (N, M, nc+5),
    optional dynamic batch. NMS stays outside the artifact (like the
    reference's default onnx leg)."""
    if include_nms:
        raise NotImplementedError(
            "the native onnx leg emits the decode only (NMS runs in the "
            "consumer, like the reference's default onnx export); for an "
            "NMS-in-graph artifact use the tf2onnx leg (export_onnx_tf), "
            "which carries include_nms through the SavedModel"
        )
    from yolov3_tpu.models.onnx_native import export_onnx_bytes

    out = Path(file).with_suffix(".onnx")
    out.write_bytes(export_onnx_bytes(model, imgsz=imgsz, batch=batch, dynamic=dynamic))
    _write_metadata(out, model, imgsz)
    return out


@try_export
def export_onnx_tf(model, file, imgsz=640, batch=1, include_nms=False):
    """Alternative ONNX leg via tf2onnx on the SavedModel (requires
    tensorflow + tf2onnx; kept for graphs the native emitter doesn't cover)."""
    import tf2onnx  # noqa: F401

    sm = export_savedmodel(model, file, imgsz, batch, include_nms)
    assert sm is not None, "savedmodel export failed"
    out = Path(file).with_suffix(".onnx")
    import subprocess
    import sys

    subprocess.run(
        [sys.executable, "-m", "tf2onnx.convert", "--saved-model", str(sm), "--output", str(out)],
        check=True,
    )
    _write_metadata(out, model, imgsz)
    return out


def run(weights="yolov3-tiny", include=("checkpoint", "stablehlo"), imgsz=640, batch=1, nms=False,
        out_dir="runs/export", int8=False, data=None, half=False, dynamic=False):
    """Export a model to the requested formats; returns {format: path|None}."""
    from yolov3_tpu.cli.val import load_weights

    model = load_weights(weights)
    if half:  # fused bf16 artifact (reference exports fused fp16 with --half, export.py:719)
        from yolov3_tpu.models.detection import optimize_for_inference

        model = optimize_for_inference(model, bf16=True)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    base = out_dir / model.spec.name
    results = {}
    for fmt in include:
        assert fmt in EXPORT_FORMATS, f"unknown export format {fmt}; choose from {EXPORT_FORMATS}"
        fn = {
            "checkpoint": lambda: export_checkpoint(model, base, imgsz),
            "stablehlo": lambda: export_stablehlo(model, base, imgsz, batch, nms, dynamic),
            "savedmodel": lambda: export_savedmodel(model, base, imgsz, batch, nms, dynamic),
            "tflite": lambda: export_tflite(model, base, imgsz, batch, nms, int8, data),
            "onnx": lambda: export_onnx(model, base, imgsz, batch, nms, dynamic),
        }[fmt]
        results[fmt] = fn()
    return results


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--weights", default="yolov3-tiny")
    p.add_argument("--include", nargs="+", default=["checkpoint", "stablehlo"])
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--nms", action="store_true", help="embed NMS in the exported graph")
    p.add_argument("--out-dir", default="runs/export")
    p.add_argument("--int8", action="store_true", help="TFLite INT8 post-training quantization")
    p.add_argument("--data", default=None, help="dataset YAML for int8 calibration images")
    p.add_argument("--half", action="store_true", help="export fused bf16 weights")
    p.add_argument("--dynamic", action="store_true",
                   help="symbolic batch dimension (stablehlo/savedmodel shape polymorphism)")
    p.add_argument("--device", default="", help="JAX platform, e.g. cpu or tpu (default: auto)")
    a = p.parse_args()
    from yolov3_tpu.utils.general import select_device

    select_device(a.device)
    run(a.weights, a.include, a.imgsz, a.batch, a.nms, a.out_dir, a.int8, a.data, a.half, a.dynamic)


if __name__ == "__main__":
    main()
