"""MultiBackend: uniform inference over every format this framework produces.

Counterpart of the reference's DetectMultiBackend (reference
models/common.py:432-768, 12 torch-world formats). The TPU-native format
table:

| suffix / shape            | backend                         |
|---------------------------|---------------------------------|
| checkpoint dir            | native flax graph               |
| reference *.pt            | torch-weight conversion         |
| *.stablehlo               | jax.export deserialized callable|
| *_savedmodel dir          | TF SavedModel (tensorflow)      |
| *.tflite                  | LiteRT interpreter              |
| *.onnx                    | in-tree numpy executor (models/onnx_runtime.py) |
| config name (yolov3-tiny) | random-init native              |

`MultiBackend(weights)(imgs_u8)` always returns the decoded (B, N, 5+nc)
prediction array, whatever the artifact; metadata (stride/names) comes from
the .meta.json sidecar the exporter writes (reference embeds per-format
metadata the same way, export.py:744).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from yolov3_tpu.utils.general import LOGGER


class MultiBackend:
    """Format-sniffing model loader with a uniform __call__."""

    def __init__(self, weights="yolov3-tiny", imgsz=640):
        w = Path(str(weights))
        self.format = self._sniff(w)
        self.stride = 32
        self.names = {i: str(i) for i in range(80)}
        self.imgsz = imgsz
        LOGGER.info(f"MultiBackend: loading {w} as {self.format}")

        meta_file = (w.with_suffix(".meta.json") if w.suffix else w.parent / (w.name + ".meta.json"))
        if meta_file and meta_file.is_file():
            meta = json.loads(meta_file.read_text())
            self.stride = int(meta.get("stride", 32))
            self.names = {int(k): v for k, v in meta.get("names", {}).items()}
            self.imgsz = meta.get("imgsz", imgsz)
        elif self.format in ("stablehlo", "savedmodel", "tflite", "onnx"):
            # exported artifacts carry no intrinsic class map — silently
            # inventing numeric names corrupts downstream labels (r1 weak #10)
            raise FileNotFoundError(
                f"missing metadata sidecar {meta_file} for {self.format} artifact {w}; "
                "re-export with yolov3_tpu.export (it writes the sidecar) or create it "
                'manually: {"stride": 32, "names": {"0": "person", ...}}'
            )

        if self.format in ("checkpoint", "config", "torch_pt"):
            from yolov3_tpu.cli.val import load_weights
            from yolov3_tpu.models.detect_head import decode_predictions
            from yolov3_tpu.models.detection import optimize_for_inference

            import jax
            import jax.numpy as jnp

            model = optimize_for_inference(load_weights(str(weights)))
            self.model = model
            self.stride = int(model.stride)
            self.names = model.names

            @jax.jit
            def fwd(variables, imgs_u8):
                x = imgs_u8.astype(jnp.float32) / 255.0
                feats = model.module.apply(variables, x, train=False)
                return decode_predictions(feats, model.anchors_px, model.spec.strides)

            self._call = lambda im: np.asarray(fwd(model.variables, im))
        elif self.format == "stablehlo":
            import jax
            from jax import export as jexport

            exported = jexport.deserialize(w.read_bytes())
            call = jax.jit(exported.call)
            self._call = lambda im: np.asarray(call(im))
        elif self.format == "savedmodel":
            import tensorflow as tf

            m = tf.saved_model.load(str(w))
            self._call = lambda im: m.serve(im).numpy()
        elif self.format == "tflite":
            try:
                from ai_edge_litert.interpreter import Interpreter
            except ImportError:
                import tensorflow as tf

                Interpreter = tf.lite.Interpreter

            self.interp = Interpreter(model_path=str(w))
            self.interp.allocate_tensors()
            inp = self.interp.get_input_details()[0]
            out = self.interp.get_output_details()[0]

            def run_tflite(im):
                nonlocal inp, out
                if list(im.shape) != list(inp["shape"]):  # dynamic-batch artifact
                    self.interp.resize_tensor_input(inp["index"], im.shape)
                    self.interp.allocate_tensors()
                    inp = self.interp.get_input_details()[0]
                    out = self.interp.get_output_details()[0]
                self.interp.set_tensor(inp["index"], im)
                self.interp.invoke()
                return self.interp.get_tensor(out["index"])

            self._call = run_tflite
        elif self.format == "onnx":
            # ONNX contract (reference export.py:196-264): f32 NCHW, /255 done
            # by the consumer — this adapter keeps MultiBackend's uniform
            # uint8-NHWC __call__ (the reference's fp16/NHWC juggling,
            # common.py:647-727, collapses to this one transpose+scale)
            from yolov3_tpu.models.onnx_runtime import OnnxModel

            rt = OnnxModel(str(w))
            self._call = lambda im: rt(
                np.transpose(np.asarray(im), (0, 3, 1, 2)).astype(np.float32) / 255.0
            )
        else:
            raise ValueError(f"unsupported weights format: {weights}")

    @staticmethod
    def _sniff(w: Path):
        s = str(w)
        if w.is_dir() and (w / "checkpoint.yaml").exists():
            return "checkpoint"
        if w.is_dir() and s.endswith("_savedmodel"):
            return "savedmodel"
        if w.suffix == ".pt":
            return "torch_pt"
        if w.suffix == ".stablehlo":
            return "stablehlo"
        if w.suffix == ".tflite":
            return "tflite"
        if w.suffix == ".onnx":
            return "onnx"
        return "config"

    def __call__(self, imgs_u8):
        """imgs_u8: (B, H, W, 3) uint8 -> decoded (B, N, 5+nc) predictions."""
        return self._call(imgs_u8)

    def warmup(self, shape=(1, 640, 640, 3)):
        self._call(np.zeros(shape, np.uint8))
        return self
