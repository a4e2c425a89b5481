"""DetectionModel: static graph executor + user-facing model handle.

The linen `YOLOGraph` walks the parsed `ModelSpec` layer list, honoring
from-indices for skip connections (the reference's BaseModel._forward_once,
models/yolo.py:135-147) — but as a trace-time python loop, so XLA sees one
flat fused graph with no interpreter overhead.

`DetectionModel` is the stateful handle (module + variables) mirroring the
reference's `Model`/`DetectionModel` API (models/yolo.py:190-295): build from
YAML, forward, decoded inference, TTA augmented inference, info. Parameters
live in a plain pytree, so sharding/EMA/checkpointing are trivial.

Note on fuse(): the reference folds Conv+BN for inference speed
(yolo.py:163-172). Under XLA, inference-mode BN is a constant per-channel
affine that the compiler folds into the adjacent conv automatically, so
`fuse_model` exists for API parity and is a no-op on variables.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.models.detect_head import Detect, decode_predictions
from yolov3_tpu.models.spec import ModelSpec, parse_spec
from yolov3_tpu.nn.modules import MODULE_REGISTRY, MULTI_INPUT_OPS
from yolov3_tpu.utils.general import LOGGER


def _fields(cls):
    return {f.name for f in dataclasses.fields(cls)}


class YOLOGraph(nn.Module):
    """Executes a ModelSpec layer graph. Returns the tuple of raw Detect feature maps.

    `fused=True` builds the inference-only graph with BN folded into conv
    weights (see models/fuse.py)."""

    spec: ModelSpec
    dtype: Any = jnp.float32
    fused: bool = False
    head_raw: bool = False  # Detect returns raw NHWC conv outputs (serving fast path)
    head_pad: int = 0  # >0: 128-lane-aligned padded head layout (Detect raw_pad; TPU decode)
    remat: bool = False  # segmented jax.checkpoint: backward recomputes one segment at a time
    remat_segment: int = 6  # layers per checkpoint segment (saved state = segment boundaries)
    remat_until: int = -1  # only remat layers with index < this; -1 = whole body.
    # Selective policy (r4 differential attribution, scripts/train_attr_diff.py):
    # full-body remat makes the backward 3x the forward (2x FLOP-true grad +
    # 1x full recompute). Activation bytes HALVE per stride stage while conv
    # FLOPs concentrate in the deep stages (l6/l8/l10 are ~55% of darknet-53's
    # FLOPs but only ~12 MB/img of bf16 activations vs ~45 MB/img for l0..l5),
    # so saving the deep activations buys back most of the recompute for a
    # fraction of the memory. remat_until=7 keeps bs128@640 in HBM while
    # recomputing only the cheap-to-recompute, expensive-to-store front.
    s2d_stem: bool = False  # space-to-depth stem: never materialize the 32-ch full-res activation

    def _s2d_modes(self):
        """Layer-index -> s2d mode map for the space-to-depth region.

        When layers 0..3 match darknet's [Conv k3s1, Conv k3s2, Bottleneck n1,
        Conv k3s2] prefix (yolov3/yolov3-spp) and none of l0..l2 are routed
        elsewhere, the WHOLE region runs in s2d layout — every activation
        carries >=128 lanes, eliminating the (8,128)-tile channel padding
        that makes the plain stem ~45% of forward time at 8% of FLOPs
        (docs/PERF.md round-3 trace). Otherwise falls back to the stem-pair
        transform (l0 "out", l1 "in")."""
        L = self.spec.layers
        region_ok = (
            len(L) > 4
            and L[0].op == "Conv" and tuple(L[0].args[1:3]) == (3, 1)
            and L[1].op == "Conv" and tuple(L[1].args[1:3]) == (3, 2)
            and L[2].op == "Bottleneck" and L[2].n == 1
            and L[3].op == "Conv" and tuple(L[3].args[1:3]) == (3, 2)
            and not any(i in self.spec.save for i in (0, 1, 2))
        )
        if region_ok:
            return {0: "out", 1: "down", 2: "bottleneck", 3: "in"}
        if 0 in self.spec.save:
            # l0's s2d-layout output must only feed l1's "in" transform — a
            # skip route into a plain-layout consumer would be silently wrong
            raise ValueError("s2d_stem: layer 0 is routed to other layers (in save list)")
        return {0: "out", 1: "in"}

    def _run_layers(self, layers, out, y, prev_i, train):
        """Execute a run of non-Detect layers; returns (out, y, prev_i)."""
        spec = self.spec
        for ls in layers:
            if ls.op in MULTI_INPUT_OPS:
                inp = [out if j == prev_i else y[j] for j in ls.f]
            else:
                inp = out if ls.f[0] == prev_i else y[ls.f[0]]

            cls = MODULE_REGISTRY[ls.op]
            fields = _fields(cls)
            kwargs = {}
            if "dtype" in fields:
                kwargs["dtype"] = self.dtype
            if self.fused and "fused" in fields:
                kwargs["fused"] = True
            if self.s2d_stem and ls.i in self._s2d_modes():
                mode = self._s2d_modes()[ls.i]
                kwargs["s2d" if mode == "bottleneck" else "s2d_mode"] = (
                    True if mode == "bottleneck" else mode)
            if ls.n == 1:
                inp = cls(*ls.args, name=f"l{ls.i}", **kwargs)(inp, train)
            else:  # stacked repeats (reference yolo.py:370)
                for r in range(ls.n):
                    inp = cls(*ls.args, name=f"l{ls.i}_{r}", **kwargs)(inp, train)
            out = inp
            prev_i = ls.i
            if ls.i in spec.save:
                y[ls.i] = out
        return out, y, prev_i

    @nn.compact
    def __call__(self, x, train: bool = False):
        spec = self.spec
        if not spec.activation:
            return self._call_impl(x, train)
        # YAML `activation:` override (reference yolo.py:313): scope the
        # process-wide default to THIS trace — leaking it would contaminate
        # every other model traced afterwards in the same process
        from yolov3_tpu.nn.activations import _DEFAULT_ACT, set_default_activation

        prev = _DEFAULT_ACT[0]
        set_default_activation(spec.activation)
        try:
            return self._call_impl(x, train)
        finally:
            _DEFAULT_ACT[0] = prev

    def _call_impl(self, x, train: bool = False):
        spec = self.spec
        x = x.astype(self.dtype)
        body, detect = spec.layers[:-1], spec.layers[-1]
        assert detect.op == "Detect", "spec must end with a Detect layer"

        y = {}  # saved layer outputs
        out = x
        prev_i = -1
        if not self.remat:
            out, y, prev_i = self._run_layers(body, out, y, prev_i, train)
        else:
            # Segmented rematerialization: checkpoint every `remat_segment`
            # layers, so the backward saves only segment-boundary activations
            # (+ skip-connection saves, which must persist anyway) and
            # recomputes one segment at a time. Per-LAYER checkpointing is
            # useless on a chain — the boundary set IS the activation pyramid;
            # segmenting divides the live set by the segment length.
            # `train` and the segment's layer list stay python-static via
            # closure, keeping BN's train/eval branch out of the trace.
            n = max(int(self.remat_segment), 1)
            cut = len(body) if self.remat_until < 0 else min(self.remat_until, len(body))
            front, rest = body[:cut], body[cut:]
            for s in range(0, len(front), n):
                seg = front[s : s + n]
                seg_prev = prev_i

                def seg_fn(mdl, out, y, _seg=seg, _prev=seg_prev):
                    o, yy, _ = mdl._run_layers(_seg, out, y, _prev, train)
                    return o, yy

                out, y = nn.remat(seg_fn, prevent_cse=False)(self, out, y)
                prev_i = seg[-1].i
            if rest:  # deep layers run plain: activations saved, no recompute
                out, y, prev_i = self._run_layers(rest, out, y, prev_i, train)

        feats = [out if j == prev_i else y[j] for j in detect.f]
        return Detect(
            nc=spec.nc, na=spec.na, strides=spec.strides, dtype=self.dtype,
            raw=self.head_raw, raw_pad=self.head_pad, name=f"l{detect.i}"
        )(feats, train)


class DetectionModel:
    """Model handle: (spec, linen module, variables) with torch-free ergonomics."""

    def __init__(self, spec: ModelSpec, variables, dtype=jnp.float32, names=None, fused=False,
                 s2d_stem=False):
        if s2d_stem and not s2d_eligible(spec):
            # fail at construction with a clear message — an ineligible stem
            # (e.g. tiny's maxpool) would otherwise TypeError deep in tracing
            raise ValueError(f"s2d_stem needs a [Conv k3 s1, Conv k3 s2] stem; "
                             f"{spec.name} is not eligible")
        self.spec = spec
        self.fused = fused
        self.s2d_stem = s2d_stem
        self.module = YOLOGraph(spec=spec, dtype=dtype, fused=fused, s2d_stem=s2d_stem)
        self.variables = variables
        self.dtype = dtype
        self.names = names or {i: str(i) for i in range(spec.nc)}
        self.stride = max(spec.strides)

    # -- construction -----------------------------------------------------
    @classmethod
    def from_config(cls, cfg="yolov3-tiny", ch=3, nc=None, anchors=None, key=None, dtype=jnp.float32,
                    imgsz=256, s2d_stem=False):
        """Build with random init from a YAML config / name / dict (reference yolo.py:193-231)."""
        spec = parse_spec(cfg, ch=ch, nc=nc, anchors=anchors)
        if s2d_stem and not s2d_eligible(spec):
            l0, l1 = spec.layers[0], spec.layers[1]
            raise ValueError(f"s2d_stem needs a [Conv k3 s1, Conv k3 s2] stem; {spec.name} has "
                             f"[{l0.op}{l0.args}, {l1.op}{l1.args}]")
        module = YOLOGraph(spec=spec, dtype=dtype, s2d_stem=s2d_stem)
        if key is None:
            key = jax.random.PRNGKey(0)
        dummy = jnp.zeros((1, imgsz, imgsz, spec.ch_in), dtype)
        variables = jax.jit(module.init, static_argnames=("train",))(key, dummy, train=False)
        return cls(spec, variables, dtype, s2d_stem=s2d_stem)

    # -- forward ----------------------------------------------------------
    def __call__(self, x, train=False):
        """Raw forward: tuple of per-scale (bs, na, ny, nx, no) feature maps."""
        if train:
            return self.module.apply(self.variables, x, train=True, mutable=["batch_stats"])
        return self.module.apply(self.variables, x, train=False)

    def predict(self, x, augment=False):
        """Inference: (decoded (bs, N, no), feats). Mirrors reference eval-mode forward."""
        if augment:
            return self.predict_augmented(x), None
        feats = self.module.apply(self.variables, x, train=False)
        return decode_predictions(feats, self.anchors_px, self.spec.strides), feats

    def predict_augmented(self, x):
        """TTA inference: scales [1, .83, .67] with lr-flip on the middle scale,
        descaled and tail-clipped (reference yolo.py:239-280)."""
        return predict_augmented_pure(
            self.module, self.variables, x, self.anchors_px, self.spec.strides, self.spec.nl, int(self.stride)
        )

    # -- metadata ----------------------------------------------------------
    @property
    def anchors_px(self):
        return np.array(self.spec.anchors, dtype=np.float32).reshape(self.spec.nl, -1, 2)

    @property
    def params(self):
        return self.variables["params"]

    def num_params(self):
        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(self.variables["params"]))

    def info(self, imgsz=640):
        n_layers = len(self.spec.layers)
        n_p = self.num_params()
        LOGGER.info(
            f"{self.spec.name}: {n_layers} spec layers, {n_p:,} parameters, "
            f"strides {list(self.spec.strides)}, nc={self.spec.nc}"
        )
        return n_p

    def replace_variables(self, variables):
        return DetectionModel(self.spec, variables, self.dtype, self.names, self.fused, self.s2d_stem)

    def serving_module(self, pad_lanes=0):
        """The same graph with a raw-NHWC Detect head for the fused serving
        path (decode_topk_nhwc). Shares this handle's variables unchanged.

        `pad_lanes=128` emits the tile-aligned padded head layout (see
        Detect.raw_pad); pair with decode_topk_nhwc(padded_lanes=128)."""
        return YOLOGraph(spec=self.spec, dtype=self.dtype, fused=self.fused, head_raw=True,
                         head_pad=pad_lanes, s2d_stem=self.s2d_stem)

    def fuse(self):
        """Fold Conv+BN for inference (reference fuse(), yolo.py:163-172).
        Returns a new handle running the fused graph. No-op if already fused
        or when only the train-time graph exists (no batch_stats)."""
        if self.fused or not self.variables.get("batch_stats"):
            return self
        from yolov3_tpu.models.fuse import fuse_variables

        return DetectionModel(self.spec, fuse_variables(self.variables), self.dtype, self.names,
                              fused=True, s2d_stem=self.s2d_stem)


def s2d_eligible(spec) -> bool:
    """True when the arch's stem supports the space-to-depth transform
    ([Conv k3 s1, Conv k3 s2] prefix — yolov3/yolov3-spp; tiny's maxpool stem
    does not). See YOLOGraph._s2d_modes for the full-region upgrade."""
    l0, l1 = spec.layers[0], spec.layers[1]
    return (l0.op == "Conv" and tuple(l0.args[1:3]) == (3, 1)
            and l1.op == "Conv" and tuple(l1.args[1:3]) == (3, 2))


def build_model(cfg="yolov3-tiny", **kw) -> DetectionModel:
    return DetectionModel.from_config(cfg, **kw)


def cast_variables_for_inference(variables, dtype=jnp.bfloat16):
    """Pre-cast weights to the compute dtype for serving.

    Under a bf16 compute policy flax casts f32 params per call — inside a scan
    or a serving loop that re-casts all 62M parameters every step. Casting once
    here removes that bandwidth tax. BatchNorm stats stay f32 (they fold into
    tiny per-channel affines at compile time anyway)."""

    def cast(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name in ("mean", "var"):
            return x
        return x.astype(dtype) if hasattr(x, "astype") and x.dtype == jnp.float32 else x

    return {
        "params": jax.tree_util.tree_map_with_path(cast, variables["params"]),
        "batch_stats": variables.get("batch_stats", {}),
    }


def fuse_model(model: DetectionModel) -> DetectionModel:
    """Fold Conv+BN weights for inference (see DetectionModel.fuse)."""
    return model.fuse()


def optimize_for_inference(model: DetectionModel, bf16=None) -> DetectionModel:
    """Standard inference prep: fuse Conv+BN, and on accelerators switch to a
    bf16 compute policy with pre-cast weights."""
    model = model.fuse()
    if bf16 is None:
        bf16 = jax.devices()[0].platform != "cpu"
    if bf16:
        model = DetectionModel(
            model.spec, cast_variables_for_inference(model.variables), jnp.bfloat16, model.names,
            model.fused, model.s2d_stem,
        )
    return model


def predict_augmented_pure(module, variables, x, anchors_px, strides, nl, gs):
    """Functional TTA forward (jittable: variables passed, not closed over).

    Scales [1, .83, .67], flips [None, lr, None], descale + tail clipping —
    reference yolo.py:239-280. Returns the concatenated decoded predictions.
    """
    h, w = x.shape[1:3]
    outs = []
    for si, fi in zip((1.0, 0.83, 0.67), (None, 3, None)):
        xi = jnp.flip(x, axis=2) if fi == 3 else (jnp.flip(x, axis=1) if fi == 2 else x)
        xi = _scale_img(xi, si, gs)
        feats = module.apply(variables, xi, train=False)
        yi = decode_predictions(feats, anchors_px, strides)
        yi = _descale_pred(yi, fi, si, (h, w))
        outs.append(yi)
    outs = _clip_augmented(outs, nl=nl)
    return jnp.concatenate(outs, axis=1)


# -- TTA helpers (reference utils/torch_utils.scale_img + yolo.py:254-280) ----
def _scale_img(img, ratio=1.0, gs=32, pad_value=0.447):
    """Resize NHWC batch by ratio (bilinear), pad bottom/right to a gs multiple."""
    if ratio == 1.0:
        return img
    import math

    b, h, w, c = img.shape
    sh, sw = int(h * ratio), int(w * ratio)
    # antialias=False: reference scale_img is plain F.interpolate bilinear
    # (torch_utils.py scale_img, no antialias) — the antialiased default
    # shifts downscaled-pass activations enough to move TTA confidences
    img = jax.image.resize(img, (b, sh, sw, c), method="bilinear", antialias=False)
    th, tw = math.ceil(h * ratio / gs) * gs, math.ceil(w * ratio / gs) * gs
    return jnp.pad(img, ((0, 0), (0, th - sh), (0, tw - sw), (0, 0)), constant_values=pad_value)


def _descale_pred(p, flips, scale, img_size):
    """Undo TTA scale/flip on decoded predictions (reference yolo.py:254-269)."""
    xy = p[..., 0:2] / scale
    wh = p[..., 2:4] / scale
    if flips == 2:  # ud
        xy = jnp.stack([xy[..., 0], img_size[0] - xy[..., 1]], axis=-1)
    elif flips == 3:  # lr
        xy = jnp.stack([img_size[1] - xy[..., 0], xy[..., 1]], axis=-1)
    return jnp.concatenate([xy, wh, p[..., 4:]], axis=-1)


def _clip_augmented(y, nl):
    """Clip augmented-inference tails (reference yolo.py:271-280)."""
    g = sum(4**x for x in range(nl))
    i = (y[0].shape[1] // g) * 1
    y[0] = y[0][:, :-i]
    i = (y[-1].shape[1] // g) * 4 ** (nl - 1)
    y[-1] = y[-1][:, i:]
    return y


def _main():
    """Model self-test CLI (reference models/yolo.py:__main__, 395-415):
    build a config, optionally every config (--test), per-layer profile
    (--line-profile)."""
    import argparse

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="yolov3-tiny")
    p.add_argument("--imgsz", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--test", action="store_true", help="build all registered configs")
    p.add_argument("--line-profile", action="store_true", help="per-layer time/FLOPs table")
    a = p.parse_args()

    names = ("yolov3", "yolov3-spp", "yolov3-tiny") if a.test else (a.cfg,)
    for name in names:
        model = DetectionModel.from_config(name, imgsz=min(a.imgsz, 64))
        model.info(a.imgsz)
        if a.line_profile:
            from yolov3_tpu.utils.profiling import profile_layers

            profile_layers(model, imgsz=a.imgsz, batch=a.batch_size)
        else:
            x = jnp.zeros((a.batch_size, a.imgsz, a.imgsz, 3), jnp.float32)
            pred, feats = model.predict(x)
            LOGGER.info(f"{name}: forward OK — decoded {tuple(pred.shape)}")


if __name__ == "__main__":
    _main()
