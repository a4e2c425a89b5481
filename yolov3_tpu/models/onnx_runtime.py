"""In-tree ONNX runtime: minimal protobuf parser + numpy executor.

The image has neither onnxruntime nor the onnx package, so .onnx artifacts
(ours from models/onnx_native.py, or third-party files using the same op
subset) are executed here: a from-scratch wire-format parser (field numbers
mirror the public onnx.proto) and a numpy interpreter for the detector op
set. This is the inference leg behind MultiBackend's .onnx route — the
analog of the reference's onnxruntime/OpenCV-DNN backends
(reference models/common.py:494-520) — and the verification oracle that
proves the emitted bytes are semantically correct without onnxruntime
(tests/test_onnx_native.py: emitted ONNX vs the JAX forward, elementwise).

Scope: single-static-shape graphs, f32/int64 tensors, ops Conv, MaxPool,
Pad, Sigmoid, Mul, Add, Concat, Reshape, Transpose, Slice, Resize (nearest/
asymmetric/floor), LeakyRelu, Relu. Unknown ops raise by name.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

# ---------------------------------------------------------------------------
# protobuf wire parser
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int):
    v = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return v, i


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _fields(buf: bytes):
    """Yield (field_no, wire_type, value) over a message payload."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        f, w = key >> 3, key & 7
        if w == 0:
            v, i = _read_varint(buf, i)
        elif w == 1:
            v = buf[i : i + 8]
            i += 8
        elif w == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif w == 5:
            v = buf[i : i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {w}")
        yield f, w, v


def _repeated_i64(entries):
    """Repeated int64 field: packed (one bytes blob) or one-per-entry."""
    out = []
    for w, v in entries:
        if w == 0:
            out.append(_signed(v))
        else:  # packed
            i = 0
            while i < len(v):
                x, i = _read_varint(v, i)
                out.append(_signed(x))
    return out


@dataclass
class Tensor:
    name: str = ""
    dims: tuple = ()
    data_type: int = 1
    array: np.ndarray = None


@dataclass
class NodeT:
    op: str = ""
    inputs: list = field(default_factory=list)
    outputs: list = field(default_factory=list)
    attrs: dict = field(default_factory=dict)


@dataclass
class GraphT:
    nodes: list = field(default_factory=list)
    inits: dict = field(default_factory=dict)
    inputs: list = field(default_factory=list)
    outputs: list = field(default_factory=list)


_DT = {1: np.float32, 2: np.uint8, 3: np.int8, 6: np.int32, 7: np.int64,
       9: np.bool_, 10: np.float16, 11: np.float64}


def _parse_tensor(buf: bytes) -> Tensor:
    t = Tensor()
    dim_entries, raw, f32s, i64s = [], None, None, None
    for f, w, v in _fields(buf):
        if f == 1:
            dim_entries.append((w, v))
        elif f == 2:
            t.data_type = v
        elif f == 4:
            # float_data: packed chunks (w=2) accumulate; an unpacked entry
            # (w=5) is already a raw 4-byte little-endian float
            f32s = (f32s or b"") + v
        elif f == 7:
            i64s = (i64s or []) + _repeated_i64([(w, v)])
        elif f == 8:
            t.name = v.decode("utf-8")
        elif f == 9:
            raw = v
    t.dims = tuple(_repeated_i64(dim_entries))
    dt = _DT.get(t.data_type, np.float32)
    if raw is not None:
        t.array = np.frombuffer(raw, dtype=dt).reshape(t.dims)
    elif f32s is not None:
        t.array = np.frombuffer(f32s, dtype=np.float32).reshape(t.dims)
    elif i64s is not None:
        t.array = np.asarray(i64s, np.int64).reshape(t.dims)
    else:
        t.array = np.zeros(t.dims, dt)
    return t


def _parse_attr(buf: bytes):
    name, val = "", None
    ints, floats = [], []
    for f, w, v in _fields(buf):
        if f == 1:
            name = v.decode("utf-8")
        elif f == 2:
            val = struct.unpack("<f", v)[0]
        elif f == 3:
            val = _signed(v)
        elif f == 4:
            val = v.decode("utf-8")
        elif f == 5:
            val = _parse_tensor(v).array
        elif f == 7:
            floats += ([struct.unpack("<f", v)[0]] if w == 5 else
                       [x[0] for x in struct.iter_unpack("<f", v)])
        elif f == 8:
            ints += _repeated_i64([(w, v)])
    if ints:
        val = ints
    elif floats:
        val = floats
    return name, val


def _parse_node(buf: bytes) -> NodeT:
    n = NodeT()
    for f, w, v in _fields(buf):
        if f == 1:
            n.inputs.append(v.decode("utf-8"))
        elif f == 2:
            n.outputs.append(v.decode("utf-8"))
        elif f == 4:
            n.op = v.decode("utf-8")
        elif f == 5:
            k, val = _parse_attr(v)
            n.attrs[k] = val
    return n


def _vi_name(buf: bytes) -> str:
    for f, w, v in _fields(buf):
        if f == 1:
            return v.decode("utf-8")
    return ""


def parse_onnx(data: bytes) -> GraphT:
    """Parse ModelProto bytes -> GraphT (nodes in file order, initializers)."""
    graph_buf = None
    for f, w, v in _fields(data):
        if f == 7:
            graph_buf = v
    if graph_buf is None:
        raise ValueError("not an ONNX ModelProto (no graph field)")
    g = GraphT()
    for f, w, v in _fields(graph_buf):
        if f == 1:
            g.nodes.append(_parse_node(v))
        elif f == 5:
            t = _parse_tensor(v)
            g.inits[t.name] = t.array
        elif f == 11:
            g.inputs.append(_vi_name(v))
        elif f == 12:
            g.outputs.append(_vi_name(v))
    return g


# ---------------------------------------------------------------------------
# numpy executor
# ---------------------------------------------------------------------------


def _conv2d(x, w, b, strides, pads, group, dilations):
    assert tuple(dilations) == (1, 1), "dilated conv not implemented"
    pt, pl, pb, pr = pads
    sh, sw = strides
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    kh, kw = w.shape[2], w.shape[3]
    v = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(2, 3))
    v = v[:, :, ::sh, ::sw]  # (N, C, Ho, Wo, kh, kw)
    if group == 1:
        y = np.einsum("nchwij,ocij->nohw", v, w, optimize=True)
    else:
        cg = x.shape[1] // group
        og = w.shape[0] // group
        y = np.concatenate(
            [np.einsum("nchwij,ocij->nohw", v[:, g * cg : (g + 1) * cg],
                       w[g * og : (g + 1) * og], optimize=True)
             for g in range(group)], axis=1)
    if b is not None:
        y = y + b[None, :, None, None]
    return y.astype(np.float32)


def _maxpool(x, k, s, pads):
    pt, pl, pb, pr = pads
    xp = np.pad(x, ((0, 0), (0, 0), (pt, pb), (pl, pr)), constant_values=-np.inf)
    v = np.lib.stride_tricks.sliding_window_view(xp, (k[0], k[1]), axis=(2, 3))
    return v[:, :, :: s[0], :: s[1]].max(axis=(-2, -1)).astype(x.dtype)


def _resize_nearest(x, scales):
    assert scales[0] == scales[1] == 1.0
    sh, sw = int(scales[2]), int(scales[3])
    assert sh == scales[2] and sw == scales[3], "integer nearest upsample only"
    return np.repeat(np.repeat(x, sh, axis=2), sw, axis=3)


def _slice(x, starts, ends, axes=None, steps=None):
    axes = list(axes) if axes is not None else list(range(len(starts)))
    steps = list(steps) if steps is not None else [1] * len(starts)
    idx = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        en = min(int(en), x.shape[ax]) if en >= 0 else int(en)
        idx[ax] = slice(int(st), en, int(sp))
    return x[tuple(idx)]


def _reshape(x, shape):
    shp = [x.shape[i] if d == 0 else int(d) for i, d in enumerate(shape)]
    return x.reshape(shp)


def run_graph(g: GraphT, feeds: dict) -> dict:
    """Execute nodes in file order (the emitter writes topologically)."""
    env = dict(g.inits)
    env.update({k: np.asarray(v) for k, v in feeds.items()})
    env[""] = None  # optional/empty input slots (e.g. Resize roi)

    for n in g.nodes:
        i = [env[name] for name in n.inputs]
        a = n.attrs
        op = n.op
        if op == "Conv":
            y = _conv2d(i[0], i[1], i[2] if len(i) > 2 else None,
                        a.get("strides", [1, 1]), a.get("pads", [0, 0, 0, 0]),
                        a.get("group", 1), a.get("dilations", [1, 1]))
        elif op == "MaxPool":
            y = _maxpool(i[0], a["kernel_shape"], a.get("strides", [1, 1]),
                         a.get("pads", [0, 0, 0, 0]))
        elif op == "Pad":
            pads = i[1] if len(i) > 1 else a["pads"]
            half = len(pads) // 2
            widths = list(zip(pads[:half], pads[half:]))
            # opset-11+ carries constant_value as the third input; the
            # `value` attribute is the legacy (opset<11) spelling
            cval = i[2] if len(i) > 2 and i[2] is not None else a.get("value", 0.0)
            y = np.pad(i[0], widths, constant_values=float(np.asarray(cval).reshape(-1)[0]) if np.asarray(cval).size else 0.0)
        elif op == "Sigmoid":
            y = 1.0 / (1.0 + np.exp(-i[0].astype(np.float32)))
        elif op == "Mul":
            y = i[0] * i[1]
        elif op == "Add":
            y = i[0] + i[1]
        elif op == "Concat":
            y = np.concatenate(i, axis=a["axis"])
        elif op == "Reshape":
            y = _reshape(i[0], i[1])
        elif op == "Transpose":
            y = np.transpose(i[0], a["perm"])
        elif op == "Slice":
            y = _slice(i[0], i[1], i[2], i[3] if len(i) > 3 else None,
                       i[4] if len(i) > 4 else None)
        elif op == "Resize":
            y = _resize_nearest(i[0], i[2] if len(i) > 2 else i[1])
        elif op == "LeakyRelu":
            x = i[0]
            y = np.where(x >= 0, x, x * np.float32(a.get("alpha", 0.01)))
        elif op == "Relu":
            y = np.maximum(i[0], 0)
        else:
            raise NotImplementedError(f"ONNX executor: op '{op}' not implemented")
        env[n.outputs[0]] = y
    return {name: env[name] for name in g.outputs}


def onnxruntime_available() -> bool:
    """True when the real onnxruntime package is importable (absent from this
    image; auto-detected so the artifact gets independent verification the
    moment the environment allows — reference models/common.py:529-537 runs
    its ONNX leg on onnxruntime the same way)."""
    import importlib.util

    return importlib.util.find_spec("onnxruntime") is not None


class OnnxModel:
    """Loaded .onnx artifact with a forward(images_nchw_f32) -> (N, M, no).

    engine: "auto" prefers the real onnxruntime when importable (independent
    implementation; reference models/common.py:529-537) and falls back to the
    in-tree numpy executor; "numpy" / "onnxruntime" force one.
    """

    def __init__(self, path_or_bytes, engine: str = "auto"):
        data = path_or_bytes
        if not isinstance(data, (bytes, bytearray)):
            data = open(path_or_bytes, "rb").read()
        data = bytes(data)
        self.engine = engine
        self._session = None
        if engine == "onnxruntime" or (engine == "auto" and onnxruntime_available()):
            import onnxruntime as ort  # noqa: PLC0415

            self._session = ort.InferenceSession(
                data, providers=["CPUExecutionProvider"]
            )
            self.input_name = self._session.get_inputs()[0].name
            self.output_name = self._session.get_outputs()[0].name
            self.engine = "onnxruntime"
            return
        self.engine = "numpy"
        self.graph = parse_onnx(data)
        self.input_name = self.graph.inputs[0] if self.graph.inputs else "images"
        self.output_name = self.graph.outputs[0] if self.graph.outputs else "output"

    def __call__(self, images: np.ndarray) -> np.ndarray:
        images = np.asarray(images, np.float32)
        if self._session is not None:
            return self._session.run([self.output_name], {self.input_name: images})[0]
        out = run_graph(self.graph, {self.input_name: images})
        return out[self.output_name]
