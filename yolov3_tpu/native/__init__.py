"""Native (C++) host-side ops: greedy NMS and cv2-parity letterbox.

The reference outsources its native kernels (torchvision.ops.nms C++/CUDA,
reference utils/general.py:733; OpenCV C++ image ops); this framework owns a
small native layer for the host side of the runtime. The TPU compute path is
JAX/XLA/Pallas — these ops cover CPU serving contexts (e.g. the tflite /
savedmodel backends of models/backend.py) where paying an XLA compile for NMS
is wasteful.

Build model: ops.cpp is compiled on first use with g++ (-O3 -shared -fPIC)
into native/_build/libyolonative.so and loaded via ctypes — no pybind11.
Everything degrades gracefully: `available()` is False when no compiler or
the build fails, and all callers fall back to the XLA/numpy paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_BUILD_DIR = _HERE / "_build"
_LIB_PATH = _BUILD_DIR / "libyolonative.so"
_SRC = _HERE / "ops.cpp"

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    _BUILD_DIR.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if r.returncode != 0:  # retry without -march=native (portability)
        cmd.remove("-march=native")
        try:
            r = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
        except (OSError, subprocess.TimeoutExpired):
            return False
    return r.returncode == 0


def _load():
    """Compile (if stale/missing) and load the shared library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            stale = (not _LIB_PATH.exists()) or (
                _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
            )
            if stale and not _build():
                return None
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None

        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int)
        lib.yolo_greedy_nms_batch.argtypes = [
            f32p, f32p, f32p, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, f32p, i32p,
        ]
        lib.yolo_greedy_nms_batch.restype = None
        lib.yolo_resize_linear_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.yolo_resize_linear_u8.restype = None
        lib.yolo_letterbox_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, u8p,
        ]
        lib.yolo_letterbox_u8.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _f32(a):
    return np.ascontiguousarray(a, dtype=np.float32)


def greedy_nms_batch(boxes_off, boxes, scores, cls_ids, iou_thres=0.45, max_det=300):
    """Batched greedy NMS over (bs, K, ...) candidate arrays.

    Exact-match contract with ops/nms.py::_greedy_nms (XLA): rows sorted by
    descending score, suppression at iou > iou_thres on offset boxes,
    invalid candidates marked by scores <= 0.

    Returns (out (bs, max_det, 6) f32, n_valid (bs,) i32).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    boxes_off, boxes = _f32(boxes_off), _f32(boxes)
    scores, cls_ids = _f32(scores), _f32(cls_ids)
    bs, k = scores.shape
    out = np.zeros((bs, max_det, 6), np.float32)
    n_valid = np.zeros((bs,), np.int32)
    p = lambda a, t: a.ctypes.data_as(ctypes.POINTER(t))  # noqa: E731
    lib.yolo_greedy_nms_batch(
        p(boxes_off, ctypes.c_float), p(boxes, ctypes.c_float),
        p(scores, ctypes.c_float), p(cls_ids, ctypes.c_float),
        bs, k, float(iou_thres), int(max_det),
        p(out, ctypes.c_float), p(n_valid, ctypes.c_int),
    )
    return out, n_valid


def resize_linear(im: np.ndarray, new_wh) -> np.ndarray:
    """cv2.resize(im, new_wh, INTER_LINEAR) byte-parity for uint8 HWC images."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    im = np.ascontiguousarray(im, dtype=np.uint8)
    sh, sw = im.shape[:2]
    cn = 1 if im.ndim == 2 else im.shape[2]
    dw, dh = int(new_wh[0]), int(new_wh[1])
    dst = np.empty((dh, dw, cn) if im.ndim == 3 else (dh, dw), np.uint8)
    u8 = ctypes.c_uint8
    lib.yolo_resize_linear_u8(
        im.ctypes.data_as(ctypes.POINTER(u8)), sh, sw, cn,
        dst.ctypes.data_as(ctypes.POINTER(u8)), dh, dw,
    )
    return dst


def letterbox(im, new_shape=(640, 640), color=(114, 114, 114), auto=True,
              scale_fill=False, scaleup=True, stride=32):
    """Native letterbox with the exact contract of data/augment.letterbox
    (reference augmentations.py:104-134): same ratio/padding arithmetic, the
    resize+pad executed in one C++ call. Returns (image, ratio, (dw, dh))."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    im = np.ascontiguousarray(im, dtype=np.uint8)
    shape = im.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)

    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)
    ratio = r, r
    new_unpad = round(shape[1] * r), round(shape[0] * r)
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0.0, 0.0
        new_unpad = (new_shape[1], new_shape[0])
        ratio = new_shape[1] / shape[1], new_shape[0] / shape[0]
    dw /= 2
    dh /= 2
    top, left = round(dh - 0.1), round(dw - 0.1)
    out_h = new_unpad[1] + top + round(dh + 0.1)
    out_w = new_unpad[0] + left + round(dw + 0.1)

    cn = 1 if im.ndim == 2 else im.shape[2]
    # pad/repeat to exactly cn entries: a 4-channel (BGRA) input with the
    # default 3-tuple must not make the C++ kernel read past the buffer
    col = np.resize(np.asarray(color, np.uint8), cn)
    dst = np.empty((out_h, out_w, cn) if im.ndim == 3 else (out_h, out_w), np.uint8)
    u8 = ctypes.c_uint8
    lib.yolo_letterbox_u8(
        im.ctypes.data_as(ctypes.POINTER(u8)), shape[0], shape[1], cn,
        dst.ctypes.data_as(ctypes.POINTER(u8)), out_h, out_w,
        new_unpad[1], new_unpad[0], top, left,
        col.ctypes.data_as(ctypes.POINTER(u8)),
    )
    return dst, ratio, (dw, dh)
