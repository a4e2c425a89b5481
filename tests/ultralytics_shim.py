"""Minimal `ultralytics` package shim so /root/reference can run for parity tests.

The reference outsources ~30 utility symbols to the `ultralytics` pip package
(SURVEY.md §2.10), which is not installed in this image. This shim registers
fake `ultralytics.*` modules implementing just enough — with standard, public
formulas (BN fold, box format conversions, IoU) — to build the reference
Model on CPU and run its forward/NMS for cross-framework parity testing.

Import this module BEFORE adding /root/reference to sys.path.
Only numerics that affect parity are implemented faithfully:
  - initialize_weights: BN eps=1e-3, momentum=0.03 (matches our nn.modules)
  - fuse_conv_and_bn: the standard fold
  - make_divisible / box conversions / box_iou: textbook formulas
Everything else (logging, plotting, git, downloads) is inert.
"""

from __future__ import annotations

import contextlib
import logging
import math
import sys
import time
import types
from copy import deepcopy
from pathlib import Path

import numpy as np
import torch
import torch.nn as nn

LOGGER = logging.getLogger("ultralytics_shim")


def _module(name):
    m = types.ModuleType(name)
    sys.modules[name] = m
    return m


# ---------------------------------------------------------------- utils root
u = _module("ultralytics")
uu = _module("ultralytics.utils")
u.utils = uu

uu.LOGGER = LOGGER
class _TQDM:
    """Inert tqdm stand-in: iterable pass-through + the attribute surface the
    reference touches (desc, close, update — e.g. dataloaders.py:612-632)."""

    def __init__(self, iterable=None, **kw):
        self.iterable = iterable
        self.desc = kw.get("desc", "")

    def __iter__(self):
        return iter(self.iterable if self.iterable is not None else ())

    def __call__(self, x):  # TQDM used as a wrapper factory
        return x

    def update(self, *a, **k):
        pass

    def close(self):
        pass


uu.TQDM = _TQDM


def colorstr(*args):
    *_, string = args if len(args) > 1 else ("", args[0])
    return str(string)


def get_default_args(func):
    import inspect

    sig = inspect.signature(func)
    return {k: v.default for k, v in sig.parameters.items() if v.default is not inspect.Parameter.empty}


class TryExcept(contextlib.ContextDecorator):
    def __init__(self, msg=""):
        self.msg = msg

    def __enter__(self):
        return self

    def __exit__(self, exc_type, value, tb):
        if value:
            LOGGER.warning(f"{self.msg}: {value}")
        return True


def threaded(func):
    import threading

    def wrapper(*args, **kwargs):
        t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
        t.start()
        return t

    return wrapper


uu.colorstr = colorstr
uu.get_default_args = get_default_args
uu.TryExcept = TryExcept
uu.emojis = lambda s="": s
uu.threaded = threaded

# ---------------------------------------------------------------- utils.ops
ops = _module("ultralytics.utils.ops")
uu.ops = ops


class Profile(contextlib.ContextDecorator):
    def __init__(self, t=0.0, device=None):
        self.t = t
        self.device = device

    def __enter__(self):
        self.start = time.time()
        return self

    def __exit__(self, *a):
        self.dt = time.time() - self.start
        self.t += self.dt


def make_divisible(x, divisor):
    if isinstance(divisor, torch.Tensor):
        divisor = int(divisor.max())
    return math.ceil(x / divisor) * divisor


def clip_boxes(boxes, shape):
    if isinstance(boxes, torch.Tensor):
        boxes[..., 0].clamp_(0, shape[1])
        boxes[..., 1].clamp_(0, shape[0])
        boxes[..., 2].clamp_(0, shape[1])
        boxes[..., 3].clamp_(0, shape[0])
    else:
        boxes[..., [0, 2]] = boxes[..., [0, 2]].clip(0, shape[1])
        boxes[..., [1, 3]] = boxes[..., [1, 3]].clip(0, shape[0])
    return boxes


def xywh2xyxy(x):
    y = x.clone() if isinstance(x, torch.Tensor) else np.copy(x)
    y[..., 0] = x[..., 0] - x[..., 2] / 2
    y[..., 1] = x[..., 1] - x[..., 3] / 2
    y[..., 2] = x[..., 0] + x[..., 2] / 2
    y[..., 3] = x[..., 1] + x[..., 3] / 2
    return y


def xyxy2xywh(x):
    y = x.clone() if isinstance(x, torch.Tensor) else np.copy(x)
    y[..., 0] = (x[..., 0] + x[..., 2]) / 2
    y[..., 1] = (x[..., 1] + x[..., 3]) / 2
    y[..., 2] = x[..., 2] - x[..., 0]
    y[..., 3] = x[..., 3] - x[..., 1]
    return y


def xywhn2xyxy(x, w=640, h=640, padw=0, padh=0):
    y = x.clone() if isinstance(x, torch.Tensor) else np.copy(x)
    y[..., 0] = w * (x[..., 0] - x[..., 2] / 2) + padw
    y[..., 1] = h * (x[..., 1] - x[..., 3] / 2) + padh
    y[..., 2] = w * (x[..., 0] + x[..., 2] / 2) + padw
    y[..., 3] = h * (x[..., 1] + x[..., 3] / 2) + padh
    return y


def xyxy2xywhn(x, w=640, h=640, clip=False, eps=0.0):
    if clip:
        x = clip_boxes(x, (h - eps, w - eps))
    y = x.clone() if isinstance(x, torch.Tensor) else np.copy(x)
    y[..., 0] = ((x[..., 0] + x[..., 2]) / 2) / w
    y[..., 1] = ((x[..., 1] + x[..., 3]) / 2) / h
    y[..., 2] = (x[..., 2] - x[..., 0]) / w
    y[..., 3] = (x[..., 3] - x[..., 1]) / h
    return y


ops.Profile = Profile
ops.make_divisible = make_divisible
ops.clip_boxes = clip_boxes
ops.xywh2xyxy = xywh2xyxy
ops.xyxy2xywh = xyxy2xywh
ops.xywhn2xyxy = xywhn2xyxy
ops.xyxy2xywhn = xyxy2xywhn

# ------------------------------------------------------------- utils.metrics
met = _module("ultralytics.utils.metrics")
uu.metrics = met


def box_iou(box1, box2, eps=1e-7):
    (a1, a2), (b1, b2) = box1.unsqueeze(1).chunk(2, 2), box2.unsqueeze(0).chunk(2, 2)
    inter = (torch.min(a2, b2) - torch.max(a1, b1)).clamp_(0).prod(2)
    return inter / ((a2 - a1).prod(2) + (b2 - b1).prod(2) - inter + eps)


def bbox_iou(box1, box2, xywh=True, GIoU=False, DIoU=False, CIoU=False, eps=1e-7):
    """IoU/CIoU of aligned boxes (standard CIoU formula, Zheng et al. 2020)."""
    if xywh:
        (x1, y1, w1, h1), (x2, y2, w2, h2) = box1.chunk(4, -1), box2.chunk(4, -1)
        b1x1, b1x2, b1y1, b1y2 = x1 - w1 / 2, x1 + w1 / 2, y1 - h1 / 2, y1 + h1 / 2
        b2x1, b2x2, b2y1, b2y2 = x2 - w2 / 2, x2 + w2 / 2, y2 - h2 / 2, y2 + h2 / 2
    else:
        b1x1, b1y1, b1x2, b1y2 = box1.chunk(4, -1)
        b2x1, b2y1, b2x2, b2y2 = box2.chunk(4, -1)
        w1, h1 = b1x2 - b1x1, (b1y2 - b1y1).clamp(eps)
        w2, h2 = b2x2 - b2x1, (b2y2 - b2y1).clamp(eps)
    inter = (b1x2.minimum(b2x2) - b1x1.maximum(b2x1)).clamp(0) * (
        b1y2.minimum(b2y2) - b1y1.maximum(b2y1)
    ).clamp(0)
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union
    if CIoU or DIoU or GIoU:
        cw = b1x2.maximum(b2x2) - b1x1.minimum(b2x1)
        ch = b1y2.maximum(b2y2) - b1y1.minimum(b2y1)
        if CIoU or DIoU:
            c2 = cw**2 + ch**2 + eps
            rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
            if CIoU:
                v = (4 / math.pi**2) * (torch.atan(w2 / h2) - torch.atan(w1 / h1)).pow(2)
                with torch.no_grad():
                    alpha = v / (v - iou + (1 + eps))
                return iou - (rho2 / c2 + v * alpha)
            return iou - rho2 / c2
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def bbox_ioa(box1, box2, iou=False, eps=1e-7):
    """Intersection over box2 area, numpy."""
    b1x1, b1y1, b1x2, b1y2 = box1.T
    b2x1, b2y1, b2x2, b2y2 = box2.T
    ix = (np.minimum(b1x2[:, None], b2x2) - np.maximum(b1x1[:, None], b2x1)).clip(0)
    iy = (np.minimum(b1y2[:, None], b2y2) - np.maximum(b1y1[:, None], b2y1)).clip(0)
    inter = ix * iy
    area = (b2x2 - b2y1 * 0 - b2x1) * (b2y2 - b2y1)
    if iou:
        a1 = (b1x2 - b1x1) * (b1y2 - b1y1)
        area = area + a1[:, None] - inter
    return inter / (area + eps)


def smooth_bce(eps=0.1):
    return 1.0 - 0.5 * eps, 0.5 * eps


def smooth(y, f=0.05):
    nf = round(len(y) * f * 2) // 2 + 1
    p = np.ones(nf // 2)
    yp = np.concatenate((p * y[0], y, p * y[-1]), 0)
    return np.convolve(yp, np.ones(nf) / nf, mode="valid")


met.box_iou = box_iou
met.bbox_iou = bbox_iou
met.bbox_ioa = bbox_ioa
met.smooth_bce = smooth_bce
met.smooth = smooth
met.plot_pr_curve = lambda *a, **k: None
met.plot_mc_curve = lambda *a, **k: None

# --------------------------------------------------------- utils.torch_utils
tu = _module("ultralytics.utils.torch_utils")
uu.torch_utils = tu


def fuse_conv_and_bn(conv, bn):
    """Standard Conv2d+BatchNorm2d fold."""
    fused = (
        nn.Conv2d(
            conv.in_channels,
            conv.out_channels,
            kernel_size=conv.kernel_size,
            stride=conv.stride,
            padding=conv.padding,
            dilation=conv.dilation,
            groups=conv.groups,
            bias=True,
        )
        .requires_grad_(False)
        .to(conv.weight.device)
    )
    w_conv = conv.weight.view(conv.out_channels, -1)
    w_bn = torch.diag(bn.weight.div(torch.sqrt(bn.eps + bn.running_var)))
    fused.weight.copy_(torch.mm(w_bn, w_conv).view(fused.weight.shape))
    b_conv = torch.zeros(conv.out_channels, device=conv.weight.device) if conv.bias is None else conv.bias
    b_bn = bn.bias - bn.weight.mul(bn.running_mean).div(torch.sqrt(bn.running_var + bn.eps))
    fused.bias.copy_(torch.mv(w_bn, b_conv) + b_bn)
    return fused


def initialize_weights(model):
    """BN eps/momentum + inplace activations (ultralytics convention; matches
    yolov3_tpu/nn/modules.py BN settings eps=1e-3, torch-momentum 0.03)."""
    for m in model.modules():
        t = type(m)
        if t is nn.BatchNorm2d:
            m.eps = 1e-3
            m.momentum = 0.03
        elif t in (nn.Hardswish, nn.LeakyReLU, nn.ReLU, nn.ReLU6, nn.SiLU):
            m.inplace = True


def intersect_dicts(da, db, exclude=()):
    return {
        k: v
        for k, v in da.items()
        if k in db and all(x not in k for x in exclude) and v.shape == db[k].shape
    }


def model_info(model, detailed=False, verbose=True, imgsz=640):
    n_p = sum(x.numel() for x in model.parameters())
    LOGGER.info(f"model: {n_p} parameters")


def scale_img(img, ratio=1.0, same_shape=False, gs=32):
    if ratio == 1.0:
        return img
    h, w = img.shape[2:]
    s = (int(h * ratio), int(w * ratio))
    img = nn.functional.interpolate(img, size=s, mode="bilinear", align_corners=False)
    if not same_shape:
        h, w = (math.ceil(x * ratio / gs) * gs for x in (h, w))
    return nn.functional.pad(img, [0, w - s[1], 0, h - s[0]], value=0.447)


def time_sync():
    return time.time()


def one_cycle(y1=0.0, y2=1.0, steps=100):
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def copy_attr(a, b, include=(), exclude=()):
    for k, v in b.__dict__.items():
        if (include and k not in include) or k.startswith("_") or k in exclude:
            continue
        setattr(a, k, v)


class ModelEMA:
    def __init__(self, model, decay=0.9999, tau=2000, updates=0):
        self.ema = deepcopy(model).eval()
        self.updates = updates
        self.decay = lambda x: decay * (1 - math.exp(-x / tau))
        for p in self.ema.parameters():
            p.requires_grad_(False)

    def update(self, model):
        self.updates += 1
        d = self.decay(self.updates)
        msd = model.state_dict()
        for k, v in self.ema.state_dict().items():
            if v.dtype.is_floating_point:
                v *= d
                v += (1 - d) * msd[k].detach()

    def update_attr(self, model, include=(), exclude=("process_group", "reducer")):
        copy_attr(self.ema, model, include, exclude)


def autocast(enabled=False, device=None):
    return contextlib.nullcontext()


def smart_inference_mode(torch_1_9=True):
    def decorate(fn):
        return torch.inference_mode()(fn) if hasattr(torch, "inference_mode") else fn

    return decorate


tu.fuse_conv_and_bn = fuse_conv_and_bn
tu.initialize_weights = initialize_weights
tu.intersect_dicts = intersect_dicts
tu.model_info = model_info
tu.scale_img = scale_img
tu.time_sync = time_sync
tu.one_cycle = one_cycle
tu.copy_attr = copy_attr
tu.ModelEMA = ModelEMA
tu.autocast = autocast
tu.smart_inference_mode = smart_inference_mode
tu.TORCH_2_4 = True

# ------------------------------------------------------------ utils.plotting
plo = _module("ultralytics.utils.plotting")
uu.plotting = plo


class Annotator:
    def __init__(self, im, *a, **k):
        self.im = im

    def box_label(self, *a, **k):
        pass

    def result(self):
        return self.im


plo.Annotator = Annotator
plo.colors = lambda i, bgr=False: (0, 0, 255)
plo.save_one_box = lambda *a, **k: None

# -------------------------------------------------------------- utils.checks
chk = _module("ultralytics.utils.checks")
uu.checks = chk
chk.check_requirements = lambda *a, **k: True
chk.check_version = lambda *a, **k: True
chk.is_ascii = lambda s="": all(ord(c) < 128 for c in str(s))
chk.print_args = lambda *a, **k: None

# --------------------------------------------------------------- utils.files
fil = _module("ultralytics.utils.files")
uu.files = fil


class WorkingDirectory(contextlib.ContextDecorator):
    def __init__(self, new_dir):
        self.dir = new_dir

    def __enter__(self):
        import os

        self.cwd = Path.cwd()
        os.chdir(self.dir)

    def __exit__(self, *a):
        import os

        os.chdir(self.cwd)


def increment_path(path, exist_ok=False, sep="", mkdir=False):
    path = Path(path)
    if path.exists() and not exist_ok:
        suffix = path.suffix
        stem = path.with_suffix("")
        for n in range(2, 9999):
            p = f"{stem}{sep}{n}{suffix}"
            if not Path(p).exists():
                path = Path(p)
                break
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


fil.WorkingDirectory = WorkingDirectory
fil.file_date = lambda p=__file__: "2026-1-1"
fil.file_size = lambda p: Path(p).stat().st_size / 1e6 if Path(p).is_file() else 0.0
fil.get_latest_run = lambda search_dir=".": ""
fil.increment_path = increment_path

# ----------------------------------------------------------------- utils.git
git = _module("ultralytics.utils.git")
uu.git = git


class GitRepo:
    def __init__(self, *a, **k):
        self.is_repo = False

    def __getattr__(self, k):
        return lambda *a, **kw: None


git.GitRepo = GitRepo

# ------------------------------------------------------------- utils.patches
pat = _module("ultralytics.utils.patches")
uu.patches = pat
pat.torch_load = lambda *a, **k: torch.load(*a, weights_only=False, **k)

# -------------------------------------------------------------- utils.export
exp = _module("ultralytics.utils.export")
uu.export = exp
exp.torch2onnx = lambda *a, **k: (_ for _ in ()).throw(NotImplementedError("shim"))

# ----------------------------------------------------------------- data pkg
dat = _module("ultralytics.data")
u.data = dat
datb = _module("ultralytics.data.build")
dat.build = datb


def seed_worker(worker_id):
    import random

    worker_seed = torch.initial_seed() % 2**32
    np.random.seed(worker_seed)
    random.seed(worker_seed)


datb.seed_worker = seed_worker

datu = _module("ultralytics.data.utils")
dat.utils = datu


def get_hash(paths):
    import hashlib
    import os

    size = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
    h = hashlib.sha256(str(size).encode())
    h.update("".join(paths).encode())
    return h.hexdigest()


def img2label_paths(img_paths):
    import os

    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(x.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for x in img_paths]


datu.get_hash = get_hash
datu.img2label_paths = img2label_paths

datc = _module("ultralytics.data.converter")
dat.converter = datc


def coco80_to_coco91_class():
    return [
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 27,
        28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53,
        54, 55, 56, 57, 58, 59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80,
        81, 82, 84, 85, 86, 87, 88, 89, 90,
    ]


datc.coco80_to_coco91_class = coco80_to_coco91_class


# -------------------------------------------------------- torchvision (nms)
if "torchvision" not in sys.modules:
    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = _module("torchvision")
        tvo = _module("torchvision.ops")
        tv.ops = tvo
        tv.__version__ = "0.0.0+shim"

        def _tv_nms(boxes, scores, iou_threshold):
            """Standard greedy NMS (descending score, suppress IoU > thr) —
            the exact semantics of torchvision.ops.nms."""
            order = scores.argsort(descending=True)
            keep = []
            b = boxes[order]
            x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            areas = (x2 - x1).clamp(0) * (y2 - y1).clamp(0)
            alive = torch.ones(len(order), dtype=torch.bool)
            for i in range(len(order)):
                if not alive[i]:
                    continue
                keep.append(order[i])
                xx1 = torch.maximum(x1[i], x1[i + 1 :])
                yy1 = torch.maximum(y1[i], y1[i + 1 :])
                xx2 = torch.minimum(x2[i], x2[i + 1 :])
                yy2 = torch.minimum(y2[i], y2[i + 1 :])
                inter = (xx2 - xx1).clamp(0) * (yy2 - yy1).clamp(0)
                iou = inter / (areas[i] + areas[i + 1 :] - inter + 1e-12)
                alive[i + 1 :] &= iou <= iou_threshold
            return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

        tvo.nms = _tv_nms


def add_reference_to_path():
    """Put /root/reference on sys.path (after the shim is registered)."""
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
    return ref
