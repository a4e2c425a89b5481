"""Detect head: per-scale 1x1 convs + pure-functional decode.

Re-design of the reference Detect module (reference models/yolo.py:69-123).
The torch version lazily caches grids as module state; here the grid is a pure
function of the (static) feature shape, so under jit it is constant-folded —
no cache, no dynamic rebuild.

Output parity targets (SURVEY.md §2.1): at 640x640/nc=80 the decoded tensor is
(1, 25200, 85) for yolov3 and (1, 6000, 85) for tiny, flattened in
(na, ny, nx) order.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


def detect_bias_init(nc: int, na: int, stride: float, imgsz: float = 640.0):
    """Objectness/class prior bias init (reference yolo.py:282-292):
    obj ~ log(8 objects / (640/stride)^2 cells), cls ~ log(0.6/(nc-1))."""

    def init(key, shape, dtype=jnp.float32):
        b = np.zeros((na, nc + 5), dtype=np.float32)
        b[:, 4] += math.log(8.0 / (imgsz / stride) ** 2)
        b[:, 5 : 5 + nc] += math.log(0.6 / (nc - 0.99999))
        return jnp.asarray(b.reshape(-1), dtype=dtype)

    return init


class Detect(nn.Module):
    """Per-scale 1x1 output convs; returns raw feature maps (bs, na, ny, nx, no).

    Channel order within the last conv matches the reference's
    view(bs, na, no, ny, nx) split (yolo.py:98): channel = a * no + o, so the
    .pt weight converter can reshape reference kernels directly.
    """

    nc: int
    na: int
    strides: tuple
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        no = self.nc + 5
        outs = []
        for i, x in enumerate(xs):
            x = nn.Conv(
                self.na * no,
                (1, 1),
                use_bias=True,
                bias_init=detect_bias_init(self.nc, self.na, self.strides[i]),
                dtype=self.dtype,
                name=f"m{i}",
            )(x)
            bs, ny, nx, _ = x.shape
            x = x.reshape(bs, ny, nx, self.na, no).transpose(0, 3, 1, 2, 4)  # (bs,na,ny,nx,no)
            outs.append(x.astype(jnp.float32))
        return tuple(outs)


def make_grid(ny: int, nx: int, dtype=jnp.float32):
    """Cell-center grid with the -0.5 offset baked in (reference yolo.py:112-123).

    Returns (1, 1, ny, nx, 2) xy grid such that xy = (sigmoid*2 + grid) * stride.
    """
    yv, xv = jnp.meshgrid(jnp.arange(ny, dtype=dtype), jnp.arange(nx, dtype=dtype), indexing="ij")
    return jnp.stack([xv, yv], axis=-1).reshape(1, 1, ny, nx, 2) - 0.5


def decode_predictions(feats, anchors, strides):
    """Decode raw Detect features to (bs, sum(na*ny*nx), no) xywh+obj+cls.

    Math parity with reference yolo.py:104-107:
      xy = (sigmoid(t_xy) * 2 + grid) * stride
      wh = (sigmoid(t_wh) * 2)^2 * anchor_px
      conf = sigmoid(t_conf)

    Args:
        feats: list of (bs, na, ny, nx, no) raw head outputs.
        anchors: (nl, na, 2) pixel anchors (NOT grid-normalized).
        strides: per-scale strides.
    """
    anchors = jnp.asarray(anchors, dtype=jnp.float32).reshape(len(feats), -1, 2)
    z = []
    for i, f in enumerate(feats):
        bs, na, ny, nx, no = f.shape
        sig = nn.sigmoid(f.astype(jnp.float32))
        grid = make_grid(ny, nx)
        xy = (sig[..., :2] * 2 + grid) * strides[i]
        wh = (sig[..., 2:4] * 2) ** 2 * anchors[i].reshape(1, na, 1, 1, 2)
        y = jnp.concatenate([xy, wh, sig[..., 4:]], axis=-1)
        z.append(y.reshape(bs, na * ny * nx, no))
    return jnp.concatenate(z, axis=1)
