"""Conv+BN weight folding — real fuse() (reference models/yolo.py:163-172).

At inference, BatchNorm with running stats is a per-channel affine:
    y = (conv(x) - mean) / sqrt(var + eps) * scale + bias
Folding into the conv weights:
    kernel' = kernel * scale / sqrt(var + eps)         (per output channel)
    bias'   = bias - mean * scale / sqrt(var + eps)
This removes one full elementwise pass over every activation map — a real
bandwidth win at 640x640 resolutions where the early layers are HBM-bound.

`fuse_variables` walks the param tree folding every {conv, bn} sibling pair;
the matching `fused=True` module graph consumes the folded tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.utils.general import LOGGER

BN_EPS = 1e-3  # must match nn.modules.Conv's BatchNorm epsilon


def fuse_variables(variables):
    """Fold every conv+bn sibling pair; returns fused {params, batch_stats}.

    Stats of BNs that cannot fold into a sibling conv (the standalone
    concat-BN in BottleneckCSP/MixConv2d, reference common.py:168-196) are
    KEPT — those modules keep their BatchNorm at inference (running stats),
    exactly like the reference's fuse(), which only folds Conv.bn."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    n_folded = 0
    consumed = set()  # stats paths folded into conv weights

    def walk(p, s, path=()):
        nonlocal n_folded
        out = {}
        for k, v in p.items():
            if isinstance(v, dict) and "conv" in v and "bn" in v \
                    and isinstance(s, dict) and "bn" in s.get(k, {}):
                conv = dict(v["conv"])
                bn = v["bn"]
                st = s[k]["bn"]
                gamma = np.asarray(bn["scale"], np.float32)
                beta = np.asarray(bn["bias"], np.float32)
                mean = np.asarray(st["mean"], np.float32)
                var = np.asarray(st["var"], np.float32)
                f = gamma / np.sqrt(var + BN_EPS)
                kernel = np.asarray(conv["kernel"], np.float32)
                # jnp.asarray: keep folded weights as device arrays — leaving
                # them as host numpy would re-upload all params on every call
                new = {
                    "kernel": jnp.asarray((kernel * f).astype(kernel.dtype)),
                    "bias": jnp.asarray((beta - mean * f).astype(np.float32)),
                }
                consumed.add(path + (k, "bn"))
                rest = {kk: vv for kk, vv in v.items() if kk not in ("conv", "bn")}
                if rest:  # conv+bn pair nested beside other submodules
                    rest = walk(rest, s.get(k, {}), path + (k,))
                out[k] = {"conv": new, **rest}
                n_folded += 1
            elif isinstance(v, dict):
                out[k] = walk(v, s.get(k, {}) if isinstance(s, dict) else {}, path + (k,))
            else:
                out[k] = v
        return out

    fused = walk(params, stats)

    def prune(s, path=()):
        out = {}
        for k, v in s.items():
            if path + (k,) in consumed:
                continue
            if isinstance(v, dict):
                sub = prune(v, path + (k,))
                if sub:
                    out[k] = sub
            else:
                out[k] = v
        return out

    leftover = prune(stats)
    fused = jax.tree.map(jnp.asarray, fused)  # everything on device
    leftover = jax.tree.map(jnp.asarray, leftover)
    LOGGER.info(f"fuse: folded {n_folded} Conv+BN pairs")
    return {"params": fused, "batch_stats": leftover}
