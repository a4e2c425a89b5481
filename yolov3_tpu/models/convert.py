"""Torch .pt checkpoint -> flax variables converter.

The reference distributes pretrained weights as pickled torch checkpoints
(reference train.py:470-480; loaders prefer the EMA slot, experimental.py:105).
This module maps a torch state_dict onto the yolov3_tpu variable tree:

  torch                                 flax (ours)
  model.{i}.conv.weight (O,I,kh,kw)  -> params/l{i}/conv/kernel (kh,kw,I,O)
  model.{i}.bn.{weight,bias}         -> params/l{i}/bn/{scale,bias}
  model.{i}.bn.running_{mean,var}    -> batch_stats/l{i}/bn/{mean,var}
  model.{i}.{j}.cv1...  (repeats)    -> params/l{i}_{j}/cv1/...
  model.{last}.m.{k}.{weight,bias}   -> params/l{last}/m{k}/{kernel,bias}

Full-module pickles are loaded best-effort with stub classes (the class tree
only matters to pickle; the tensors live in plain dicts), falling back to
state_dict-style payloads.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from yolov3_tpu.utils.general import LOGGER


def _to_flax_kernel(w):
    """torch conv weight (O, I/g, kh, kw) -> flax (kh, kw, I/g, O)."""
    return np.transpose(np.asarray(w, dtype=np.float32), (2, 3, 1, 0))


def torch_key_to_path(key):
    """Map one torch state_dict key to (collection, path tuple, transform) or None to skip."""
    parts = key.split(".")
    if parts[0] == "model":
        parts = parts[1:]
    if not parts or parts[-1] in ("num_batches_tracked", "anchors", "anchor_grid", "stride"):
        return None
    idx = parts[0]
    rest = parts[1:]
    layer = f"l{idx}"
    if rest and rest[0].isdigit():  # stacked repeats: model.4.1.cv1...
        layer = f"l{idx}_{rest[0]}"
        rest = rest[1:]

    *mods, leaf = rest
    # Detect head: m.{k}.weight -> m{k}/kernel
    mods = [f"m{mods[i + 1]}" if m == "m" and i + 1 < len(mods) and mods[i + 1].isdigit() else m
            for i, m in enumerate(mods)]
    mods = [m for m in mods if not m.isdigit()]

    if leaf == "weight":
        if mods and mods[-1] == "bn":
            return ("params", (layer, *mods, "scale"), lambda w: np.asarray(w, np.float32))
        # conv kernels (nested 'conv' submodule or raw nn.Conv2d like BottleneckCSP.cv2)
        return ("params", (layer, *mods, "kernel"), _to_flax_kernel)
    if leaf == "bias":
        return ("params", (layer, *mods, "bias"), lambda w: np.asarray(w, np.float32))
    if leaf == "running_mean":
        return ("batch_stats", (layer, *mods, "mean"), lambda w: np.asarray(w, np.float32))
    if leaf == "running_var":
        return ("batch_stats", (layer, *mods, "var"), lambda w: np.asarray(w, np.float32))
    return None


def load_torch_state_dict(path):
    """Extract a flat {name: np.ndarray} from a .pt file (ckpt dict, state_dict,
    or full pickled module), preferring the EMA weights like the reference
    (experimental.py:105: ckpt.get('ema') or ckpt['model'])."""
    import torch

    try:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
    except ModuleNotFoundError as e:
        LOGGER.warning(f"pickled classes unavailable ({e}); retrying with stub modules")
        ckpt = _load_with_stubs(path)

    obj = ckpt
    if isinstance(ckpt, dict):
        obj = ckpt.get("ema") or ckpt.get("model") or ckpt
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif hasattr(obj, "float"):  # stub module with _parameters dicts
        sd = _walk_stub_state_dict(obj)
    else:
        sd = obj
    return {k: np.asarray(v.float().numpy() if hasattr(v, "float") else v) for k, v in sd.items()
            if hasattr(v, "shape")}


def _load_with_stubs(path):
    """Unpickle a checkpoint whose module classes aren't importable by
    installing permissive stub classes into the expected module paths."""
    import pickle
    import sys
    import types

    import torch

    class _Stub:
        def __setstate__(self, state):
            self.__dict__.update(state if isinstance(state, dict) else {})

        def __getattr__(self, k):
            raise AttributeError(k)

    class _StubModule(types.ModuleType):
        def __getattr__(self, name):
            cls = type(name, (_Stub,), {})
            setattr(self, name, cls)
            return cls

    created = []
    for mod in ("models", "models.yolo", "models.common", "models.experimental", "utils", "utils.loss"):
        if mod not in sys.modules:
            sys.modules[mod] = _StubModule(mod)
            created.append(mod)
    try:
        return torch.load(path, map_location="cpu", weights_only=False, pickle_module=pickle)
    finally:
        for mod in created:
            sys.modules.pop(mod, None)


def _walk_stub_state_dict(obj, prefix=""):
    """Recursively pull tensors out of a stub-unpickled torch module tree."""
    out = {}
    d = getattr(obj, "__dict__", {})
    for coll in ("_parameters", "_buffers"):
        for k, v in (d.get(coll) or {}).items():
            if v is not None:
                out[prefix + k] = v
    for k, child in (d.get("_modules") or {}).items():
        out.update(_walk_stub_state_dict(child, prefix + k + "."))
    return out


def convert_torch_checkpoint(src, model):
    """Convert a torch .pt (path or flat state_dict) into variables for `model`.

    Validates shape agreement leaf-by-leaf; returns the new variables dict and
    a report of unmatched keys.
    """
    sd = load_torch_state_dict(src) if isinstance(src, (str, Path)) else dict(src)

    import flax

    flat_params = flax.traverse_util.flatten_dict(model.variables["params"])
    flat_stats = flax.traverse_util.flatten_dict(model.variables.get("batch_stats", {}))
    target = {"params": dict(flat_params), "batch_stats": dict(flat_stats)}

    matched, missed = [], []
    for key, val in sd.items():
        m = torch_key_to_path(key)
        if m is None:
            continue
        coll, path, tf = m
        if path in target[coll]:
            new = tf(val)
            old = target[coll][path]
            if new.shape != old.shape:
                missed.append(f"{key}: shape {new.shape} vs ours {old.shape}")
                continue
            target[coll][path] = new.astype(np.asarray(old).dtype)
            matched.append(key)
        else:
            missed.append(f"{key}: no target at {coll}/{'/'.join(path)}")

    n_total = len(flat_params) + len(flat_stats)
    LOGGER.info(f"convert: matched {len(matched)} torch tensors -> {n_total} target leaves; {len(missed)} unmatched")
    for msg in missed[:10]:
        LOGGER.warning(f"  unmatched: {msg}")

    variables = {
        "params": flax.traverse_util.unflatten_dict(target["params"]),
        "batch_stats": flax.traverse_util.unflatten_dict(target["batch_stats"]),
    }
    return variables, {"matched": matched, "missed": missed}
