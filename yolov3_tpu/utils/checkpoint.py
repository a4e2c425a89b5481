"""Checkpoint save/restore: orbax pytrees + metadata sidecar.

Counterpart of the reference's pickled-nn.Module checkpoints
(reference train.py:470-489: {epoch, best_fitness, model, ema, updates,
optimizer, opt, git, date} -> last.pt/best.pt). Here a checkpoint is a
directory: orbax-serialized arrays + checkpoint.yaml metadata. `strip`
produces an inference-only checkpoint with the EMA weights promoted to
the main slot (strip_optimizer parity, reference utils/general.py:753-767).
"""

from __future__ import annotations

import datetime
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from yolov3_tpu.utils.general import LOGGER, yaml_load, yaml_save


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def _checkpointer():
    """A PROCESS-LOCAL orbax checkpointer.

    Our checkpoints are host-local numpy trees (fully-replicated training
    state materialized with np.asarray), saved by whichever process calls —
    the reference's rank-0-save semantics (reference train.py:469-489). A
    default StandardCheckpointer would run a GLOBAL barrier inside save() /
    restore() whenever jax.process_count() > 1, so a process-0-only save
    deadlocks the pod (found by
    tests/test_multiprocess_distributed.py::test_four_process_checkpoint_resume:
    'sync_global_devices name mismatch (_Checkpointer:save_start)').
    Restricting active_processes to the caller keeps orbax's barriers local."""
    if jax.process_count() > 1:
        pidx = jax.process_index()
        opts = ocp.options.MultiprocessingOptions(
            primary_host=pidx, active_processes={pidx}, barrier_sync_key_prefix=f"proc{pidx}"
        )
        return ocp.StandardCheckpointer(multiprocessing_options=opts)
    return ocp.StandardCheckpointer()


def save_checkpoint(path, state, spec=None, meta=None):
    """Save a train-state pytree + model spec + metadata to directory `path`."""
    path = Path(path).resolve()
    ckpt = _checkpointer()
    ckpt.save(path / "state", _to_host(state), force=True)
    ckpt.wait_until_finished()
    md = dict(meta or {})
    md["date"] = datetime.datetime.now().isoformat()
    if "git" not in md:  # provenance, reference train.py:477 "git" field
        from yolov3_tpu.utils.general import check_git_info

        md["git"] = check_git_info()
    if spec is not None:
        md["model_yaml"] = spec_to_dict(spec)
    yaml_save(path / "checkpoint.yaml", md)
    return path


def load_checkpoint(path, target=None):
    """Restore (state, meta) from a checkpoint directory."""
    path = Path(path).resolve()
    ckpt = _checkpointer()
    state = ckpt.restore(path / "state", target=_to_host(target) if target is not None else None)
    meta = yaml_load(path / "checkpoint.yaml") if (path / "checkpoint.yaml").is_file() else {}
    return state, meta


def strip_checkpoint(path, out=None):
    """Finalize a checkpoint for inference: EMA -> model, drop optimizer state."""
    state, meta = load_checkpoint(path)
    ema = state.get("ema", {}).get("ema")
    variables = ema if ema else {"params": state["params"], "batch_stats": state.get("batch_stats", {})}
    out = Path(out or path).resolve()  # orbax requires absolute paths
    ckpt = _checkpointer()
    ckpt.save(out / "state", {"params": variables["params"], "batch_stats": variables.get("batch_stats", {})},
              force=True)
    ckpt.wait_until_finished()
    meta["stripped"] = True
    yaml_save(out / "checkpoint.yaml", meta)
    LOGGER.info(f"Checkpoint stripped for inference: {out}")
    return out


def spec_to_dict(spec):
    """Serialize a ModelSpec back to a loadable YAML dict."""
    return {
        "name": spec.name,
        "nc": spec.nc,
        "ch": spec.ch_in,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        # a custom default-activation override must survive the round trip or
        # the reloaded net silently runs SiLU
        **({"activation": spec.activation} if spec.activation else {}),
        "anchors": [list(a) for a in spec.anchors],
        "layers": [
            {
                "from": list(ls.f) if len(ls.f) > 1 else (ls.f[0] - ls.i if ls.f[0] != ls.i - 1 else -1),
                "n": ls.n,
                "op": ls.op,
                "args": _de_tuple(ls.args),
            }
            for ls in spec.layers[:-1]
        ]
        + [{"from": list(spec.detect_from), "n": 1, "op": "Detect", "args": ["nc", "anchors"]}],
    }


def _de_tuple(x):
    if isinstance(x, tuple):
        return [_de_tuple(v) for v in x]
    return x


def load_model_from_checkpoint(path, dtype=None):
    """Rebuild a DetectionModel handle from a checkpoint directory."""
    import jax.numpy as jnp

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.models.spec import parse_spec

    path = Path(path)
    meta = yaml_load(path / "checkpoint.yaml")
    spec = parse_spec(meta["model_yaml"])
    state, _ = load_checkpoint(path)
    if "ema" in state and state.get("ema", {}).get("ema"):
        variables = state["ema"]["ema"]
    else:
        variables = {"params": state["params"], "batch_stats": state.get("batch_stats", {})}
    model = DetectionModel(spec, dict(variables), dtype or jnp.float32,
                           fused=bool(meta.get("fused", False)))
    names = meta.get("names")
    if names:
        model.names = {int(k): v for k, v in names.items()} if isinstance(names, dict) else dict(enumerate(names))
    return model
