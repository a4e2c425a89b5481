"""W&B adapter depth: model artifact logging (reference
utils/loggers/wandb/wandb_utils.py:34-175 — its surviving, non-deprecated
surface is run init/config, scalar logging and model artifacts).

The wandb package is absent in this image; these functions exercise the real
SDK call surface and are covered by mocked-SDK tests (tests/test_loggers_sdk.py).
"""

from __future__ import annotations

from pathlib import Path

from yolov3_tpu.utils.general import LOGGER


def log_model(run, ckpt_dir, epoch=0, fitness=0.0, best=False, metadata=None):
    """Upload a checkpoint directory as a W&B model artifact (reference
    wandb_utils.py log_model: Artifact named run_{id}_model, aliases
    latest/best/epoch N).

    `ckpt_dir` is an orbax checkpoint directory (ours are dirs, not .pt files):
    added with add_dir so the artifact carries the full restore payload.
    """
    import wandb

    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        LOGGER.warning(f"W&B model artifact skipped: {ckpt_dir} does not exist")
        return None
    art = wandb.Artifact(
        name=f"run_{run.id}_model",
        type="model",
        metadata={"epoch": int(epoch), "fitness": float(fitness),
                  "original_path": str(ckpt_dir), **(metadata or {})},
    )
    if ckpt_dir.is_dir():
        art.add_dir(str(ckpt_dir), name=ckpt_dir.name)
    else:
        art.add_file(str(ckpt_dir), name=ckpt_dir.name)
    aliases = ["latest", f"epoch {epoch}"] + (["best"] if best else [])
    run.log_artifact(art, aliases=aliases)
    return art


def download_model_artifact(weights):
    """Resolve a `wandb-artifact://entity/project/name:alias` weights spec to a
    local checkpoint path (the loader-side counterpart of log_model)."""
    prefix = "wandb-artifact://"
    if not str(weights).startswith(prefix):
        return None
    import wandb

    api = wandb.Api()
    art = api.artifact(str(weights)[len(prefix):])
    local = Path(art.download())
    entries = sorted(local.iterdir()) if local.is_dir() else [local]
    return entries[0] if len(entries) == 1 else local
