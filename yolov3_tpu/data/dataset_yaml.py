"""Dataset YAML contract: path/train/val/test/names + optional download.

Mirrors the reference `check_dataset` behavior (reference utils/general.py:369-427):
resolve relative paths against DATASETS_DIR, validate presence, and run the
`download` recipe (URL or shell) when the val split is missing. Python-exec
download recipes (the reference exec()s arbitrary YAML code, general.py:420)
are intentionally NOT supported — a URL or shell command list is.
"""

from __future__ import annotations

import os
import subprocess
import zipfile
from pathlib import Path

from yolov3_tpu.utils.general import DATASETS_DIR, LOGGER, yaml_load


def check_dataset(data, autodownload=True):
    """Resolve + validate a dataset YAML (path or dict). Returns the dict with
    absolute train/val/test paths and a names {id: name} map. A
    `clearml://<dataset_id>` spec resolves through the ClearML dataset-version
    store first (reference utils/loggers/clearml/clearml_utils.py:21-60)."""
    if isinstance(data, str) and data.startswith("clearml://"):
        from yolov3_tpu.utils.loggers.clearml_utils import construct_dataset

        data = construct_dataset(data)
    if isinstance(data, (str, Path)):
        data = yaml_load(data)
    data = dict(data)

    for k in ("train", "val", "names"):
        assert k in data, f"dataset yaml missing required key '{k}'"
    if isinstance(data["names"], (list, tuple)):
        data["names"] = dict(enumerate(data["names"]))
    data["nc"] = len(data["names"])

    path = Path(data.get("path") or "")
    if not path.is_absolute():
        path = (DATASETS_DIR / path).resolve()
    data["path"] = path
    for k in ("train", "val", "test"):
        if data.get(k):
            if isinstance(data[k], str):
                x = (path / data[k]).resolve()
                data[k] = str(x)
            else:
                data[k] = [str((path / v).resolve()) for v in data[k]]

    val = data.get("val")
    if val:
        vals = [Path(v) for v in (val if isinstance(val, list) else [val])]
        if not all(v.exists() for v in vals):
            missing = [str(v) for v in vals if not v.exists()]
            LOGGER.warning(f"Dataset not found, missing paths {missing}")
            s = data.get("download")
            if not (s and autodownload):
                raise FileNotFoundError(f"Dataset not found and no download recipe: {missing}")
            _run_download(s, path)
            if not all(v.exists() for v in vals):
                raise FileNotFoundError(f"Dataset download did not produce {missing}")
    return data


def _run_download(s, root: Path):
    """Execute a download recipe: `converter://<name>` (an in-tree registered
    preparer, data/converters.py — the safe form of the reference's YAML-exec
    recipes), an http(s) URL (fetch+unzip), or a shell command."""
    root.parent.mkdir(parents=True, exist_ok=True)
    if isinstance(s, str) and s.startswith("converter://"):
        from yolov3_tpu.data.converters import prepare

        prepare(s[len("converter://"):], root)
    elif isinstance(s, str) and s.startswith("http"):
        fname = root.parent / Path(s).name
        LOGGER.info(f"Downloading {s} -> {fname}")
        import urllib.request

        urllib.request.urlretrieve(s, fname)
        if fname.suffix == ".zip":
            with zipfile.ZipFile(fname) as z:
                z.extractall(root.parent)
            fname.unlink()
    elif isinstance(s, str) and s.startswith("bash "):
        LOGGER.info(f"Running {s}")
        subprocess.run(s, shell=True, check=True, env={**os.environ})
    else:
        raise ValueError(f"unsupported download recipe: {s!r} (python exec recipes are not supported)")
