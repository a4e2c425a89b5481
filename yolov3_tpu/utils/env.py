"""Environment probes + filesystem helpers (reference utils/general.py:92-155).

Mostly irrelevant on TPU hosts, kept for API parity: notebooks do drive JAX
TPU runtimes (Colab TPU / Kaggle), so is_colab/is_kaggle are real signals for
display gating, and user_config_dir matters for cache placement.
"""

from __future__ import annotations

import os
import platform
from pathlib import Path


def is_colab() -> bool:
    """Running inside a Google Colab kernel."""
    return "google.colab" in str(os.environ.get("PYTHONPATH", "")) or "COLAB_RELEASE_TAG" in os.environ


def is_kaggle() -> bool:
    """Running inside a Kaggle kernel."""
    return os.environ.get("PWD") == "/kaggle/working" and "kaggle" in os.environ.get("KAGGLE_URL_BASE", "kaggle")


def is_docker() -> bool:
    """Running inside a Docker container."""
    if Path("/.dockerenv").exists():
        return True
    try:
        with open("/proc/self/cgroup") as f:
            return "docker" in f.read()
    except OSError:
        return False


def is_jupyter() -> bool:
    """Running inside any IPython/Jupyter kernel."""
    try:
        from IPython import get_ipython

        return get_ipython() is not None
    except ImportError:
        return False


def is_writeable(path, test=False) -> bool:
    """Directory has write permission; `test=True` probes by opening a file."""
    if not test:
        return os.access(path, os.W_OK)
    probe = Path(path) / "tmp.txt"
    try:
        with open(probe, "w"):
            pass
        probe.unlink()
        return True
    except OSError:
        return False


def user_config_dir(dir_name="yolov3_tpu", env_var="YOLOV3_TPU_CONFIG_DIR") -> Path:
    """Platform-appropriate writable config dir, overridable by env var."""
    if env_var in os.environ:
        p = Path(os.environ[env_var])
    else:
        base = {
            "Windows": "AppData/Roaming",
            "Linux": ".config",
            "Darwin": "Library/Application Support",
        }.get(platform.system(), ".config")
        p = Path.home() / base / dir_name
        if not is_writeable(p.parent.parent if p.parent.parent.exists() else Path.home()):
            p = Path("/tmp") / dir_name  # non-writeable home (some cloud images)
    p.mkdir(parents=True, exist_ok=True)
    return p


def imread(path, flags=None):
    """cv2.imread that accepts non-ASCII paths (reference utils/general.py:869-900
    cv2 unicode patch): decode from a numpy byte buffer."""
    import cv2
    import numpy as np

    data = np.fromfile(str(path), np.uint8)
    return cv2.imdecode(data, cv2.IMREAD_COLOR if flags is None else flags)


def imwrite(path, im) -> bool:
    """cv2.imwrite that accepts non-ASCII paths."""
    import cv2

    try:
        ok, buf = cv2.imencode(Path(str(path)).suffix, im)
        if ok:
            buf.tofile(str(path))
        return bool(ok)
    except Exception:  # noqa: BLE001
        return False


def notebook_init(verbose=True):
    """Notebook environment check: prints hardware/software summary and returns
    the IPython display module (or None outside a kernel).

    Parity with reference utils/__init__.py:9-46 notebook_init (RAM/disk/CUDA
    summary, Colab sample_data cleanup); here the hardware line reports the
    JAX backend — platform, device count, and device kind — since that is
    what a TPU notebook user needs to confirm before training.
    """
    import shutil

    from yolov3_tpu.utils.general import LOGGER

    LOGGER.info("Checking setup...")
    if is_colab():
        shutil.rmtree("/content/sample_data", ignore_errors=True)

    display = None
    if verbose:
        import jax

        gb = 1 << 30
        try:
            import psutil

            ram = f"{psutil.virtual_memory().total / gb:.1f} GB RAM, "
        except ImportError:
            ram = ""
        total, _used, free = shutil.disk_usage("/")
        try:
            from IPython import display as _display

            display = _display
            display.clear_output()
        except ImportError:
            pass
        devs = jax.devices()
        hw = f"{devs[0].platform.upper()} x{len(devs)} ({devs[0].device_kind})"
        import yolov3_tpu

        LOGGER.info(
            f"yolov3_tpu {yolov3_tpu.__version__} py-{platform.python_version()} "
            f"jax-{jax.__version__} {hw} ({ram}{free / gb:.1f}/{total / gb:.1f} GB disk)"
        )
    return display
