"""General utilities: logging, config IO, run dirs, seeding, validation checks.

Covers the framework-infrastructure surface the reference spreads across
utils/general.py and the external `ultralytics` package (SURVEY.md §2.10):
LOGGER, colorstr, yaml_load/save, init_seeds, increment_path, make_divisible,
check_img_size, Profile timers, TryExcept.
"""

from __future__ import annotations

import contextlib
import datetime
import glob
import logging
import math
import os
import platform
import random
import re
import time
from pathlib import Path

import numpy as np
import yaml

FILE = Path(__file__).resolve()
ROOT = FILE.parents[2]  # repo root
RANK = int(os.getenv("RANK", -1))
DATASETS_DIR = Path(os.getenv("YOLOV3_TPU_DATASETS_DIR", ROOT.parent / "datasets"))
NUM_THREADS = min(8, max(1, os.cpu_count() - 1))  # host-side worker threads


def set_logging(name="yolov3_tpu", verbose=True):
    """Configure and return the package logger."""
    level = logging.INFO if verbose and RANK in {-1, 0} else logging.ERROR
    log = logging.getLogger(name)
    log.setLevel(level)
    if not log.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(message)s"))
        handler.setLevel(level)
        log.addHandler(handler)
        log.propagate = False
    return log


LOGGER = set_logging()


def colorstr(*input):
    """Colorize a string for terminal output, e.g. colorstr('blue', 'hello')."""
    *args, string = input if len(input) > 1 else ("blue", "bold", input[0])
    colors = {
        "black": "\033[30m", "red": "\033[31m", "green": "\033[32m", "yellow": "\033[33m",
        "blue": "\033[34m", "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
        "bright_black": "\033[90m", "bright_red": "\033[91m", "bright_green": "\033[92m",
        "bright_yellow": "\033[93m", "bright_blue": "\033[94m", "bright_magenta": "\033[95m",
        "bright_cyan": "\033[96m", "bright_white": "\033[97m",
        "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m",
    }  # fmt: skip
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def emojis(string=""):
    """Return a platform-safe version of a string (strip emojis on Windows)."""
    return string.encode().decode("ascii", "ignore") if platform.system() == "Windows" else string


class TryExcept(contextlib.ContextDecorator):
    """Context manager / decorator that logs exceptions instead of raising."""

    def __init__(self, msg=""):
        self.msg = msg

    def __enter__(self):
        pass

    def __exit__(self, exc_type, value, traceback):
        if value:
            LOGGER.warning(f"{self.msg}{': ' if self.msg else ''}{value}")
        return True


class Timeout(contextlib.ContextDecorator):
    """SIGALRM-based timeout context (reference general.py:158-182); unix-only."""

    def __init__(self, seconds, timeout_msg="", suppress_timeout_errors=True):
        self.seconds = int(seconds)
        self.msg = timeout_msg
        self.suppress = bool(suppress_timeout_errors)

    def _handler(self, signum, frame):
        raise TimeoutError(self.msg)

    def __enter__(self):
        import signal

        if platform.system() != "Windows":
            signal.signal(signal.SIGALRM, self._handler)
            signal.alarm(self.seconds)

    def __exit__(self, exc_type, exc_val, exc_tb):
        import signal

        if platform.system() != "Windows":
            signal.alarm(0)
        if self.suppress and exc_type is TimeoutError:
            return True


def threaded(func):
    """Decorator: run func in a daemon thread, return the Thread."""
    import functools
    import threading

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        t = threading.Thread(target=func, args=args, kwargs=kwargs, daemon=True)
        t.start()
        return t

    return wrapper


class Profile(contextlib.ContextDecorator):
    """Accumulating wall-clock timer. Use `block_until_ready` on device outputs
    before exiting the block for accurate device timing (the JAX analog of the
    reference's CUDA-event-synced Profile)."""

    def __init__(self, t=0.0):
        self.t = t
        self.dt = 0.0

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *args):
        self.dt = time.perf_counter() - self.start
        self.t += self.dt


def yaml_load(file="data.yaml"):
    """Load a YAML file into a dict (ignores non-ascii errors like the reference)."""
    with open(file, errors="ignore") as f:
        return yaml.safe_load(f)


def yaml_save(file="data.yaml", data=None):
    """Save a dict to a YAML file, converting Paths to strings."""
    with open(file, "w") as f:
        yaml.safe_dump({k: str(v) if isinstance(v, Path) else v for k, v in (data or {}).items()}, f, sort_keys=False)


def enable_compilation_cache(path=None):
    """Enable JAX's persistent compilation cache. On remote-compile TPU
    runtimes a fresh process otherwise re-pays minutes of XLA compilation for
    every shape it has ever seen."""
    import jax

    path = str(path or (ROOT / ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # noqa: BLE001
        LOGGER.warning(f"compilation cache not enabled: {e}")
    return path


def select_device(device=None):
    """`--device` analog (reference torch_utils.py:86 selects CUDA ids).

    On JAX the platform is process-global, so this must run before the first
    backend touch: sets JAX_PLATFORMS (e.g. "cpu", "tpu") and logs what the
    runtime actually initialized. No-op when `device` is falsy (auto)."""
    if not device:
        return
    os.environ["JAX_PLATFORMS"] = str(device)
    import jax

    try:
        jax.config.update("jax_platforms", str(device))
    except Exception:  # noqa: BLE001 — older config name or already initialized
        pass
    backend = jax.default_backend()
    if backend != str(device).split(",")[0]:
        LOGGER.warning(f"--device {device}: backend initialized as '{backend}' (set before first JAX use)")
    else:
        LOGGER.info(f"device: {backend} x{jax.local_device_count()}")


def init_seeds(seed=0, deterministic=False):
    """Seed python/numpy RNGs and return a jax PRNG key.

    JAX is deterministic by construction (explicit keys), so the reference's
    `torch.use_deterministic_algorithms` dance (general.py:191-205) reduces to
    seeding the host-side RNGs used by the data pipeline.
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import jax

    return jax.random.PRNGKey(seed)


def make_divisible(x, divisor):
    """Round up x to the nearest multiple of divisor."""
    return math.ceil(x / divisor) * divisor


def check_img_size(imgsz, s=32, floor=0):
    """Verify image size is a multiple of stride s; return adjusted size."""
    if isinstance(imgsz, int):
        new_size = max(make_divisible(imgsz, int(s)), floor)
    else:
        imgsz = list(imgsz)
        new_size = [max(make_divisible(x, int(s)), floor) for x in imgsz]
    if new_size != imgsz:
        LOGGER.warning(f"--img-size {imgsz} must be multiple of max stride {s}, updating to {new_size}")
    return new_size


def check_suffix(file="model.ckpt", suffix=(".ckpt",), msg=""):
    """Assert file(s) have an acceptable suffix."""
    if file and suffix:
        if isinstance(suffix, str):
            suffix = [suffix]
        for f in file if isinstance(file, (list, tuple)) else [file]:
            s = Path(f).suffix.lower()
            if len(s):
                assert s in suffix, f"{msg}{f} acceptable suffix is {suffix}"


def check_yaml(file, suffix=(".yaml", ".yml")):
    """Check a YAML file exists (searching package config dirs) and return its path."""
    return check_file(file, suffix)


def check_file(file, suffix=""):
    """Search for a file in the repo/package dirs and return its path."""
    check_suffix(file, suffix)
    file = str(file)
    if Path(file).is_file() or not file:
        return file
    files = []
    for d in ("yolov3_tpu/models/configs", "yolov3_tpu/data", "yolov3_tpu/data/hyps", "data"):
        files.extend(glob.glob(str(ROOT / d / "**" / Path(file).name), recursive=True))
    assert len(files), f"File not found: {file}"
    assert len(files) == 1, f"Multiple files match '{file}', specify exact path: {files}"
    return files[0]


def increment_path(path, exist_ok=False, sep="", mkdir=False):
    """Increment a run path, e.g. runs/exp -> runs/exp2, runs/exp3, ..."""
    path = Path(path)
    if path.exists() and not exist_ok:
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(2, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                break
        path = Path(p)
    if mkdir:
        path.mkdir(parents=True, exist_ok=True)
    return path


def get_latest_run(search_dir="."):
    """Return the path of the most recent 'last' checkpoint directory under search_dir."""
    items = glob.glob(f"{search_dir}/**/last*", recursive=True)
    return max(items, key=os.path.getctime) if items else ""


def file_size(path):
    """Size of a file or directory in MB."""
    mb = 1 << 20
    path = Path(path)
    if path.is_file():
        return path.stat().st_size / mb
    if path.is_dir():
        return sum(f.stat().st_size for f in path.glob("**/*") if f.is_file()) / mb
    return 0.0


def print_args(args: dict | None = None, show_file=True):
    """Log a dict of arguments (CLI echo)."""
    s = ", ".join(f"{k}={v}" for k, v in (args or {}).items())
    LOGGER.info(colorstr("args: ") + s)


def one_cycle(y1=0.0, y2=1.0, steps=100):
    """Sinusoidal ramp y1→y2 over steps (the reference's cosine LR shape)."""
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def labels_to_class_weights(labels, nc=80):
    """Inverse-frequency class weights from a list of (n,5) label arrays."""
    if not len(labels):
        return np.ones(nc) / nc
    classes = np.concatenate([lb[:, 0] for lb in labels], 0).astype(int)
    weights = np.bincount(classes, minlength=nc).astype(float)
    weights[weights == 0] = 1
    weights = 1 / weights
    return weights / weights.sum()


def labels_to_image_weights(labels, nc=80, class_weights=None):
    """Per-image sampling weights from per-class weights (image-weighted training)."""
    if class_weights is None:
        class_weights = np.ones(nc)
    counts = np.array([np.bincount(lb[:, 0].astype(int), minlength=nc) for lb in labels])
    return (class_weights.reshape(1, nc) * counts).sum(1)


def coco80_to_coco91_class():
    """Map COCO 80-class contiguous ids to the 91-class paper ids (for COCO JSON eval)."""
    return [
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24, 25, 27, 28, 31, 32, 33,
        34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 59, 60, 61,
        62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82, 84, 85, 86, 87, 88, 89, 90,
    ]  # fmt: skip


def clean_str(s):
    """Sanitize a string to be a safe filename component."""
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)


def clean_url(url):
    """Strip auth/query from a URL for display (reference downloads.py usage)."""
    return re.sub(r"\?.*$", "", str(url)).replace(":@", "://")


class WorkingDirectory(contextlib.ContextDecorator):
    """chdir context manager/decorator (reference: ultralytics.utils.files)."""

    def __init__(self, new_dir):
        self.dir = new_dir

    def __enter__(self):
        self.cwd = Path.cwd().resolve()
        os.chdir(self.dir)

    def __exit__(self, *exc):
        os.chdir(self.cwd)


def file_date(path=__file__):
    """Human-readable file modification date, e.g. '2026-8-16'
    (reference: ultralytics.utils.files.file_date)."""
    t = datetime.datetime.fromtimestamp(Path(path).stat().st_mtime)
    return f"{t.year}-{t.month}-{t.day}"


def check_git_info(path="."):
    """{remote, branch, commit} of a git repo, or Nones outside one — recorded
    into training checkpoints (reference train.py:477 'git' field)."""
    import subprocess

    def _git(*args):
        try:
            r = subprocess.run(
                ["git", "-C", str(path), *args], capture_output=True, text=True, timeout=5
            )
            return r.stdout.strip() or None if r.returncode == 0 else None
        except (OSError, subprocess.TimeoutExpired):
            return None

    return {
        "remote": _git("config", "--get", "remote.origin.url"),
        "branch": _git("rev-parse", "--abbrev-ref", "HEAD"),
        "commit": _git("rev-parse", "--short", "HEAD"),
    }


def check_font(font="Arial.ttf"):
    """Resolve a font file locally; the reference downloads from a release
    asset (general.py check_font) — zero-egress here, so resolve from the
    matplotlib bundle or return None (plots fall back to cv2 Hershey)."""
    p = Path(font)
    if p.exists():
        return p
    try:
        import matplotlib

        cand = sorted(Path(matplotlib.get_data_path()).rglob("DejaVuSans.ttf"))
        return cand[0] if cand else None
    except Exception:  # noqa: BLE001
        return None
