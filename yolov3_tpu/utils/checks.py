"""Runtime sanity checks — check_amp / check_img_size family.

`check_bf16` is the TPU analog of the reference's check_amp (reference
utils/general.py:430-455): run the model once in f32 and once under the bf16
policy on a real image and require |boxes| agreement within tolerance before
trusting mixed precision for training.
"""

from __future__ import annotations

import numpy as np

from yolov3_tpu.utils.general import LOGGER


def check_bf16(model, imgsz=256, atol=0.1):
    """Compare f32 vs bf16 decoded outputs; returns True when bf16 is safe."""
    import jax.numpy as jnp

    from yolov3_tpu.models.detect_head import decode_predictions
    from yolov3_tpu.models.detection import DetectionModel

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, imgsz, imgsz, 3)).astype(np.float32))
    f32 = decode_predictions(
        model.module.apply(model.variables, x, train=False), model.anchors_px, model.spec.strides
    )
    bf_model = DetectionModel(model.spec, model.variables, jnp.bfloat16, model.names)
    bf16 = decode_predictions(
        bf_model.module.apply(bf_model.variables, x, train=False), model.anchors_px, model.spec.strides
    )
    # compare box geometry relative to image size (obj/cls sigmoids compare in abs)
    db = float(jnp.abs(f32[..., :4] - bf16[..., :4]).max()) / imgsz
    dc = float(jnp.abs(f32[..., 4:] - bf16[..., 4:]).max())
    ok = db < atol and dc < atol
    if ok:
        LOGGER.info(f"check_bf16: passed (max box delta {db:.4f} of imgsz, conf delta {dc:.4f})")
    else:
        LOGGER.warning(f"check_bf16: FAILED (box delta {db:.4f}, conf delta {dc:.4f}) — train in f32")
    return ok


def _version_tuple(v):
    """'1.10' -> (1, 10, 0): zero-padded 3-tuple so '1.10' == '1.10.0'."""
    t = tuple(int(x) for x in str(v).split(".")[:3] if x.isdigit())
    return t + (0,) * (3 - len(t))


def check_version(current, minimum, name="version", hard=False):
    """Compare dotted version strings."""
    ok = _version_tuple(current) >= _version_tuple(minimum)
    if hard:
        assert ok, f"{name} {minimum} required, found {current}"
    return ok


def check_online(timeout=2.0):
    """True when the host can reach the internet (reference general.py
    check_online). Zero-egress environments return False fast."""
    import socket

    for host in ("1.1.1.1", "8.8.8.8"):
        try:
            socket.create_connection((host, 53), timeout=timeout).close()
            return True
        except OSError:
            continue
    return False


def check_requirements(requirements=("numpy",), exclude=(), install=None, cmds=""):
    """Verify installed packages satisfy requirement specs; optionally
    auto-install what's missing (reference utils/general.py check_requirements
    via ultralytics checks). Auto-install runs only when `install` is truthy
    (default: the YOLOV3_AUTOINSTALL env var, on by default like the
    reference's AUTOINSTALL) AND the host is online — in a zero-egress image
    it degrades to a warning, never a crash.

    Returns the list of requirement strings that remain unsatisfied."""
    import os
    import re
    from importlib import metadata

    if isinstance(requirements, (str, bytes)):
        requirements = [requirements]
    if install is None:
        install = os.environ.get("YOLOV3_AUTOINSTALL", "true").lower() == "true"

    missing = []
    for r in requirements:
        name = re.split(r"[><=!~\[ ]", str(r), maxsplit=1)[0].strip()
        if not name or name in exclude:
            continue
        spec = str(r)[len(name):].strip()
        try:
            have = metadata.version(name)
        except metadata.PackageNotFoundError:
            missing.append(str(r))
            continue
        m = re.match(r"(>=|==|<=|>|<)\s*([\w.]+)", spec)
        if m:
            op, want = m.groups()
            hv, wv = _version_tuple(have), _version_tuple(want)  # '1.10.0' == '1.10'
            ok = {">=": hv >= wv, ">": hv > wv, "==": hv == wv,
                  "<=": hv <= wv, "<": hv < wv}[op]
            if not ok:
                missing.append(str(r))

    if not missing:
        return []
    s = " ".join(f'"{x}"' for x in missing)
    if install and check_online():
        LOGGER.info(f"requirements: {len(missing)} missing, attempting auto-install: {s} {cmds}")
        import subprocess

        try:
            out = subprocess.run(
                ["python", "-m", "pip", "install", "--no-input", *missing],
                capture_output=True, text=True, timeout=600,
            )
            if out.returncode == 0:
                LOGGER.info(f"requirements: installed {s}")
                return []
            LOGGER.warning(f"requirements: auto-install failed:\n{out.stderr[-500:]}")
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"requirements: auto-install error: {e}")
    else:
        LOGGER.warning(
            f"requirements: missing {s} (auto-install "
            f"{'disabled' if not install else 'skipped: offline'})"
        )
    return missing
