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


def check_version(current, minimum, name="version", hard=False):
    """Compare dotted version strings."""
    cur = tuple(int(x) for x in str(current).split(".")[:3] if x.isdigit())
    mini = tuple(int(x) for x in str(minimum).split(".")[:3] if x.isdigit())
    ok = cur >= mini
    if hard:
        assert ok, f"{name} {minimum} required, found {current}"
    return ok
