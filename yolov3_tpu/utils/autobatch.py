"""AutoBatch: pick the largest batch size fitting in HBM.

Counterpart of reference utils/autobatch.py:14-82 (profile memory at batch
1/2/4/8/16, linear-fit to 80% of free VRAM) — but exact instead of
extrapolated: XLA's compile-time memory_analysis gives the true peak for any
batch size without running anything.
"""

from __future__ import annotations

import jax

from yolov3_tpu.utils.general import LOGGER
from yolov3_tpu.utils.profiling import model_memory_bytes


def hbm_bytes(device=None):
    """Total HBM on the target device (fallback 16 GiB for v5e)."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
        return int(stats.get("bytes_limit") or stats.get("bytes_reservable_limit") or 16 * 2**30)
    except Exception:  # noqa: BLE001
        return 16 * 2**30


def check_train_batch_size(model, imgsz=640, fraction=0.8, candidates=(128, 96, 64, 48, 32, 24, 16, 8, 4, 2, 1)):
    """Largest candidate batch whose compiled forward fits in `fraction` of HBM.

    Training needs ~3x forward memory (grads + optimizer); we fold that into
    the budget rather than compiling the full train step for each candidate.
    """
    budget = hbm_bytes() * fraction / 3.0
    for b in candidates:
        try:
            need = model_memory_bytes(model, b, imgsz)
        except Exception as e:  # noqa: BLE001
            LOGGER.warning(f"AutoBatch: compile failed at batch {b}: {e}")
            continue
        if need <= budget:
            LOGGER.info(
                f"AutoBatch: using batch-size {b} ({need / 2**30:.2f} GiB forward, "
                f"budget {budget / 2**30:.2f} GiB of {hbm_bytes() / 2**30:.0f} GiB HBM)"
            )
            return b
    LOGGER.warning("AutoBatch: falling back to batch-size 1")
    return 1
