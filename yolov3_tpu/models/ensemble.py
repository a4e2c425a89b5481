"""Model ensembling — reference models/experimental.py:74-124 counterpart.

An Ensemble holds several DetectionModel handles; predictions are decoded per
model and concatenated along the candidate axis before one shared NMS pass
(the reference's nms-ensemble mode, experimental.py:83).
"""

from __future__ import annotations

import jax.numpy as jnp

from yolov3_tpu.utils.general import LOGGER


class Ensemble:
    """Concat-ensemble of DetectionModels with a unified predict()."""

    def __init__(self, models):
        assert len(models) >= 1
        self.models = list(models)
        strides = {int(m.stride) for m in models}
        self.stride = max(strides)
        self.names = models[0].names
        self.spec = models[0].spec
        if len(models) > 1:
            LOGGER.info(f"Ensemble of {len(models)} models created (max stride {self.stride})")

    @property
    def variables(self):
        return [m.variables for m in self.models]

    def predict(self, x, augment=False):
        preds = []
        for m in self.models:
            p, _ = m.predict(x, augment=augment)
            preds.append(p)
        return jnp.concatenate(preds, axis=1), None

    def __call__(self, imgs_u8):
        """Backend-style call: uint8 NHWC batch -> decoded (B, N, 5+nc) numpy.

        Lets an Ensemble drop into every place a MultiBackend artifact goes
        (validator / detect non-native branch) — the reference routes
        ensembles through DetectMultiBackend the same way (common.py:471).
        Jitted once: all member forwards + decodes fuse into one program."""
        import numpy as np

        if not hasattr(self, "_jit_call"):
            import jax

            def f(x_u8):
                x = x_u8.astype(jnp.float32) / 255.0
                pred, _ = self.predict(x)
                return pred

            self._jit_call = jax.jit(f)
        return np.asarray(self._jit_call(jnp.asarray(np.asarray(imgs_u8))))


def attempt_load(weights, autoshape=False):
    """Load one or several checkpoints; >1 becomes an Ensemble
    (reference experimental.py:88-136)."""
    from yolov3_tpu.cli.val import load_weights

    paths = weights if isinstance(weights, (list, tuple)) else [weights]
    models = [load_weights(w) for w in paths]
    out = models[0] if len(models) == 1 else Ensemble(models)
    if autoshape:
        from yolov3_tpu.models.autoshape import AutoShape

        out = AutoShape(out)  # AutoShape runs the full concat-NMS ensemble
    return out
