"""Fused conv+BN-stats Pallas prototype: correctness vs the XLA ops.

The kernel exists as the measured go/no-go for the train-step plateau
(docs/PERF.md round-5; VERDICT r4 next #2); interpret mode checks the
numerics on CPU — conv output vs lax.conv_general_dilated and the batch
mean/var vs the direct f32 reductions BatchNorm uses.
"""

import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("shape", [(2, 16, 16, 8, 16), (1, 8, 24, 4, 8)])
def test_conv3x3_bn_stats_matches_xla(shape):
    import jax

    from yolov3_tpu.ops.conv_bn_pallas import conv3x3_bn_stats

    B, H, W, Cin, Cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(3, 3, Cin, Cout)) * 0.1).astype(np.float32))

    y, mean, var = conv3x3_bn_stats(x, w, th=4, interpret=True)

    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)
    rf = np.asarray(ref, np.float64).reshape(-1, Cout)
    np.testing.assert_allclose(np.asarray(mean), rf.mean(0), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var), rf.var(0), rtol=1e-4, atol=1e-5)
