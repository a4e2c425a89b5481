"""Space-to-depth stem (s2d_stem): exact-parity transform of the darknet stem.

The TPU problem (docs/PERF.md): the 32-channel full-resolution stem activation
(bf16[B,1280,1280,32]) is lane-padded 4x to 128 by XLA, blowing the HBM budget
at bs16@1280. s2d_stem re-expresses [Conv(32,3,1), Conv(64,3,2)] so the wide
low-channel tensor is never materialized: the first conv emits space-to-depth
layout (B,H/2,W/2,128) — exactly 128 lanes — and the second consumes it via a
scattered 2x2 kernel. Same parameter tree, mathematically the same function
(precedent for the layout trick: reference models/common.py:413-421 Focus).

Round 3 extends this to the full l0..l3 REGION on darknet stems (yolov3/spp):
l1 emits s2d-of-320 (the "down" mode), the l2 Bottleneck runs grouped-1x1 +
scattered-3x3 entirely in s2d layout, and l3's "in" mode returns to standard
layout — every activation in the region carries >=128 lanes. The fixture here
engages the region automatically, so all parity assertions below cover it.

These tests pin exactness against the plain stem on shared weights: eval
forward, train forward incl. BatchNorm batch-stats updates, fused (BN-folded)
inference, and gradients.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov3_tpu.models.detection import DetectionModel


@pytest.fixture(scope="module")
def pair():
    plain = DetectionModel.from_config("yolov3", imgsz=64)
    s2d = DetectionModel(plain.spec, plain.variables, s2d_stem=True)
    return plain, s2d


def _x(bs=2, size=64, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 255, (bs, size, size, 3), np.uint8)).astype(jnp.float32) / 255.0


def test_identical_param_tree_and_init(pair):
    plain, _ = pair
    s2d_fresh = DetectionModel.from_config("yolov3", imgsz=64, s2d_stem=True)
    # same tree structure AND same initial values (same rng paths)
    ref_leaves = jax.tree_util.tree_leaves_with_path(plain.variables)
    new_leaves = jax.tree_util.tree_leaves_with_path(s2d_fresh.variables)
    assert [p for p, _ in ref_leaves] == [p for p, _ in new_leaves]
    for (_, a), (_, b) in zip(ref_leaves, new_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_eval_forward_parity(pair):
    plain, s2d = pair
    x = _x()
    f_plain = plain.module.apply(plain.variables, x, train=False)
    f_s2d = s2d.module.apply(s2d.variables, x, train=False)
    for a, b in zip(f_plain, f_s2d):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-4)


def test_train_forward_and_bn_stats_parity(pair):
    plain, s2d = pair
    x = _x(seed=1)
    f_p, mut_p = plain.module.apply(plain.variables, x, train=True, mutable=["batch_stats"])
    f_s, mut_s = s2d.module.apply(s2d.variables, x, train=True, mutable=["batch_stats"])
    for a, b in zip(f_p, f_s):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-4, rtol=1e-4)
    # the stem layers' updated running stats must agree (the grouped BN reduces
    # over (batch, space, offset) == the plain BN's (batch, space) population)
    for layer in ("l0", "l1", ("l2", "cv1"), ("l2", "cv2"), "l3"):
        for stat in ("mean", "var"):
            bp, bs = mut_p["batch_stats"], mut_s["batch_stats"]
            if isinstance(layer, tuple):
                a, b = bp[layer[0]][layer[1]]["bn"][stat], bs[layer[0]][layer[1]]["bn"][stat]
            else:
                a, b = bp[layer]["bn"][stat], bs[layer]["bn"][stat]
            np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5, rtol=1e-4)


def test_fused_forward_parity(pair):
    plain, s2d = pair
    x = _x(seed=2)
    fp = plain.fuse()
    fs = s2d.fuse()
    assert fs.s2d_stem and fs.fused
    a = fp.module.apply(fp.variables, x, train=False)
    b = fs.module.apply(fs.variables, x, train=False)
    for fa, fb in zip(a, b):
        np.testing.assert_allclose(np.asarray(fb), np.asarray(fa), atol=2e-4, rtol=1e-4)


def test_gradient_parity(pair):
    plain, s2d = pair
    x = _x(bs=1, seed=3)

    def loss(params, model):
        vs = {"params": params, "batch_stats": model.variables["batch_stats"]}
        feats = model.module.apply(vs, x, train=False)
        return sum(jnp.sum(jnp.square(f.astype(jnp.float32))) for f in feats)

    g_p = jax.grad(loss)(plain.params, plain)
    g_s = jax.grad(loss)(s2d.params, s2d)
    # every transformed layer of the s2d region; downstream grads follow from fwd parity
    for ga, gb in (
        (g_p["l0"]["conv"], g_s["l0"]["conv"]),
        (g_p["l1"]["conv"], g_s["l1"]["conv"]),
        (g_p["l2"]["cv1"]["conv"], g_s["l2"]["cv1"]["conv"]),
        (g_p["l2"]["cv2"]["conv"], g_s["l2"]["cv2"]["conv"]),
        (g_p["l3"]["conv"], g_s["l3"]["conv"]),
    ):
        np.testing.assert_allclose(
            np.asarray(gb["kernel"]), np.asarray(ga["kernel"]),
            atol=5e-2, rtol=1e-3,  # large-magnitude sums: relative agreement is what matters
        )


def test_rejects_incompatible_stem():
    with pytest.raises(ValueError):
        DetectionModel.from_config("yolov3-tiny", imgsz=64, s2d_stem=True)


def test_serve_auto_s2d_rule(pair):
    """serve.build_pipeline engages the s2d stem exactly for small-bucket
    fast pipelines on eligible archs (the measured latency-win regime)."""
    from yolov3_tpu.serve import build_pipeline

    plain, _ = pair
    on = build_pipeline(plain, imgsz=640, max_batch=8, fast=True)
    assert on.batcher.infer.s2d is True
    off_big = build_pipeline(plain, imgsz=640, max_batch=64, fast=True)
    assert off_big.batcher.infer.s2d is False
    off_slow = build_pipeline(plain, imgsz=640, max_batch=8, fast=False)
    assert getattr(off_slow.batcher.infer, "s2d", False) is False
    tiny = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    off_arch = build_pipeline(tiny, imgsz=640, max_batch=8, fast=True)
    assert off_arch.batcher.infer.s2d is False
