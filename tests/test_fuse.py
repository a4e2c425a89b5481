"""Conv+BN fusion: fused inference graph == unfused (eval mode) numerically."""

import numpy as np

import jax
import jax.numpy as jnp

from yolov3_tpu.models.detection import DetectionModel

SPEC = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
    "layers": [
        {"from": -1, "n": 1, "op": "Conv", "args": [8, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": -1, "n": 2, "op": "Bottleneck", "args": [16]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": -1, "n": 1, "op": "SPP", "args": [32, [3, 5]]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": [4, 5], "n": 1, "op": "Detect", "args": ["nc", "anchors"]},
    ],
}


def test_fused_matches_unfused(rng):
    model = DetectionModel.from_config(SPEC, imgsz=64)
    # randomize BN stats so the fold is non-trivial
    import flax

    flat = flax.traverse_util.flatten_dict(model.variables["batch_stats"])
    flat = {k: jnp.asarray(rng.uniform(0.5, 1.5, v.shape).astype(np.float32)) if k[-1] == "var"
            else jnp.asarray(rng.uniform(-0.5, 0.5, v.shape).astype(np.float32)) for k, v in flat.items()}
    variables = {"params": model.variables["params"], "batch_stats": flax.traverse_util.unflatten_dict(flat)}
    model = model.replace_variables(variables)

    fused = model.fuse()
    assert fused.fused
    assert not fused.variables["batch_stats"]

    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    f0 = model(x, train=False)
    f1 = fused(x, train=False)
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_fuse_param_count_drops_bn(rng):
    model = DetectionModel.from_config(SPEC, imgsz=64)
    fused = model.fuse()
    # fused adds a bias per conv and removes scale+bias per BN -> net decrease
    assert fused.num_params() < model.num_params()
    # double-fuse is a no-op
    assert fused.fuse() is fused


def test_fuse_composites_yolov5_style(rng):
    """fuse() must also fold the Convs NESTED inside composite modules (C3
    family, Focus, GhostBottleneck, BottleneckCSP) — a yolov5-style cfg loads
    per spec.py's contract; the standalone concat-BN in BottleneckCSP keeps
    its running stats (the reference folds only Conv.bn, yolo.py:163-172)."""
    spec = {
        "nc": 2,
        "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
        "layers": [
            {"from": -1, "n": 1, "op": "Focus", "args": [8, 3]},
            {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
            {"from": -1, "n": 1, "op": "C3", "args": [16]},
            {"from": -1, "n": 1, "op": "BottleneckCSP", "args": [16]},
            {"from": -1, "n": 1, "op": "GhostBottleneck", "args": [16]},
            {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
            {"from": [4, 5], "n": 1, "op": "Detect", "args": ["nc", "anchors"]},
        ],
    }
    model = DetectionModel.from_config(spec, imgsz=64)
    import flax

    flat = flax.traverse_util.flatten_dict(model.variables["batch_stats"])
    flat = {k: jnp.asarray(rng.uniform(0.5, 1.5, v.shape).astype(np.float32)) if k[-1] == "var"
            else jnp.asarray(rng.uniform(-0.5, 0.5, v.shape).astype(np.float32)) for k, v in flat.items()}
    variables = {"params": model.variables["params"], "batch_stats": flax.traverse_util.unflatten_dict(flat)}
    model = model.replace_variables(variables)

    fused = model.fuse()
    # the BottleneckCSP concat-BN's stats survive; every Conv bn is gone
    leftover = flax.traverse_util.flatten_dict(fused.variables["batch_stats"])
    assert leftover and all(k[-2] == "bn" for k in leftover)

    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    f0 = model(x, train=False)
    f1 = fused(x, train=False)
    for a, b in zip(f0, f1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)
