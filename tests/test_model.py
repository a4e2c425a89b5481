"""Model graph tests: parse, param-count parity vs reference, output shapes, decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.models.detect_head import decode_predictions, make_grid
from yolov3_tpu.models.detection import DetectionModel
from yolov3_tpu.models.spec import parse_spec

# Param counts measured by instantiating the reference torch Model on each YAML
# (SURVEY.md §2.1): yolov3 61,949,149 / spp 63,011,165(≈63.00M) / tiny 8,852,366(≈8.85M).
REF_COUNTS = {"yolov3": 61.95e6, "yolov3-spp": 63.00e6, "yolov3-tiny": 8.85e6}
REF_STRIDES = {"yolov3": (8, 16, 32), "yolov3-spp": (8, 16, 32), "yolov3-tiny": (16, 32)}


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov3", "yolov3-spp"])
def test_spec_parses(name):
    spec = parse_spec(name)
    assert spec.nc == 80
    assert spec.strides == REF_STRIDES[name]
    assert spec.na == 3


def test_yolov3_save_list():
    # reference parse_model computes save [6, 8, 14, 15, 21, 22, 27] (SURVEY §2.1)
    spec = parse_spec("yolov3")
    assert set(spec.save) == {6, 8, 14, 15, 21, 22, 27}
    spec_t = parse_spec("yolov3-tiny")
    assert set(spec_t.save) == {8, 14, 15, 19}


@pytest.mark.parametrize("name", ["yolov3-tiny", "yolov3", "yolov3-spp"])
def test_param_count_parity(name):
    model = DetectionModel.from_config(name, imgsz=64)
    n = model.num_params()
    ref = REF_COUNTS[name]
    assert abs(n - ref) / ref < 0.001, f"{name}: {n} params vs reference {ref}"


def test_tiny_forward_shapes():
    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    x = jnp.zeros((1, 320, 320, 3))
    feats = model(x, train=False)
    assert len(feats) == 2
    assert feats[0].shape == (1, 3, 20, 20, 85)  # P4/16
    assert feats[1].shape == (1, 3, 10, 10, 85)  # P5/32
    decoded = decode_predictions(feats, model.anchors_px, model.spec.strides)
    assert decoded.shape == (1, 3 * (20 * 20 + 10 * 10), 85)


@pytest.mark.slow
def test_yolov3_inference_tensor_shape_parity():
    # (1, 25200, 85) at 640 (SURVEY §2.1)
    model = DetectionModel.from_config("yolov3", imgsz=64)
    x = jnp.zeros((1, 640, 640, 3))
    feats = model(x, train=False)
    decoded = decode_predictions(feats, model.anchors_px, model.spec.strides)
    assert decoded.shape == (1, 25200, 85)


def test_grid_offset():
    g = np.asarray(make_grid(2, 3))
    assert g.shape == (1, 1, 2, 3, 2)
    # cell (0,0) -> (-0.5, -0.5); cell (y=1, x=2) -> (1.5, 0.5)
    np.testing.assert_allclose(g[0, 0, 0, 0], [-0.5, -0.5])
    np.testing.assert_allclose(g[0, 0, 1, 2], [1.5, 0.5])


def test_decode_math():
    """Hand-check the decode: sigmoid(0)=0.5 => xy = (0.5*2 - 0.5 + cell)*stride, wh = anchor."""
    bs, na, ny, nx, nc = 1, 1, 2, 2, 1
    feats = [jnp.zeros((bs, na, ny, nx, nc + 5))]
    anchors = np.array([[[10.0, 20.0]]])  # (nl=1, na=1, 2)
    decoded = np.asarray(decode_predictions(feats, anchors, (8,)))
    assert decoded.shape == (1, 4, 6)
    # first cell (y=0,x=0): xy = (1.0 - 0.5 + 0)*8 = 4.0
    np.testing.assert_allclose(decoded[0, 0, :2], [4.0, 4.0], atol=1e-5)
    # wh = (0.5*2)^2 * anchor = anchor
    np.testing.assert_allclose(decoded[0, 0, 2:4], [10.0, 20.0], atol=1e-5)
    # obj/cls = sigmoid(0) = 0.5
    np.testing.assert_allclose(decoded[0, 0, 4:], [0.5, 0.5], atol=1e-6)
    # cell (y=0, x=1): x = (0.5 + 1)*8 = 12
    np.testing.assert_allclose(decoded[0, 1, :2], [12.0, 4.0], atol=1e-5)


def test_detect_bias_priors():
    """Detect conv biases carry the obj/cls priors (reference yolo.py:282-292)."""
    import math

    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    det = model.variables["params"]["l20"]
    b0 = np.asarray(det["m0"]["bias"]).reshape(3, 85)
    s = model.spec.strides[0]
    np.testing.assert_allclose(b0[:, 4], math.log(8 / (640 / s) ** 2), atol=1e-5)
    np.testing.assert_allclose(b0[:, 5], math.log(0.6 / (80 - 0.99999)), atol=1e-5)


def test_train_mode_updates_batch_stats():
    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    feats, mutated = model(x, train=True)
    assert "batch_stats" in mutated
    old = model.variables["batch_stats"]["l0"]["bn"]["mean"]
    new = mutated["batch_stats"]["l0"]["bn"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_reference_format_yaml_loads(tmp_path):
    """The parser accepts reference-style backbone/head YAMLs unchanged."""
    ref_style = {
        "nc": 2,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
        "backbone": [
            [-1, 1, "Conv", [16, 3, 1]],
            [-1, 1, "nn.MaxPool2d", [2, 2, 0]],
            [-1, 1, "Conv", [32, 3, 2]],
            [-1, 1, "Conv", [64, 3, 2]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 1, "Conv", [256, 3, 2]],
        ],
        "head": [
            [-1, 1, "Conv", [128, 1, 1]],
            [-1, 1, "nn.Upsample", ["None", 2, "nearest"]],
            [[-1, 4], 1, "Concat", [1]],
            [-1, 1, "Conv", [128, 3, 1]],
            [[9, 5], 1, "Detect", ["nc", "anchors"]],
        ],
    }
    spec = parse_spec(ref_style)
    assert spec.nc == 2
    assert spec.strides == (16, 32)
    model = DetectionModel.from_config(ref_style, imgsz=64)
    feats = model(jnp.zeros((1, 64, 64, 3)))
    assert feats[0].shape == (1, 3, 4, 4, 7)


def test_width_depth_multiples():
    cfg = {
        "nc": 80,
        "depth_multiple": 0.33,
        "width_multiple": 0.5,
        "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
        "layers": [
            {"from": -1, "n": 1, "op": "Conv", "args": [64, 3, 2]},
            {"from": -1, "n": 1, "op": "Conv", "args": [128, 3, 2]},
            {"from": -1, "n": 9, "op": "Bottleneck", "args": [128]},
            {"from": -1, "n": 1, "op": "Conv", "args": [256, 3, 2]},
            {"from": -1, "n": 1, "op": "Conv", "args": [256, 3, 2]},
            {"from": -1, "n": 1, "op": "Conv", "args": [256, 3, 1]},
            {"from": [3, 5], "n": 1, "op": "Detect", "args": ["nc", "anchors"]},
        ],
    }
    spec = parse_spec(cfg)
    assert spec.layers[0].c2 == 32  # 64 * 0.5
    assert spec.layers[2].n == 3  # round(9 * 0.33)


def test_activation_override_scoped_to_model():
    """A cfg's `activation:` override applies to THAT model only (reference
    yolo.py:313 sets Conv.default_act per parse) — tracing it must not leak
    the process default into later models."""
    import jax.numpy as jnp

    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.models.spec import parse_spec
    from yolov3_tpu.nn.activations import _DEFAULT_ACT, silu

    layers = [
        {"from": -1, "n": 1, "op": "Conv", "args": [8, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": [1], "n": 1, "op": "Detect", "args": ["nc", "anchors"]},
    ]
    cfg = {"nc": 1, "anchors": [[10, 10, 20, 20, 30, 30]], "layers": layers}
    m_relu = DetectionModel.from_config({**cfg, "activation": "relu"}, nc=1, imgsz=64)
    assert _DEFAULT_ACT[0] is silu  # tracing the override did not leak
    x = np.random.default_rng(0).normal(0, 50, (1, 64, 64, 3)).astype(np.float32)
    out_relu = np.asarray(m_relu.predict(x)[0])
    assert _DEFAULT_ACT[0] is silu
    # same weights through a plain-SiLU graph must differ (the override APPLIED)
    m_plain = DetectionModel(parse_spec(cfg, nc=1), m_relu.variables, jnp.float32)
    out_plain = np.asarray(m_plain.predict(x)[0])
    assert _DEFAULT_ACT[0] is silu
    assert not np.allclose(out_relu, out_plain)


# Kernel/stride/pad combos the shipped configs actually use: SPP k5/9/13 s1
# p=k//2, SPPF k5 s1 p2, tiny's plain k2 s2 and the ZeroPad+k2 s1 trick,
# plus a strided+padded case and odd spatial dims (ADVICE r3).
@pytest.mark.parametrize(
    "k,s,p,hw",
    [(5, 1, 2, 16), (9, 1, 4, 16), (13, 1, 6, 16), (2, 2, 0, 16),
     (2, 1, 0, 17), (3, 2, 1, 15), (5, 1, 2, 13)],
)
def test_max_pool2d_matches_reduce_window(k, s, p, hw):
    """Forward bit-identity of the separable shifted-slice pool vs
    lax.reduce_window (torch MaxPool2d semantics: -inf padding), and
    gradient-mass preservation (per-element grads on tie-free random input
    must match too — ties are measure-zero there)."""
    from yolov3_tpu.nn.modules import max_pool2d

    x = np.random.default_rng(k * 100 + s * 10 + p).normal(size=(2, hw, hw, 4)).astype(np.float32)

    def ref_pool(y):
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1),
            [(0, 0), (p, p), (p, p), (0, 0)],
        )

    ours = np.asarray(max_pool2d(jnp.asarray(x), k, s, p))
    ref = np.asarray(ref_pool(jnp.asarray(x)))
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)

    # grads: tie-free random input -> elementwise equality with reduce_window
    g_ours = np.asarray(jax.grad(lambda y: jnp.sum(max_pool2d(y, k, s, p) ** 2))(jnp.asarray(x)))
    g_ref = np.asarray(jax.grad(lambda y: jnp.sum(ref_pool(y) ** 2))(jnp.asarray(x)))
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-5, atol=1e-6)

    # tied (constant) input: per-element routing differs by design
    # (jnp.maximum splits subgradients) but total gradient mass is preserved
    xc = jnp.ones_like(jnp.asarray(x))
    gm_ours = float(jnp.sum(jax.grad(lambda y: jnp.sum(max_pool2d(y, k, s, p)))(xc)))
    gm_ref = float(jnp.sum(jax.grad(lambda y: jnp.sum(ref_pool(y)))(xc)))
    assert abs(gm_ours - gm_ref) < 1e-3


def test_max_pool2d_int_dtype_forward():
    """Int input pads with iinfo.min instead of -inf (forward-only path)."""
    from yolov3_tpu.nn.modules import max_pool2d

    x = np.random.default_rng(7).integers(-50, 50, size=(1, 8, 8, 3), dtype=np.int32)
    ref = jax.lax.reduce_window(
        jnp.asarray(x), jnp.iinfo(jnp.int32).min, jax.lax.max,
        (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    np.testing.assert_array_equal(np.asarray(max_pool2d(jnp.asarray(x), 3, 1, 1)), np.asarray(ref))
