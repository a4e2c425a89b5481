"""Fused per-scale top-k decode must match the full decode + NMS pipeline.

The fast serving path (decode_topk_candidates -> nms_from_candidates) is a
pure re-ordering of the same math as decode_predictions -> batched_nms at
single-label settings; whenever the per-scale candidate count fits in k,
the final detections must be identical (reference semantics:
utils/general.py:630-750 at speed-task thresholds, val.py:605-609).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov3_tpu.models.detect_head import decode_predictions, decode_topk_candidates
from yolov3_tpu.ops.nms import batched_nms, nms_from_candidates

ANCHORS = np.array(
    [[[10, 13], [16, 30], [33, 23]], [[30, 61], [62, 45], [59, 119]], [[116, 90], [156, 198], [373, 326]]],
    np.float32,
)
STRIDES = (8, 16, 32)


def make_feats(bs=2, nc=80, sizes=((16, 16), (8, 8), (4, 4)), seed=0, obj_bias=-2.0):
    """Raw head outputs with a few strong candidates per image."""
    rng = np.random.default_rng(seed)
    feats = []
    for ny, nx in sizes:
        f = rng.normal(-4.0, 1.0, size=(bs, 3, ny, nx, nc + 5)).astype(np.float32)
        # plant some confident detections: obj and one class pushed high
        for b in range(bs):
            for _ in range(5):
                a, y, x = rng.integers(0, 3), rng.integers(0, ny), rng.integers(0, nx)
                f[b, a, y, x, 4] = rng.uniform(1.0, 4.0)
                f[b, a, y, x, 5 + rng.integers(0, nc)] = rng.uniform(2.0, 5.0)
        feats.append(jnp.asarray(f))
    return feats


@pytest.mark.parametrize("conf", [0.25, 0.1])
def test_fused_topk_matches_full_pipeline(conf):
    feats = make_feats()
    pred = decode_predictions(feats, ANCHORS, STRIDES)
    ref_out, ref_n = batched_nms(pred, conf_thres=conf, iou_thres=0.45, max_det=100, max_nms=4096)

    boxes, scores, cls_ids = decode_topk_candidates(
        feats, ANCHORS, STRIDES, k_per_scale=(128, 64, 32), conf_thres=conf
    )
    out, n = nms_from_candidates(boxes, scores, cls_ids, iou_thres=0.45, max_det=100)

    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref_n))
    for b in range(out.shape[0]):
        nb = int(n[b])
        np.testing.assert_allclose(
            np.asarray(out[b, :nb]), np.asarray(ref_out[b, :nb]), rtol=1e-5, atol=1e-4
        )


def test_fused_topk_candidate_scores():
    """Scores/classes of extracted candidates match the decoded tensor's obj*cls."""
    feats = make_feats(bs=1)
    pred = np.asarray(decode_predictions(feats, ANCHORS, STRIDES))[0]  # (N, 85)
    conf_full = pred[:, 4:5] * pred[:, 5:]
    best = conf_full.max(1)
    order = np.argsort(-best)

    boxes, scores, cls_ids = decode_topk_candidates(
        feats, ANCHORS, STRIDES, k_per_scale=(128, 64, 32), conf_thres=0.25
    )
    scores = np.asarray(scores[0])
    got = np.sort(scores[scores > 0])[::-1]
    want = np.sort(best[(best > 0.25) & (pred[:, 4] > 0.25)])[::-1]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fused_topk_empty():
    """No candidate above threshold -> zero detections, no crash."""
    rng = np.random.default_rng(1)
    feats = [
        jnp.asarray(rng.normal(-8.0, 0.5, size=(2, 3, ny, nx, 85)).astype(np.float32))
        for ny, nx in ((16, 16), (8, 8), (4, 4))
    ]
    boxes, scores, cls_ids = decode_topk_candidates(feats, ANCHORS, STRIDES, conf_thres=0.25)
    out, n = nms_from_candidates(boxes, scores, cls_ids)
    assert int(np.asarray(n).sum()) == 0
    assert np.asarray(out).shape == (2, 300, 6)


def test_nhwc_raw_head_matches_transposed():
    """Detect(raw=True) + decode_topk_nhwc == transposed head + decode_topk_candidates."""
    from yolov3_tpu.models.detect_head import decode_topk_nhwc
    from yolov3_tpu.models.detection import DetectionModel

    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    ).astype(jnp.float32) / 255.0

    feats = model.module.apply(model.variables, x, train=False)
    raw = model.serving_module().apply(model.variables, x, train=False)

    anchors, strides = model.anchors_px, model.spec.strides
    # plant nothing: random-init outputs exercise the full index math at a low threshold
    b1, s1, c1 = decode_topk_candidates(feats, anchors, strides, (64, 32), conf_thres=0.001)
    b2, s2, c2 = decode_topk_nhwc(raw, anchors, strides, (64, 32), conf_thres=0.001)

    # same candidate SET (top-k order may differ on distinct scales' ties):
    # compare sorted by score
    for bi in range(2):
        v1 = np.asarray(s1[bi]); v2 = np.asarray(s2[bi])
        k1 = v1 > 0; k2 = v2 > 0
        assert k1.sum() == k2.sum()
        o1 = np.argsort(-v1[k1]); o2 = np.argsort(-v2[k2])
        np.testing.assert_allclose(v1[k1][o1], v2[k2][o2], rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(b1[bi])[k1][o1], np.asarray(b2[bi])[k2][o2], rtol=1e-4, atol=1e-3
        )
        np.testing.assert_array_equal(np.asarray(c1[bi])[k1][o1], np.asarray(c2[bi])[k2][o2])


def test_overflow_flag_dense_scene_80x80():
    """A crowded frame at 640-scale grids (80x80, the case the fast path was
    never tested at): when the above-conf candidate count exceeds k the decode
    must raise its overflow flag instead of silently truncating."""
    from yolov3_tpu.models.detect_head import decode_topk_nhwc

    rng = np.random.default_rng(0)
    nc, na = 80, 3
    raw = rng.normal(-8.0, 0.5, size=(2, 80, 80, na * (nc + 5))).astype(np.float32)
    # image 0: 400 confident cells (> k=256); image 1: 20 (< k)
    flat = raw.reshape(2, -1, nc + 5)
    for b, count in [(0, 400), (1, 20)]:
        idx = rng.choice(flat.shape[1], size=count, replace=False)
        flat[b, idx, 4] = 4.0
        flat[b, idx, 5 + rng.integers(0, nc)] = 5.0
    feats = [jnp.asarray(raw)]
    anchors = ANCHORS[:1]
    b_, s_, c_, ov = decode_topk_nhwc(feats, anchors, STRIDES[:1], k_per_scale=(256,),
                                      conf_thres=0.25, with_overflow=True)
    ov = np.asarray(ov)
    assert ov[0] and not ov[1]
    # transposed-layout variant agrees
    t = jnp.asarray(raw.reshape(2, 80, 80, na, nc + 5).transpose(0, 3, 1, 2, 4))
    _, _, _, ov2 = decode_topk_candidates([t], anchors, STRIDES[:1], k_per_scale=(256,),
                                          conf_thres=0.25, with_overflow=True)
    np.testing.assert_array_equal(np.asarray(ov2), ov)
    # the no-overflow image's candidates are complete (score parity vs full decode)
    pred = np.asarray(decode_predictions([t], anchors, STRIDES[:1]))[1]
    best = (pred[:, 4:5] * pred[:, 5:]).max(1)
    want = np.sort(best[(best > 0.25) & (pred[:, 4] > 0.25)])[::-1]
    got = np.asarray(s_[1])
    got = np.sort(got[got > 0])[::-1]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_serve_fast_path_falls_back_on_overflow(micro_model_or_tiny=None):
    """build_batched_infer(fast=True) must detect top-k truncation and re-run
    the batch through the exact full pipeline — no silent detection drops."""
    from yolov3_tpu.models.detection import DetectionModel
    from yolov3_tpu.serve import build_batched_infer

    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)

    def bump(path, v):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return v + 6.0 if ("bias" in name and ("m0" in name or "m1" in name)) else v

    model = model.replace_variables({
        "params": jax.tree_util.tree_map_with_path(bump, model.variables["params"]),
        "batch_stats": model.variables["batch_stats"],
    })
    imgs = np.random.default_rng(2).integers(0, 255, (2, 64, 64, 3), np.uint8)

    # tiny k forces overflow on the bumped model (4x4 and 2x2 grids at 64px)
    infer = build_batched_infer(model, conf_thres=0.01, fast=True, k_per_scale=(4, 2))
    d_fast, meta = infer.fast_jit(imgs)  # unsharded packs (n..., overflow_any)
    n_fast = np.asarray(meta)[:-1]
    assert bool(np.asarray(meta)[-1]), "test setup must actually overflow"
    dets, n = infer(imgs)  # wrapper should take the fallback
    d_full, n_full = infer.full_jit(imgs)
    np.testing.assert_array_equal(np.asarray(n), np.asarray(n_full))
    for b in range(2):
        nb = int(np.asarray(n)[b])
        np.testing.assert_allclose(np.asarray(dets[b, :nb]), np.asarray(d_full[b, :nb]),
                                   rtol=1e-4, atol=1e-3)
    # and the fallback genuinely recovered rows the truncated path lost
    assert np.asarray(n_full).sum() > np.asarray(n_fast).sum()

    # sparse scene: no overflow, wrapper returns the fast result
    infer2 = build_batched_infer(model, conf_thres=0.01, fast=True, k_per_scale=(48, 12))
    d2, meta2 = infer2.fast_jit(imgs)
    assert not bool(np.asarray(meta2)[-1])
    dets2, nn2 = infer2(imgs)
    np.testing.assert_array_equal(np.asarray(nn2), np.asarray(meta2)[:-1])


def test_bench_pipeline_matches_reference_path():
    """The exact bench.py fast path (raw head + nhwc decode + candidate NMS)
    must produce the same detections as the validated full pipeline."""
    from yolov3_tpu.models.detect_head import decode_topk_nhwc
    from yolov3_tpu.models.detection import DetectionModel

    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    # bias the head so some detections clear conf 0.25
    import jax as _jax

    def bump(path, v):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "bias" in name and ("m0" in name or "m1" in name):
            return v + 2.0
        return v

    variables = {
        "params": _jax.tree_util.tree_map_with_path(bump, model.variables["params"]),
        "batch_stats": model.variables["batch_stats"],
    }
    model = model.replace_variables(variables)
    x = jnp.asarray(np.random.default_rng(1).integers(0, 255, (2, 64, 64, 3), np.uint8))
    xf = x.astype(jnp.float32) / 255.0

    pred, _ = model.predict(xf)
    ref_out, ref_n = batched_nms(pred, conf_thres=0.25, iou_thres=0.45, max_det=300, max_nms=4096)

    raw = model.serving_module().apply(model.variables, xf, train=False)
    boxes, scores, cls_ids = decode_topk_nhwc(raw, model.anchors_px, model.spec.strides, (256, 128), 0.25)
    out, n = nms_from_candidates(boxes, scores, cls_ids, 0.45, 300)

    np.testing.assert_array_equal(np.asarray(n), np.asarray(ref_n))
    for b in range(2):
        nb = int(n[b])
        np.testing.assert_allclose(np.asarray(out[b, :nb]), np.asarray(ref_out[b, :nb]), rtol=1e-4, atol=1e-3)


def test_pallas_score_decode_matches_xla_decode():
    """decode_topk_nhwc(use_pallas="interpret") yields the SAME candidate set
    (box, score, cls, overflow) as the XLA path — only the flat candidate
    order (a,y,x vs y,x,a) may differ, so compare as sets keyed by score with
    tie groups compared as multisets."""
    from yolov3_tpu.models.detect_head import decode_topk_nhwc

    rng = np.random.default_rng(3)
    anchors = np.array([[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119]],
                       np.float32).reshape(2, 3, 2)
    strides = (8.0, 16.0)
    feats = []
    for ny, nx in [(24, 24), (12, 12)]:  # M=576 > R=512 exercises the partial block
        x = rng.normal(0, 1, (2, ny, nx, 255)).astype(np.float32)
        x[..., 4::85] -= 4.0
        hot = rng.random((2, ny, nx, 3)) < 0.03
        xo = x[..., 4::85]
        xo[hot] += 8.0
        x[..., 4::85] = xo
        feats.append(jnp.asarray(x, jnp.bfloat16))

    ref = decode_topk_nhwc(feats, anchors, strides, (64, 32), 0.25, with_overflow=True)
    pal = decode_topk_nhwc(feats, anchors, strides, (64, 32), 0.25, with_overflow=True,
                           use_pallas="interpret")
    rb, rs, rc, rov = [np.asarray(a) for a in ref]
    pb, ps, pc, pov = [np.asarray(a) for a in pal]
    np.testing.assert_array_equal(rov, pov)
    for b in range(2):
        vr, vp = rs[b] > 0, ps[b] > 0
        assert vr.sum() == vp.sum() > 0
        refset = sorted((float(s), *np.round(bx, 3), float(c))
                        for s, bx, c in zip(rs[b][vr], rb[b][vr], rc[b][vr]))
        palset = sorted((float(s), *np.round(bx, 3), float(c))
                        for s, bx, c in zip(ps[b][vp], pb[b][vp], pc[b][vp]))
        assert refset == palset


def test_padded_head_decode_matches_default_path():
    """serving_module(pad_lanes=128) + decode_topk_nhwc(padded_lanes=128) must
    yield the same candidate set (boxes/scores/classes/overflow) as the
    default raw path — the padded layout (Detect.raw_pad) is a pure TPU
    layout change sharing the SAME variables."""
    from yolov3_tpu.models.detect_head import decode_topk_nhwc
    from yolov3_tpu.models.detection import DetectionModel

    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)

    def bump(path, v):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        return v + 6.0 if ("bias" in name and ("m0" in name or "m1" in name)) else v

    model = model.replace_variables({
        "params": jax.tree_util.tree_map_with_path(bump, model.variables["params"]),
        "batch_stats": model.variables["batch_stats"],
    })
    x = jnp.asarray(np.random.default_rng(7).integers(0, 255, (2, 64, 64, 3), np.uint8))
    xf = x.astype(jnp.float32) / 255.0

    raw = model.serving_module().apply(model.variables, xf, train=False)
    padded = model.serving_module(pad_lanes=128).apply(model.variables, xf, train=False)
    for r, p in zip(raw, padded):
        assert p.shape[-1] == 3 * 128 and r.shape[:-1] == p.shape[:-1]

    anchors, strides = model.anchors_px, model.spec.strides
    ref = decode_topk_nhwc(raw, anchors, strides, (16, 8), 0.05, with_overflow=True)
    pad = decode_topk_nhwc(padded, anchors, strides, (16, 8), 0.05, with_overflow=True,
                           padded_lanes=128)
    rb, rs, rc, rov = [np.asarray(a) for a in ref]
    pb, ps, pc, pov = [np.asarray(a) for a in pad]
    np.testing.assert_array_equal(rov, pov)
    for b in range(2):
        vr, vp = rs[b] > 0, ps[b] > 0
        assert vr.sum() == vp.sum() > 0
        o1, o2 = np.argsort(-rs[b][vr]), np.argsort(-ps[b][vp])
        np.testing.assert_allclose(rs[b][vr][o1], ps[b][vp][o2], rtol=1e-5)
        np.testing.assert_allclose(rb[b][vr][o1], pb[b][vp][o2], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(rc[b][vr][o1], pc[b][vp][o2])


def test_padded_head_overflow_and_dense_scene():
    """Padded-layout decode raises the same overflow flag on a dense scene
    and keeps exact score parity on the sparse image (mirrors
    test_overflow_flag_dense_scene_80x80 through the padded route)."""
    from yolov3_tpu.models.detect_head import decode_topk_nhwc

    rng = np.random.default_rng(0)
    nc, na, pad = 80, 3, 128
    raw = rng.normal(-8.0, 0.5, size=(2, 80, 80, na * (nc + 5))).astype(np.float32)
    flat = raw.reshape(2, -1, nc + 5)
    for b, count in [(0, 400), (1, 20)]:
        idx = rng.choice(flat.shape[1], size=count, replace=False)
        flat[b, idx, 4] = 4.0
        flat[b, idx, 5 + rng.integers(0, nc)] = 5.0
    padded = np.full((2, 80, 80, na * pad), -20.0, np.float32)
    for a in range(na):
        padded[..., a * pad : a * pad + nc + 5] = raw[..., a * (nc + 5) : (a + 1) * (nc + 5)]

    anchors = ANCHORS[:1]
    ref = decode_topk_nhwc([jnp.asarray(raw)], anchors, STRIDES[:1], (256,), 0.25,
                           with_overflow=True)
    got = decode_topk_nhwc([jnp.asarray(padded)], anchors, STRIDES[:1], (256,), 0.25,
                           with_overflow=True, padded_lanes=pad)
    np.testing.assert_array_equal(np.asarray(ref[3]), np.asarray(got[3]))
    assert np.asarray(got[3])[0] and not np.asarray(got[3])[1]
    rs, gs = np.asarray(ref[1][1]), np.asarray(got[1][1])
    np.testing.assert_allclose(np.sort(rs[rs > 0]), np.sort(gs[gs > 0]), rtol=1e-5)
