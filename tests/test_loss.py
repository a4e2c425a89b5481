"""Loss tests: vectorized JAX loss vs an independent loop-based numpy oracle.

The oracle below re-derives the YOLOv3 assignment rules target-by-target in
plain python loops (anchor ratio test, +-0.5 neighbor expansion, CIoU, BCE),
so agreement demonstrates the fixed-shape vectorization is faithful.
"""

import math

import numpy as np
import pytest

from yolov3_tpu.train.loss import LossConfig, assign_targets_layer, bce_with_logits, compute_loss, smooth_bce

NC = 4
ANCHORS_GRID = (((1.25, 1.625), (2.0, 3.75), (4.125, 2.875)), ((1.875, 3.8125), (3.875, 2.8125), (3.6875, 7.4375)))
STRIDES = (16, 32)


def make_cfg():
    return LossConfig(nc=NC, nl=2, na=3, anchors=ANCHORS_GRID, strides=STRIDES, box=0.05, obj=1.0, cls=0.5)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_bce(logit, target, pw=1.0):
    logp = -np.logaddexp(0, -logit)
    lognotp = -np.logaddexp(0, logit)
    return -(pw * target * logp + (1 - target) * lognotp)


def np_ciou(pbox, tbox, eps=1e-7):
    """CIoU for xywh boxes, scalar loop version."""
    px, py, pw, ph = pbox
    tx, ty, tw, th = tbox
    p1 = [px - pw / 2, py - ph / 2, px + pw / 2, py + ph / 2]
    t1 = [tx - tw / 2, ty - th / 2, tx + tw / 2, ty + th / 2]
    iw = max(0.0, min(p1[2], t1[2]) - max(p1[0], t1[0]))
    ih = max(0.0, min(p1[3], t1[3]) - max(p1[1], t1[1]))
    inter = iw * ih
    union = pw * ph + tw * th - inter + eps
    iou = inter / union
    cw = max(p1[2], t1[2]) - min(p1[0], t1[0])
    ch = max(p1[3], t1[3]) - min(p1[1], t1[1])
    c2 = cw**2 + ch**2 + eps
    rho2 = ((t1[0] + t1[2] - p1[0] - p1[2]) ** 2 + (t1[1] + t1[3] - p1[1] - p1[3]) ** 2) / 4
    v = (4 / math.pi**2) * (math.atan(tw / th) - math.atan(pw / ph)) ** 2
    alpha = v / (v - iou + 1 + eps)
    return iou - (rho2 / c2 + v * alpha)


def oracle_loss(feats, targets, mask, cfg):
    """Loop-based reference implementation of the YOLOv3 loss semantics."""
    bs = feats[0].shape[0]
    cp, cn = smooth_bce(cfg.label_smoothing)
    offsets = [(0.0, 0.0), (0.5, 0.0), (0.0, 0.5), (-0.5, 0.0), (0.0, -0.5)]
    lbox = lobj = lcls = 0.0
    for li, p in enumerate(feats):
        p = np.asarray(p, np.float64)
        _, na, ny, nx, no = p.shape
        anchors = np.array(cfg.anchors[li])
        matches = []  # (b, a, gj, gi, txy, twh, cls, anchor)
        for b in range(targets.shape[0]):
            for t in range(targets.shape[1]):
                if not mask[b, t]:
                    continue
                c, x, y, w, h = targets[b, t]
                gx, gy, gw, gh = x * nx, y * ny, w * nx, h * ny
                for a in range(na):
                    r = [gw / anchors[a][0], gh / anchors[a][1]]
                    if max(max(r[0], 1 / r[0]), max(r[1], 1 / r[1])) >= cfg.anchor_t:
                        continue
                    conds = [
                        True,
                        (gx % 1 < 0.5) and (gx > 1),
                        (gy % 1 < 0.5) and (gy > 1),
                        ((nx - gx) % 1 < 0.5) and ((nx - gx) > 1),
                        ((ny - gy) % 1 < 0.5) and ((ny - gy) > 1),
                    ]
                    for (ox, oy), ok in zip(offsets, conds):
                        if not ok:
                            continue
                        gi = int(np.clip(math.floor(gx - ox), 0, nx - 1))
                        gj = int(np.clip(math.floor(gy - oy), 0, ny - 1))
                        matches.append((b, a, gj, gi, (gx - gi, gy - gj), (gw, gh), int(c), anchors[a]))

        tobj = np.zeros((bs, na, ny, nx))
        if matches:
            ious = []
            cls_losses = []
            for b, a, gj, gi, txy, twh, c, anc in matches:
                ps = p[b, a, gj, gi]
                pxy = sigmoid(ps[:2]) * 2 - 0.5
                pwh = (sigmoid(ps[2:4]) * 2) ** 2 * anc
                iou = np_ciou((pxy[0], pxy[1], pwh[0], pwh[1]), (*txy, *twh))
                ious.append(iou)
                tobj[b, a, gj, gi] = max(tobj[b, a, gj, gi], max(iou, 0.0))
                tcl = np.full(cfg.nc, cn)
                tcl[c] = cp
                cls_losses.append(np_bce(ps[5:], tcl, cfg.cls_pw).mean())
            lbox += np.mean([1.0 - i for i in ious])
            lcls += np.mean(cls_losses)
        lobj += np_bce(p[..., 4], tobj, cfg.obj_pw).mean() * cfg.balance[li]

    lbox *= cfg.box
    lobj *= cfg.obj
    lcls *= cfg.cls
    return (lbox + lobj + lcls) * bs, np.array([lbox, lobj, lcls])


def random_inputs(rng, bs=2, m=8, sizes=((8, 8), (4, 4))):
    feats = [rng.normal(0, 1, size=(bs, 3, ny, nx, NC + 5)).astype(np.float32) for ny, nx in sizes]
    targets = np.zeros((bs, m, 5), np.float32)
    mask = np.zeros((bs, m), bool)
    for b in range(bs):
        n = rng.integers(1, m)
        targets[b, :n, 0] = rng.integers(0, NC, size=n)
        targets[b, :n, 1:3] = rng.uniform(0.1, 0.9, size=(n, 2))
        targets[b, :n, 3:5] = rng.uniform(0.05, 0.5, size=(n, 2))
        mask[b, :n] = True
    return feats, targets, mask


def test_loss_matches_oracle(rng):
    cfg = make_cfg()
    feats, targets, mask = random_inputs(rng)
    total, comps = compute_loss([np.asarray(f) for f in feats], targets, mask, cfg)
    o_total, o_comps = oracle_loss(feats, targets, mask, cfg)
    np.testing.assert_allclose(np.asarray(comps), o_comps, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(total), float(o_total), rtol=2e-4)


def test_loss_no_targets(rng):
    cfg = make_cfg()
    feats, targets, mask = random_inputs(rng)
    mask[:] = False
    total, comps = compute_loss(feats, targets, mask, cfg)
    o_total, o_comps = oracle_loss(feats, targets, mask, cfg)
    assert np.isfinite(float(total))
    np.testing.assert_allclose(np.asarray(comps)[1], o_comps[1], rtol=1e-4)
    assert float(comps[0]) == 0.0 and float(comps[2]) == 0.0


def test_loss_invariant_to_label_pad_width(rng):
    """Bucketed collate pads M to the batch (data/datasets.label_bucket); the
    loss must be exactly invariant to how much masked padding trails the real
    labels — gradients included."""
    import jax
    import jax.numpy as jnp

    cfg = make_cfg()
    feats, targets, mask = random_inputs(rng, m=8)
    wide_t = np.zeros((targets.shape[0], 300, 5), np.float32)
    wide_m = np.zeros((mask.shape[0], 300), bool)
    wide_t[:, :8], wide_m[:, :8] = targets, mask

    def f(feats, t, mk):
        return compute_loss(feats, t, mk, cfg)[0]

    jfeats = [jnp.asarray(x) for x in feats]
    l_narrow, g_narrow = jax.value_and_grad(f)(jfeats, targets, mask)
    l_wide, g_wide = jax.value_and_grad(f)(jfeats, wide_t, wide_m)
    np.testing.assert_allclose(float(l_narrow), float(l_wide), rtol=1e-6)
    for a, b in zip(g_narrow, g_wide):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_loss_is_differentiable(rng):
    import jax
    import jax.numpy as jnp

    cfg = make_cfg()
    feats, targets, mask = random_inputs(rng)

    def f(feats):
        return compute_loss(feats, targets, mask, cfg)[0]

    grads = jax.grad(f)([jnp.asarray(x) for x in feats])
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_bce_matches_torch(rng):
    torch = pytest.importorskip("torch")
    logits = rng.normal(size=(32,)).astype(np.float32)
    targets = rng.uniform(size=(32,)).astype(np.float32)
    ours = np.asarray(bce_with_logits(logits, targets, pos_weight=1.3))
    theirs = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([1.3]), reduction="none")(
        torch.from_numpy(logits), torch.from_numpy(targets)
    ).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)


def test_assignment_counts(rng):
    """Each valid target matching an anchor yields 1 center + up to 2 neighbor cells."""
    cfg = make_cfg()
    targets = np.zeros((1, 1, 5), np.float32)
    targets[0, 0] = [0, 0.53, 0.53, 0.2, 0.2]  # frac > 0.5 in both => right/bottom neighbors? no:
    # gx = 0.53*8 = 4.24 -> frac 0.24 < 0.5 and gx>1 => left neighbor; gy same => top neighbor
    mask = np.ones((1, 1), bool)
    anchors = np.array(cfg.anchors[0])
    out = assign_targets_layer(
        np.concatenate([np.zeros((1, 1)), targets[0]], axis=1).astype(np.float32),
        mask[0],
        anchors,
        8,
        8,
        cfg.anchor_t,
    )
    m = np.asarray(out["m"])  # (5, na, 1)
    # anchor 1 (2.0, 3.75): r = (1.6/2.0, 1.6/3.75) -> max ratio ~2.34 < 4 matches
    assert m[0].any()  # center always for matched anchors
    per_offset = m.sum(axis=(1, 2))
    assert per_offset[1] > 0  # left neighbor active
    assert per_offset[2] > 0  # top neighbor active
    assert per_offset[3] == 0 and per_offset[4] == 0


def test_loss_bf16_feats_exact_and_grads_close(rng):
    """bf16 head outputs: the loss upcasts AFTER gather/slice (train/loss.py)
    — the value must be bitwise what upcasting the whole grid first gives
    (cast commutes with gather/slice), and grads must track the f32 form."""
    import jax
    import jax.numpy as jnp

    cfg = make_cfg()
    feats, targets, mask = random_inputs(rng)
    feats_bf16 = [jnp.asarray(f, jnp.bfloat16) for f in feats]
    total_bf16, comps_bf16 = compute_loss(feats_bf16, targets, mask, cfg)
    total_up, comps_up = compute_loss([f.astype(jnp.float32) for f in feats_bf16], targets, mask, cfg)
    assert float(total_bf16) == float(total_up)
    np.testing.assert_array_equal(np.asarray(comps_bf16), np.asarray(comps_up))

    def f(feats):
        return compute_loss(feats, targets, mask, cfg)[0]

    g_bf16 = jax.grad(f)(feats_bf16)
    g_f32 = jax.grad(f)([f_.astype(jnp.float32) for f_ in feats_bf16])
    for gb, gf in zip(g_bf16, g_f32):
        assert gb.dtype == jnp.bfloat16  # cotangent matches the head dtype
        np.testing.assert_allclose(np.asarray(gb, np.float32), np.asarray(gf),
                                   rtol=0.02, atol=2e-4)
