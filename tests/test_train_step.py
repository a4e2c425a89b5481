"""Train-step integration: loss decreases on a tiny overfit task; EMA/opt state sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov3_tpu.models.detection import DetectionModel
from yolov3_tpu.train.loss import LossConfig
from yolov3_tpu.train.optim import EMA, build_optimizer, build_schedules
from yolov3_tpu.train.step import init_train_state, make_train_step

SPEC = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
    "layers": [
        {"from": -1, "n": 1, "op": "Conv", "args": [8, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": [3, 4], "n": 1, "op": "Detect", "args": ["nc", "anchors"]},
    ],
}
HYP = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.9, "weight_decay": 0.0, "warmup_epochs": 0.0}


@pytest.fixture
def setup():
    # function-scoped: the train step donates its input state, so each test
    # needs a fresh state pytree
    model = DetectionModel.from_config(SPEC, imgsz=64)
    # batch_size=nbs=64 -> accumulate=1 (no MultiSteps wrapping) so every step applies
    tx, sch, _ = build_optimizer(
        "sgd", model.params, HYP, epochs=10, steps_per_epoch=10, batch_size=64, min_warmup_steps=0
    )
    loss_cfg = LossConfig.from_model(model.spec, HYP)
    step = make_train_step(model.module, loss_cfg, tx)
    state = init_train_state(model, tx)
    return model, step, state


def make_batch():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(2, 64, 64, 3), dtype=np.uint8)
    targets = np.zeros((2, 4, 5), np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    targets[:, 1] = [1, 0.25, 0.25, 0.2, 0.3]
    mask = np.zeros((2, 4), bool)
    mask[:, :2] = True
    return imgs, targets, mask


def test_loss_decreases_overfit(setup):
    model, step, state = setup
    imgs, targets, mask = make_batch()
    losses = []
    for _ in range(15):
        state, metrics = step(state, imgs, targets, mask)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0] * 0.9, f"no learning: {losses[0]:.4f} -> {losses[-1]:.4f}"
    assert int(state["step"]) == 15
    assert int(state["ema"]["updates"]) == 15


def test_ema_tracks_params(setup):
    model, step, state = setup
    imgs, targets, mask = make_batch()
    state, _ = step(state, imgs, targets, mask)
    # after 1 update with ramped decay ~0, EMA ~= params
    p = jax.tree.leaves(state["params"])[0]
    e = jax.tree.leaves(state["ema"]["ema"]["params"])[0]
    np.testing.assert_allclose(np.asarray(e), np.asarray(p), atol=1e-2)


def test_remat_step_matches_plain(setup):
    """remat=True (jax.checkpoint forward) is a pure memory/FLOPs trade —
    params, metrics, and batch_stats after one step must match the plain step."""
    model, step, state = setup
    imgs, targets, mask = make_batch()

    tx, _, _ = build_optimizer(
        "sgd", model.params, HYP, epochs=10, steps_per_epoch=10, batch_size=64, min_warmup_steps=0
    )
    loss_cfg = LossConfig.from_model(model.spec, HYP)
    step_r = make_train_step(model.module, loss_cfg, tx, remat=True)
    # the plain step donates its input state, whose buffers are shared with
    # model.variables — give the remat step an independent copy
    state_r = jax.tree.map(jnp.array, init_train_state(model, tx))

    # segmented remat must not change the param tree structure/naming
    remat_module = model.module.clone(remat=True)
    v_r = jax.jit(remat_module.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    assert jax.tree_util.tree_structure(v_r["params"]) == jax.tree_util.tree_structure(
        model.variables["params"]
    )

    state, metrics = step(state, imgs, targets, mask)
    state_r, metrics_r = step_r(state_r, imgs, targets, mask)
    assert np.allclose(float(metrics["loss"]), float(metrics_r["loss"]), rtol=1e-6)
    flat = jax.tree.leaves(state["params"])
    flat_r = jax.tree.leaves(state_r["params"])
    for a, b in zip(flat, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_warmup_schedules():
    sch = build_schedules(
        {"lr0": 0.01, "lrf": 0.01, "warmup_epochs": 2.0, "warmup_momentum": 0.8, "momentum": 0.937,
         "warmup_bias_lr": 0.1},
        epochs=10, steps_per_epoch=100, batch_size=16,
    )
    # warmup covers 200 steps
    assert float(sch.lr(0.0)) == 0.0
    assert float(sch.bias_lr(0.0)) == pytest.approx(0.1)
    assert float(sch.momentum(0.0)) == pytest.approx(0.8)
    assert float(sch.momentum(200.0)) == pytest.approx(0.937)
    # post-warmup: linear decay from lr0
    lr_mid = float(sch.lr(500.0))  # epoch 5
    expected = 0.01 * ((1 - 5 / 10) * (1 - 0.01) + 0.01)
    assert lr_mid == pytest.approx(expected, rel=1e-3)


def test_earlystopping():
    from yolov3_tpu.train.optim import EarlyStopping

    es = EarlyStopping(patience=3)
    assert not es(0, 0.5)
    assert not es(1, 0.4)
    assert not es(2, 0.4)
    assert es(3, 0.4)  # 3 epochs without improvement
    es2 = EarlyStopping(patience=3)
    assert not es2(0, 0.1)
    assert not es2(2, 0.2)  # improvement resets
    assert not es2(4, 0.3)


def test_freeze_layers():
    """freeze=[0] zeroes layer-0 updates while other layers train."""
    model = DetectionModel.from_config(SPEC, imgsz=64)
    tx, _, _ = build_optimizer(
        "sgd", model.params, HYP, epochs=10, steps_per_epoch=10, batch_size=64,
        min_warmup_steps=0, freeze=[0],
    )
    loss_cfg = LossConfig.from_model(model.spec, HYP)
    step = make_train_step(model.module, loss_cfg, tx)
    state = init_train_state(model, tx)
    p0_before = np.asarray(jax.tree.leaves(state["params"]["l0"])[0]).copy()
    p1_before = np.asarray(jax.tree.leaves(state["params"]["l1"])[0]).copy()
    imgs, targets, mask = make_batch()
    for _ in range(3):
        state, _ = step(state, imgs, targets, mask)
    p0_after = np.asarray(jax.tree.leaves(state["params"]["l0"])[0])
    p1_after = np.asarray(jax.tree.leaves(state["params"]["l1"])[0])
    np.testing.assert_array_equal(p0_before, p0_after)
    assert not np.allclose(p1_before, p1_after)


def test_autobalance_updates():
    """autobalance carries per-scale obj weights in state and renormalizes them."""
    import dataclasses

    model = DetectionModel.from_config(SPEC, imgsz=64)
    cfg = dataclasses.replace(LossConfig.from_model(model.spec, HYP), autobalance=True)
    tx, _, _ = build_optimizer("sgd", model.params, HYP, 10, 10, batch_size=64, min_warmup_steps=0)
    step = make_train_step(model.module, cfg, tx)
    state = init_train_state(model, tx, loss_cfg=cfg)
    b0 = np.asarray(state["balance"]).copy()
    imgs, targets, mask = make_batch()
    state, _ = step(state, imgs, targets, mask)
    b1 = np.asarray(state["balance"])
    assert b1.shape == b0.shape
    assert not np.allclose(b0, b1)
    # normalized by the stride-16 scale (index of stride 16 in SPEC strides)
    ssi = model.spec.strides.index(16)
    assert abs(b1[ssi] - 1.0) < 1e-5


def test_cos_lr_jit_traceable(setup):
    """cos_lr schedule must trace under jit (ADVICE r1: math.cos on a tracer crashed)."""
    model = DetectionModel.from_config(SPEC, imgsz=64)
    tx, sch, _ = build_optimizer(
        "sgd", model.params, HYP, epochs=10, steps_per_epoch=10, batch_size=64,
        min_warmup_steps=0, cos_lr=True,
    )
    loss_cfg = LossConfig.from_model(model.spec, HYP)
    step = make_train_step(model.module, loss_cfg, tx)
    state = init_train_state(model, tx)
    imgs, targets, mask = make_batch()
    state, metrics = step(state, imgs, targets, mask)  # would raise ConcretizationTypeError before
    assert np.isfinite(float(metrics["loss"]))
    # endpoint sanity: cosine decays from lr0 (just past warmup) to lr0*lrf
    assert float(sch.lr(1.0)) == pytest.approx(0.01, rel=1e-3)
    assert float(sch.lr(100.0)) == pytest.approx(0.01 * 0.01, rel=1e-3)


def test_grad_accumulation_matches_summed_step():
    """accumulate=k must reproduce the reference's summed-grad semantics
    (reference train.py:411-422): k micro-batch updates == one update on the
    summed gradient — NOT the k-times-smaller mean step optax.MultiSteps
    emits by default (ADVICE r1 high)."""
    import optax

    params = {"weight": jnp.ones((4,)), "bias": jnp.zeros((2,))}
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.9, "weight_decay": 0.0, "warmup_epochs": 0.0}
    grads = [
        {"weight": jnp.full((4,), g), "bias": jnp.full((2,), g / 2)} for g in (1.0, 2.0, 3.0, 4.0)
    ]

    # accumulate=4 path (batch_size=16, nbs=64)
    tx4, _, acc = build_optimizer(
        "sgd", params, hyp, epochs=10, steps_per_epoch=10, batch_size=16, min_warmup_steps=0
    )
    assert acc == 4
    st = tx4.init(params)
    p4 = params
    for g in grads:
        up, st = tx4.update(g, st, p4)
        p4 = optax.apply_updates(p4, up)

    # accumulate=1 path fed the SUM of the micro-batch grads
    tx1, _, acc1 = build_optimizer(
        "sgd", params, hyp, epochs=10, steps_per_epoch=10, batch_size=64, min_warmup_steps=0
    )
    assert acc1 == 1
    gsum = jax.tree.map(lambda *xs: sum(xs), *grads)
    st1 = tx1.init(params)
    up, st1 = tx1.update(gsum, st1, params)
    p1 = optax.apply_updates(params, up)

    for k in params:
        np.testing.assert_allclose(np.asarray(p4[k]), np.asarray(p1[k]), rtol=1e-6)


def test_accumulation_schedule_in_loader_steps():
    """With accumulate=k the warmup/decay schedules must advance k loader steps
    per optimizer update (ADVICE r1: warmup ran k x too long, decay 1/k)."""
    import optax

    params = {"weight": jnp.ones((4,))}
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.9, "weight_decay": 0.0,
           "warmup_epochs": 1.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.0}
    # 8 loader steps/epoch, accumulate 4 -> warmup nw = max(8, 100) = 100 loader steps
    tx, sch, acc = build_optimizer(
        "sgd", params, hyp, epochs=10, steps_per_epoch=8, batch_size=16
    )
    assert acc == 4
    st = tx.init(params)
    g = {"weight": jnp.full((4,), 1.0)}
    p = params
    deltas = []
    prev = np.asarray(p["weight"]).copy()
    for i in range(40):  # 40 loader steps = 10 optimizer updates
        up, st = tx.update(g, st, p)
        p = optax.apply_updates(p, up)
        cur = np.asarray(p["weight"]).copy()
        if (i + 1) % 4 == 0:
            deltas.append(float(np.abs(cur - prev).max()))
        prev = cur
    # during warmup the effective lr grows with the LOADER step -> update
    # magnitudes must increase across optimizer updates (they were constant-0
    # warmup-locked when schedules ran in optimizer steps with nw=100)
    assert deltas[0] < deltas[-1]
    # the 10th optimizer update sits at loader step 36 -> lr = 0.01*36/100 * ... > 0
    lr_expected = float(sch.lr(36.0))
    assert lr_expected > 0.001
