"""Multi-step training-trajectory parity vs the torch reference (VERDICT r3 #2).

Single-step tests (loss parity, AdamW-vs-torch) cannot catch drift in the
*composition*: optimizer momentum buffers, warmup lr/momentum interpolation,
the epoch-boundary LambdaLR step, EMA's ramped decay, and BatchNorm
running-stat evolution. This test drives the reference's exact hot loop
(reference train.py:377-439: warmup interp at train.py:383-391, clip 10.0 +
SGD(nesterov, 3 groups) at train.py:417-425, ModelEMA after each step,
scheduler.step() per epoch at train.py:439) for 24 steps on fixed identical
batches, and runs our jitted train step from a converted identical init.

Asserted:
  - per-step total-loss curves agree;
  - final params agree leaf-wise (after 24 SGD updates);
  - final EMA tree agrees (ramped decay d = 0.9999*(1-exp(-k/2000)));
  - final BatchNorm running mean/var agree (torch stores Bessel-corrected
    variance — matched by nn/modules.TorchBatchNorm).

Config: yolov3-tiny @ 160px, B=2, nbs=batch_size (accumulate=1 — the
accumulation schedule has its own test, test_train_step.py:239), nw=12 so the
trajectory crosses warmup -> steady-state and 6 epoch boundaries (the
reference's floor of 100 warmup iters is a constant, not a formula; both
sides here use the same nw).
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
import ultralytics_shim as shim  # noqa: E402

shim.add_reference_to_path()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolov3_tpu.models.convert import convert_torch_checkpoint  # noqa: E402
from yolov3_tpu.models.detection import DetectionModel  # noqa: E402

HYP = {
    "box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0, "obj_pw": 1.0,
    "label_smoothing": 0.0, "fl_gamma": 0.0, "anchor_t": 4.0,
    # lr0/warmup_bias_lr reduced from the preset (0.01/0.1): SGD on a random
    # init is chaotic — float-level cross-framework diffs (~1e-5 after one
    # step) amplify ~1.4x/step at lr 0.01 and hit 3% of loss by step 20, which
    # would test the Lyapunov exponent, not the formulas. At lr 0.003 the same
    # 24 steps stay within 1% everywhere. Same code paths, same interpolations.
    "lr0": 0.003, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 3.0, "warmup_momentum": 0.8, "warmup_bias_lr": 0.02,
}

B, SIZE, M = 2, 160, 2
STEPS, NB, EPOCHS = 24, 4, 6  # 6 epochs of 4 batches
NW = 12  # warmup iters: steps 0..11 interpolate, 12..23 run the epoch schedule


def _batches(seed=11, n=3):
    """n fixed batches of rectangles-on-gray (cycled; augment off)."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        imgs = np.full((B, SIZE, SIZE, 3), 114, np.uint8)
        boxes = np.zeros((B, M, 5), np.float32)
        for b in range(B):
            for m in range(M):
                cls = int(rng.integers(0, 80))
                w, h = int(rng.integers(40, 90)), int(rng.integers(40, 90))
                x1 = int(rng.integers(0, SIZE - w))
                y1 = int(rng.integers(0, SIZE - h))
                imgs[b, y1:y1 + h, x1:x1 + w] = rng.integers(0, 255, 3)
                boxes[b, m] = [cls, (x1 + w / 2) / SIZE, (y1 + h / 2) / SIZE, w / SIZE, h / SIZE]
        out.append((imgs, boxes))
    return out


def _run_reference(batches):
    """The reference hot loop, verbatim semantics (train.py:236-249, 377-439)."""
    from models.yolo import Model
    from utils.loss import ComputeLoss
    from utils.torch_utils import ModelEMA, smart_optimizer

    torch.manual_seed(0)
    torch.set_num_threads(1)
    m = Model("/root/reference/models/yolov3-tiny.yaml", ch=3, nc=80)
    m.hyp = dict(HYP)
    init_sd = {k: v.clone() for k, v in m.state_dict().items()}

    batch_size = B
    nbs = B  # nominal batch == batch -> accumulate = 1 (train.py:236-238)
    accumulate = max(round(nbs / batch_size), 1)
    decay = HYP["weight_decay"] * batch_size * accumulate / nbs
    opt = smart_optimizer(m, "SGD", HYP["lr0"], HYP["momentum"], decay)

    def lf(x):  # linear (train.py:246-248)
        return (1 - x / EPOCHS) * (1.0 - HYP["lrf"]) + HYP["lrf"]

    from torch.optim import lr_scheduler

    scheduler = lr_scheduler.LambdaLR(opt, lr_lambda=lf)
    ema = ModelEMA(m)
    loss_fn = ComputeLoss(m)

    losses = []
    m.train()
    last_opt_step = -1
    for epoch in range(EPOCHS):
        for i in range(NB):
            ni = i + NB * epoch
            imgs, boxes = batches[ni % len(batches)]
            x = torch.from_numpy(imgs.astype(np.float32).transpose(0, 3, 1, 2) / 255.0)
            tgts = torch.tensor(
                [[b, *boxes[b, mm]] for b in range(B) for mm in range(M)], dtype=torch.float32
            )
            if ni <= NW:  # warmup (train.py:383-391)
                xi = [0, NW]
                for j, g in enumerate(opt.param_groups):
                    g["lr"] = np.interp(
                        ni, xi, [HYP["warmup_bias_lr"] if j == 0 else 0.0, g["initial_lr"] * lf(epoch)]
                    )
                    if "momentum" in g:
                        g["momentum"] = np.interp(ni, xi, [HYP["warmup_momentum"], HYP["momentum"]])
            loss, _ = loss_fn(m(x), tgts)
            loss.backward()
            if ni - last_opt_step >= accumulate:
                torch.nn.utils.clip_grad_norm_(m.parameters(), max_norm=10.0)
                opt.step()
                opt.zero_grad()
                ema.update(m)
                last_opt_step = ni
            losses.append(float(loss))
        scheduler.step()
    return init_sd, m, ema, np.array(losses)


def _tree_allclose(ours, ref, rtol, atol, what):
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    flat_r = jax.tree_util.tree_leaves(ref)
    assert len(flat_o) == len(flat_r)
    for (path, o), r in zip(flat_o, flat_r):
        np.testing.assert_allclose(
            np.asarray(o), np.asarray(r), rtol=rtol, atol=atol,
            err_msg=f"{what} leaf {jax.tree_util.keystr(path)}",
        )


def test_training_trajectory_matches_reference():
    from yolov3_tpu.train.loss import LossConfig
    from yolov3_tpu.train.optim import build_optimizer
    from yolov3_tpu.train.step import init_train_state, make_train_step

    batches = _batches()
    init_sd, ref_model, ref_ema, ref_losses = _run_reference(batches)

    model = DetectionModel.from_config("yolov3-tiny", imgsz=64)
    variables, report = convert_torch_checkpoint(init_sd, model)
    assert not report["missed"], report["missed"][:5]
    model = model.replace_variables(variables)

    tx, _, accumulate = build_optimizer(
        "sgd", model.params, HYP, epochs=EPOCHS, steps_per_epoch=NB,
        batch_size=B, nbs=B, min_warmup_steps=NW,
    )
    assert accumulate == 1
    loss_cfg = LossConfig.from_model(model.spec, HYP)
    step = make_train_step(model.module, loss_cfg, tx)
    state = init_train_state(model, tx, loss_cfg=loss_cfg)

    our_losses = []
    for t in range(STEPS):
        imgs, boxes = batches[t % len(batches)]
        mask = np.ones((B, M), bool)
        state, metrics = step(state, jnp.asarray(imgs), jnp.asarray(boxes), jnp.asarray(mask))
        our_losses.append(float(metrics["loss"]))
    our_losses = np.array(our_losses)

    # Tolerances: 3-4x the measured drift of this exact config (worst observed:
    # loss 0.93% at step 16, params 4.8e-4 abs, BN running-mean 5.3e-3 abs).
    # 1. per-step loss curves (drift compounds; later steps get the loose end)
    np.testing.assert_allclose(our_losses, ref_losses, rtol=3e-2)
    np.testing.assert_allclose(our_losses[:4], ref_losses[:4], rtol=5e-3)

    # 2. final params after 24 nesterov-SGD updates through warmup + schedule
    final_vars, rep = convert_torch_checkpoint(ref_model.state_dict(), model)
    assert not rep["missed"]
    _tree_allclose(state["params"], final_vars["params"], rtol=1e-2, atol=2e-3, what="params")

    # 3. BN running stats (torch Bessel-corrected variance semantics)
    _tree_allclose(state["batch_stats"], final_vars["batch_stats"], rtol=2e-2, atol=1.5e-2,
                   what="batch_stats")

    # 4. EMA tree (ModelEMA ramped decay, updated once per optimizer step)
    ema_vars, rep = convert_torch_checkpoint(ref_ema.ema.state_dict(), model)
    assert not rep["missed"]
    _tree_allclose(state["ema"]["ema"]["params"], ema_vars["params"], rtol=1e-2, atol=2e-3,
                   what="ema params")
    _tree_allclose(state["ema"]["ema"]["batch_stats"], ema_vars["batch_stats"], rtol=2e-2,
                   atol=1.5e-2, what="ema batch_stats")
    assert int(state["ema"]["updates"]) == ref_ema.updates == STEPS
