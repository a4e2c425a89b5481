"""Jitted SPMD train step: forward + loss + grad + optimizer + EMA in one XLA program.

The reference's hot loop (reference train.py:377-435) does ~10 separate
device interactions per step (H2D copy, autocast forward, loss, scaled
backward, unscale, clip, step, EMA update, zero_grad). Here the whole step is
ONE compiled program over a `Mesh(("data",))`:

 - batch enters sharded on the data axis; params/opt-state replicated;
 - uint8 -> f32 /255 normalization happens on-device (H2D moves bytes, not
   floats — 4x less PCIe/ICI traffic than the reference's float copy);
 - gradient all-reduce is inserted by XLA because the loss is a global-batch
   reduction (no smart_DDP, no loss *= WORLD_SIZE compensation,
   train.py:405-406);
 - BatchNorm batch stats are global-batch by construction under pjit =
   SyncBatchNorm semantics without the opt-in conversion (train.py:270-272);
 - bf16 compute policy replaces AMP/GradScaler (no scaler: bf16 keeps fp32
   exponent range);
 - EMA is a pytree lerp inside the same program (no separate pass).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from yolov3_tpu.parallel.mesh import batch_sharding, replicated
from yolov3_tpu.train.loss import LossConfig, compute_loss
from yolov3_tpu.train.optim import EMA


def normalize_images(imgs, dtype=jnp.float32):
    """uint8 NHWC -> [0,1] in the compute dtype, on device (reference does /255
    on host-copied floats). Under a bf16 policy the first conv consumes bf16
    anyway — normalizing in f32 first would just materialize a 2x-size copy
    (629 MB at bs128@640) for the cast to throw away; the serving path
    (bench.py/serve.py) normalizes in compute dtype the same way. uint8 values
    are exact in bf16 (8 significand bits)."""
    return imgs.astype(dtype) / 255.0


def make_train_step(module, loss_cfg: LossConfig, tx, mesh=None, ema_decay=0.9999, loss_scale=1.0,
                    remat=False, remat_segment=None, remat_until=None):
    """Build the jitted train step.

    State pytree: {params, batch_stats, opt, ema:{ema, updates}, step}.
    Returns step_fn(state, imgs_u8, targets, mask) -> (state, metrics).
    `loss_scale`: total-loss multiplier — 4.0 in quad mode (the quad collate
    quarters the batch dim the loss is scaled by; reference train.py:407-408).
    `remat`: per-layer activation rematerialization — the backward recomputes
    one layer at a time instead of keeping the whole activation pyramid live,
    enabling ~2x larger per-chip batches at 640 for ~1/3 more FLOPs (the
    reference has no analog; its memory lever is AMP + smaller batches).
    """

    autobalance = loss_cfg.autobalance
    ssi = loss_cfg.strides.index(16) if (autobalance and 16 in loss_cfg.strides) else 0

    if remat and hasattr(module, "clone") and any(f.name == "remat" for f in dataclasses.fields(module)):
        kw = {"remat": True}
        if remat_segment is not None:
            # longer segments save fewer boundary activations (each boundary
            # costs a full feature map — dominant at high resolution) at the
            # price of a larger per-segment recompute window
            kw["remat_segment"] = int(remat_segment)
        if remat_until is not None:
            # selective policy: remat only layers < remat_until; deep layers
            # save their (exponentially cheaper) activations and skip the
            # recompute — see YOLOGraph.remat_until
            kw["remat_until"] = int(remat_until)
        module = module.clone(**kw)

    def apply_fn(params, batch_stats, x):
        return module.apply({"params": params, "batch_stats": batch_stats}, x, train=True, mutable=["batch_stats"])

    if remat and not getattr(module, "remat", False):
        apply_fn = jax.checkpoint(apply_fn)

    def train_step(state, imgs, targets, mask):
        x = normalize_images(imgs, dtype=getattr(module, "dtype", jnp.float32))
        balance = state.get("balance") if autobalance else None

        def loss_fn(params):
            feats, mut = apply_fn(params, state["batch_stats"], x)
            loss, comps, obj_pl = compute_loss(
                list(feats), targets, mask, loss_cfg, balance=balance, return_per_layer_obj=True
            )
            return loss * loss_scale, (mut["batch_stats"], comps, obj_pl)

        (loss, (new_bstats, comps, obj_pl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(state["params"])
        updates, new_opt = tx.update(grads, state["opt"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_ema = EMA.update(
            state["ema"], {"params": new_params, "batch_stats": new_bstats}, decay=ema_decay
        )
        new_state = {
            "params": new_params,
            "batch_stats": new_bstats,
            "opt": new_opt,
            "ema": new_ema,
            "step": state["step"] + 1,
        }
        if autobalance:
            from yolov3_tpu.train.loss import update_balance

            new_state["balance"] = update_balance(state["balance"], obj_pl, ssi)
        metrics = {"loss": loss, "lbox": comps[0], "lobj": comps[1], "lcls": comps[2]}
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, data, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def init_train_state(model, tx, key=None, loss_cfg=None):
    """Build the initial train-state pytree from a DetectionModel handle."""
    variables = model.variables
    opt_state = tx.init(variables["params"])
    ema = EMA(variables).state
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "opt": opt_state,
        "ema": ema,
        "step": jnp.zeros((), jnp.int32),
    }
    if loss_cfg is not None and loss_cfg.autobalance:
        state["balance"] = jnp.asarray(loss_cfg.balance, jnp.float32)
    return state
