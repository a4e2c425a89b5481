"""Optimizer, LR/momentum schedules, and EMA — optax pytree transforms.

Covers the reference's smart_optimizer 3-group SGD (reference
utils/torch_utils.py:207-237: bias no-decay, BN-scale no-decay, weights decay),
the linear / one-cycle LR schedules (train.py:241-249), the warmup
interpolation of lr + momentum over max(3 epochs, 100 iters)
(train.py:383-391), and ModelEMA's ramped-decay pytree EMA
(decay * (1 - exp(-updates/2000))).

Design notes (TPU-first):
 - warmup is folded into pure schedule functions of the global step, so the
   whole optimizer update jits into the train step — no python-side LR pokes;
 - per-group behavior uses optax.masked on the param pytree, not param-group
   lists;
 - gradient accumulation (reference nbs=64 nominal batch, train.py:236,414)
   uses optax.MultiSteps when accumulate > 1.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from yolov3_tpu.utils.general import LOGGER


def is_bias_path(path):
    """True for conv/BN bias leaves (param-group 1 in the reference)."""
    last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return last == "bias"


def is_bn_scale_path(path):
    """True for BatchNorm scale leaves (param-group 0: no decay)."""
    last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    parent = path[-2].key if len(path) > 1 and hasattr(path[-2], "key") else ""
    return last == "scale" and "bn" in str(parent)


def make_param_labels(params):
    """Label each leaf 'bias' | 'bn' | 'weight' for group-wise transforms."""

    def label(path, _):
        if is_bias_path(path):
            return "bias"
        if is_bn_scale_path(path):
            return "bn"
        return "weight"

    return jax.tree_util.tree_map_with_path(label, params)


class Schedules(NamedTuple):
    lr: Any  # step -> lr multiplier-applied learning rate (per group handled via bias flag)
    bias_lr: Any
    momentum: Any


def build_schedules(hyp, epochs, steps_per_epoch, batch_size, nbs=64, cos_lr=False, min_warmup_steps=100):
    """Pure functions of the global LOADER step (one per data batch) implementing
    the reference's warmup + linear/one-cycle schedule (train.py:241-249, 339,
    383-391). Callers stepping once per OPTIMIZER update (grad accumulation)
    must convert: loader_step = optimizer_step * accumulate."""
    lr0 = hyp.get("lr0", 0.01)
    lrf = hyp.get("lrf", 0.01)
    warmup_epochs = hyp.get("warmup_epochs", 3.0)
    warmup_momentum = hyp.get("warmup_momentum", 0.8)
    warmup_bias_lr = hyp.get("warmup_bias_lr", 0.1)
    momentum = hyp.get("momentum", 0.937)

    nw = max(round(warmup_epochs * steps_per_epoch), min_warmup_steps)  # warmup steps
    nw = max(nw, 1)

    def lf(epoch):  # epoch -> decay fraction (jnp-traceable: epoch may be a tracer)
        if cos_lr:
            return ((1 - jnp.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1
        return (1 - epoch / epochs) * (1.0 - lrf) + lrf

    def _epoch(step):
        return step / steps_per_epoch

    def lr_at(step, warmup_start):
        e = _epoch(step)
        base = lr0 * lf(jnp.clip(jnp.floor(e), 0, epochs))
        frac = jnp.clip(step / nw, 0.0, 1.0)
        warm = warmup_start + (base - warmup_start) * frac
        return jnp.where(step < nw, warm, base)

    def lr_weight(step):
        return lr_at(step, 0.0)

    def lr_bias(step):
        return lr_at(step, warmup_bias_lr)

    def mom(step):
        frac = jnp.clip(step / nw, 0.0, 1.0)
        return jnp.where(step < nw, warmup_momentum + (momentum - warmup_momentum) * frac, momentum)

    return Schedules(lr=lr_weight, bias_lr=lr_bias, momentum=mom)


def sgd_with_schedules(schedules: Schedules, weight_decay=0.0005, nesterov=True, accumulate=1):
    """3-group SGD: decay on weights only, bias group gets its own warmup LR,
    momentum follows the warmup schedule. Entirely jit-traceable.

    `accumulate` converts this transform's per-update step counter back into
    the loader-step domain the schedules are defined in (under MultiSteps the
    inner update fires once per `accumulate` loader batches)."""

    def init_fn(params):
        mu = jax.tree.map(jnp.zeros_like, params)
        return {"mu": mu, "step": jnp.zeros((), jnp.int32)}

    def update_fn(grads, state, params):
        step = state["step"]
        loader_step = step.astype(jnp.float32) * float(accumulate)
        m = schedules.momentum(loader_step)
        labels = make_param_labels(params)

        def upd(g, p, mu_leaf, lbl):
            g = g + (weight_decay * p if lbl == "weight" else 0.0)
            mu_new = m * mu_leaf + g  # torch SGD: buf = m*buf + grad
            d = g + m * mu_new if nesterov else mu_new
            lr = schedules.bias_lr(loader_step) if lbl == "bias" else schedules.lr(loader_step)
            return -lr * d, mu_new

        flat = jax.tree.map(upd, grads, params, state["mu"], labels)
        updates = jax.tree.map(lambda t: t[0], flat, is_leaf=lambda x: isinstance(x, tuple))
        mu = jax.tree.map(lambda t: t[1], flat, is_leaf=lambda x: isinstance(x, tuple))
        return updates, {"mu": mu, "step": step + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def freeze_mask(params, freeze):
    """True for leaves under frozen top-level layers (reference train.py:217-223:
    requires_grad=False by 'model.{i}.' prefix -> here zeroed updates)."""
    frozen_layers = {f"l{i}" for i in freeze}

    def is_frozen(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        base = top.split("_")[0]  # l4_1 repeats belong to layer l4
        return top in frozen_layers or base in frozen_layers

    return jax.tree_util.tree_map_with_path(is_frozen, params)


def build_optimizer(name, params, hyp, epochs, steps_per_epoch, batch_size, nbs=64, cos_lr=False,
                    min_warmup_steps=100, freeze=()):
    """smart_optimizer analog: SGD(nesterov)/Adam/AdamW with grouped decay.

    decay is scaled by batch_size * accumulate / nbs like the reference
    (torch_utils.py:215, train.py:236-238)."""
    accumulate = max(round(nbs / batch_size), 1)
    weight_decay = hyp.get("weight_decay", 0.0005) * batch_size * accumulate / nbs
    sch = build_schedules(hyp, epochs, steps_per_epoch, batch_size, nbs, cos_lr, min_warmup_steps)

    # Reference accumulation sums grads over k micro-batches before one
    # clip+step (train.py:411-422); optax.MultiSteps emits their MEAN, so the
    # inner chain rescales by k first. Schedules are loader-step functions;
    # inner transforms step once per k loader batches, so they convert via
    # `accumulate` (warmup nw = max(3 epochs, 100) LOADER iters, train.py:339).
    def _wrap(inner):
        if accumulate > 1:
            inner = optax.MultiSteps(
                optax.chain(optax.scale(float(accumulate)), inner), every_k_schedule=accumulate
            )
        return inner

    if name.lower() in ("sgd", ""):
        tx = _wrap(
            optax.chain(
                optax.clip_by_global_norm(10.0),  # reference clips grad norm 10.0 (train.py:417)
                sgd_with_schedules(sch, weight_decay=weight_decay, nesterov=True, accumulate=accumulate),
            )
        )
    elif name.lower() in ("adam", "adamw", "rmsprop"):
        labels = make_param_labels(params)
        mask = jax.tree.map(lambda l: l == "weight", labels)
        beta1 = hyp.get("momentum", 0.937)
        if name.lower() == "rmsprop":
            # reference smart_optimizer RMSProp(momentum) variant (torch_utils.py:221)
            inner_opt = optax.chain(optax.scale_by_rms(decay=0.99, eps=1e-8), optax.trace(decay=beta1))
        else:
            inner_opt = optax.scale_by_adam(b1=beta1, b2=0.999)
        core = [optax.clip_by_global_norm(10.0)]  # reference clips grad norm 10.0 (train.py:417)
        if name.lower() == "adamw":
            # torch AdamW DECOUPLES decay: applied after the adaptive
            # normalizer, scaled only by lr (the final scale below)
            core += [inner_opt, optax.add_decayed_weights(weight_decay, mask=mask)]
        else:
            # torch Adam/RMSprop couple L2 into the gradient pre-normalizer
            core += [optax.add_decayed_weights(weight_decay, mask=mask), inner_opt]

        def neg_lr(fn):
            return optax.scale_by_schedule(lambda s: -fn(s.astype(jnp.float32) * float(accumulate)))

        # the bias group warms up from warmup_bias_lr=0.1 regardless of
        # optimizer (reference train.py:383-391 interpolates group 0's lr)
        core.append(optax.multi_transform(
            {"bias": neg_lr(sch.bias_lr), "other": neg_lr(sch.lr)},
            jax.tree.map(lambda l: "bias" if l == "bias" else "other", labels),
        ))
        tx = _wrap(optax.chain(*core))
    else:
        raise NotImplementedError(f"Optimizer {name} not implemented")
    if freeze:
        mask = freeze_mask(params, freeze)
        n = sum(jax.tree.leaves(jax.tree.map(lambda m: int(m), mask)))
        LOGGER.info(f"freezing {n} parameter tensors in layers {sorted(freeze)}")
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), mask))
    return tx, sch, accumulate


class EMA:
    """Pytree EMA with ramped decay (ultralytics ModelEMA semantics):
    d = decay * (1 - exp(-updates / tau))."""

    def __init__(self, variables, decay=0.9999, tau=2000.0):
        self.decay = decay
        self.tau = tau
        # copy (not alias) the initial weights: the EMA tree must own distinct
        # buffers or donation of the train state would alias params and EMA
        self.state = {
            "ema": jax.tree.map(lambda x: jnp.array(x, copy=True), variables),
            "updates": jnp.zeros((), jnp.int32),
        }

    @staticmethod
    def update(state, variables, decay=0.9999, tau=2000.0):
        """Pure update usable inside jit: returns new EMA state."""
        updates = state["updates"] + 1
        d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / tau))
        ema = jax.tree.map(lambda e, v: e * d + (1.0 - d) * v.astype(e.dtype), state["ema"], variables)
        return {"ema": ema, "updates": updates}


class EarlyStopping:
    """Patience-based stopper on fitness (reference torch_utils.py:264-291).
    All hosts compute identical fitness from a deterministic eval, so no
    broadcast is needed (the reference's dist.broadcast_object_list)."""

    def __init__(self, patience=100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")
        self.possible_stop = False

    def __call__(self, epoch, fitness):
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        delta = epoch - self.best_epoch
        self.possible_stop = delta >= (self.patience - 1)
        return delta >= self.patience
