"""YOLOv3 loss: CIoU box + IoU-aware objectness + class BCE, fully vectorized.

Re-design of the reference ComputeLoss/build_targets (reference
utils/loss.py:98-244) for static shapes: instead of boolean-mask gathers that
produce data-dependent sizes, every (offset, anchor, target) candidate slot is
scored under a validity mask. 5 neighbor offsets x na anchors x (B*M) padded
targets gives a fixed candidate tensor per scale; invalid slots contribute 0.

Semantics parity notes:
 - anchor match: max(r, 1/r).max() < anchor_t  (loss.py:215-218)
 - neighbor expansion: +-0.5 cell offsets with the (frac < 0.5, coord > 1)
   conditions (loss.py:221-227)
 - objectness targets are the detached, clamped CIoU of matched predictions
   (loss.py:155-161); where several matches land in one cell the reference
   keeps the last write — reproduced exactly (and deterministically) via a
   position-priority scatter (see compute_loss), pinned by the multi-step
   trajectory parity test.
 - per-scale balance [4.0, 1.0, 0.4] (3 scales) / P3-P7 table (loss.py:122)
 - class BCE with label smoothing cp/cn (loss.py:114, 164-167), optional focal
   loss (loss.py:31-63,117-119)
 - returned total loss is scaled by batch size (loss.py:179-181)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.ops.boxes import bbox_iou


@dataclass(frozen=True)
class LossConfig:
    """Static loss configuration (hashable: usable as a jit static arg)."""

    nc: int
    nl: int
    na: int
    anchors: tuple  # grid-unit anchors, shape (nl, na, 2) as nested tuples
    strides: tuple
    box: float = 0.05
    obj: float = 1.0
    cls: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    label_smoothing: float = 0.0
    fl_gamma: float = 0.0
    anchor_t: float = 4.0
    autobalance: bool = False

    @property
    def balance(self):
        return (4.0, 1.0, 0.4) if self.nl == 3 else ((4.0, 1.0, 0.25, 0.06, 0.02)[: self.nl])

    @classmethod
    def from_model(cls, spec, hyp: dict | None = None):
        """Build from a ModelSpec + hyp dict, applying the reference's per-layer
        gain scaling (train.py:327-329) is the caller's job (it needs imgsz)."""
        hyp = hyp or {}
        ga = spec.grid_anchors()  # (nl, na, 2)
        return cls(
            nc=spec.nc,
            nl=spec.nl,
            na=spec.na,
            anchors=tuple(tuple(tuple(float(v) for v in a) for a in layer) for layer in ga),
            strides=tuple(spec.strides),
            box=hyp.get("box", 0.05),
            obj=hyp.get("obj", 1.0),
            cls=hyp.get("cls", 0.5),
            cls_pw=hyp.get("cls_pw", 1.0),
            obj_pw=hyp.get("obj_pw", 1.0),
            label_smoothing=hyp.get("label_smoothing", 0.0),
            fl_gamma=hyp.get("fl_gamma", 0.0),
            anchor_t=hyp.get("anchor_t", 4.0),
        )


def smooth_bce(eps=0.1):
    """Positive/negative BCE targets for label smoothing (arxiv 1902.04103 eqn 3)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight=1.0):
    """Elementwise BCE-with-logits with positive-class weight (torch semantics)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_modulation(logits, targets, loss, gamma=1.5, alpha=0.25):
    """TF-style focal loss factor applied to an elementwise BCE loss
    (reference utils/loss.py:45-57)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_factor * (1.0 - p_t) ** gamma


def qfocal_modulation(logits, targets, loss, gamma=1.5, alpha=0.25):
    """Quality focal loss factor (reference utils/loss.py:66-94)."""
    p = jax.nn.sigmoid(logits)
    alpha_factor = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_factor * jnp.abs(targets - p) ** gamma


def bce_blur_with_logits(logits, targets, alpha=0.05):
    """BCE downweighting probable missing-labels (reference utils/loss.py:11-28)."""
    loss = bce_with_logits(logits, targets)
    dx = jax.nn.sigmoid(logits) - targets
    alpha_factor = 1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4))
    return (loss * alpha_factor).mean()


# neighbor offsets: center, left-cell, top-cell, right-cell, bottom-cell (x0.5)
# (host constant — a module-level jnp.array would initialize the JAX backend
# at import time, before CLI --device can pick the platform)
_OFFSETS = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0], [0.0, -1.0]], np.float32) * 0.5


def assign_targets_layer(targets, mask, anchors, ny, nx, anchor_t):
    """Assign padded targets to one detection scale.

    Args:
        targets: (N, 6) rows [img_idx, cls, x, y, w, h], xywh normalized 0-1.
        mask: (N,) validity of each row.
        anchors: (na, 2) grid-unit anchors for this scale.
        ny, nx: grid size.
        anchor_t: wh-ratio match threshold.

    Returns dict of fixed-shape (5, na, N) candidate tensors:
        m: candidate validity; b/a/gj/gi: gather indices; txy: xy offset target
        within cell (gxy - gij); twh: grid-unit wh target; tcls: class index;
        awh: matched anchor wh.
    """
    na = anchors.shape[0]
    n = targets.shape[0]
    gxy = targets[:, 2:4] * jnp.array([nx, ny], jnp.float32)  # grid xy
    gwh = targets[:, 4:6] * jnp.array([nx, ny], jnp.float32)  # grid wh

    # anchor ratio test -> (na, N)
    r = gwh[None, :, :] / anchors[:, None, :]
    match = jnp.maximum(r, 1.0 / r).max(-1) < anchor_t
    match = match & mask[None, :]

    # neighbor-cell conditions -> (5, N)
    fx, fy = gxy[:, 0], gxy[:, 1]
    ix, iy = jnp.array([nx, ny], jnp.float32)[0] - fx, jnp.array([nx, ny], jnp.float32)[1] - fy
    cond = jnp.stack(
        [
            jnp.ones_like(fx, bool),
            (fx % 1 < 0.5) & (fx > 1),  # left neighbor
            (fy % 1 < 0.5) & (fy > 1),  # top neighbor
            (ix % 1 < 0.5) & (ix > 1),  # right neighbor
            (iy % 1 < 0.5) & (iy > 1),  # bottom neighbor
        ],
        axis=0,
    )

    m = match[None, :, :] & cond[:, None, :]  # (5, na, N)

    gij = jnp.floor(gxy[None, :, :] - _OFFSETS[:, None, :])  # (5, N, 2)
    gi = jnp.clip(gij[..., 0], 0, nx - 1).astype(jnp.int32)
    gj = jnp.clip(gij[..., 1], 0, ny - 1).astype(jnp.int32)

    txy = gxy[None, :, :] - jnp.stack([gi, gj], axis=-1).astype(jnp.float32)  # (5, N, 2)

    bcast = lambda x: jnp.broadcast_to(x, (5, na, n) + x.shape[3:] if x.ndim > 3 else (5, na, n))
    return {
        "m": m,
        "b": bcast(targets[None, None, :, 0].astype(jnp.int32)),
        "a": jnp.broadcast_to(jnp.arange(na)[None, :, None], (5, na, n)),
        "gj": jnp.broadcast_to(gj[:, None, :], (5, na, n)),
        "gi": jnp.broadcast_to(gi[:, None, :], (5, na, n)),
        "txy": jnp.broadcast_to(txy[:, None, :, :], (5, na, n, 2)),
        "twh": jnp.broadcast_to(gwh[None, None, :, :], (5, na, n, 2)),
        "tcls": bcast(targets[None, None, :, 1].astype(jnp.int32)),
        "awh": jnp.broadcast_to(anchors[None, :, None, :], (5, na, n, 2)),
    }


def compute_loss(feats, targets, mask, cfg: LossConfig, balance=None, return_per_layer_obj=False):
    """Total detection loss.

    Args:
        feats: list of nl raw head outputs (bs, na, ny, nx, no).
        targets: (B, M, 5) padded per-image labels [cls, x, y, w, h] (normalized).
        mask: (B, M) label validity.
        cfg: LossConfig (static).
        balance: optional (nl,) per-scale obj weights overriding cfg.balance
            (used by autobalance, reference loss.py:171-175).
        return_per_layer_obj: also return the raw per-layer obj losses.

    Returns:
        (total_loss_scaled_by_bs, jnp.array([lbox, lobj, lcls])[, obj_per_layer])
    """
    bs = feats[0].shape[0]
    B, M, _ = targets.shape
    img_idx = jnp.broadcast_to(jnp.arange(B)[:, None], (B, M)).astype(jnp.float32)
    flat = jnp.concatenate([img_idx[..., None], targets], axis=-1).reshape(B * M, 6)
    flat_mask = mask.reshape(B * M)

    cp, cn = smooth_bce(cfg.label_smoothing)
    anchors = jnp.asarray(cfg.anchors, jnp.float32)  # (nl, na, 2)

    lbox = 0.0
    lobj = 0.0
    lcls = 0.0
    obj_per_layer = []
    for i, pi in enumerate(feats):
        _, na, ny, nx, no = pi.shape
        t = assign_targets_layer(flat, flat_mask, anchors[i], ny, nx, cfg.anchor_t)
        m = t["m"].reshape(-1).astype(jnp.float32)  # (K,)
        n_match = jnp.maximum(m.sum(), 1.0)

        # gather predictions at candidate cells: flatten (bs,na,ny,nx).
        # The loss math runs in f32, but the upcast happens AFTER the gather /
        # channel slice — upcasting the whole (bs,na,ny,nx,85) head output
        # first would materialize ~1 GB of f32 (and its cotangent) per bs128
        # step for identical values (bf16->f32 is exact, and cast commutes
        # with gather/slice); the backward then flows bf16 cotangents into the
        # conv stack, matching the bf16 policy of every other layer boundary.
        flat_idx = (
            (t["b"].reshape(-1) * na + t["a"].reshape(-1)) * ny + t["gj"].reshape(-1)
        ) * nx + t["gi"].reshape(-1)
        p_flat = pi.reshape(-1, no)
        psel = p_flat[flat_idx].astype(jnp.float32)  # (K, no)

        # box regression (loss.py:147-152)
        pxy = jax.nn.sigmoid(psel[:, 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(psel[:, 2:4]) * 2.0) ** 2 * t["awh"].reshape(-1, 2)
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        # padding slots carry wh=0 which would NaN the CIoU arctan; substitute a
        # safe box there — they are masked out of every reduction anyway.
        twh_safe = jnp.where(m[:, None] > 0, t["twh"].reshape(-1, 2), 1.0)
        tbox = jnp.concatenate([t["txy"].reshape(-1, 2), twh_safe], axis=-1)
        iou = bbox_iou(pbox, tbox, xywh=True, CIoU=True)
        lbox = lbox + ((1.0 - iou) * m).sum() / n_match

        # objectness targets: scatter detached clamped IoU (loss.py:155-161).
        # Where several candidates land in one cell the reference's sequential
        # write keeps the LAST one; its candidate order is offset-major, then
        # anchor, then target (loss.py:212-232 t.repeat((5,1,1))[j]) — exactly
        # this tensor's flattened (5, na, N) order, so "last write" == highest
        # flat position. A scatter-max of positions picks the winner, a second
        # scatter places its IoU: deterministic, order-exact, two cheap
        # scatters instead of one nondeterministic duplicate-index write.
        iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None) * m
        pos = jnp.arange(m.shape[0], dtype=jnp.int32)
        winner = (
            jnp.full((bs * na * ny * nx,), -1, jnp.int32)
            .at[flat_idx]
            .max(jnp.where(m > 0, pos, -1))
        )
        is_last = (pos == winner[flat_idx]) & (m > 0)
        tobj = (
            jnp.zeros((bs * na * ny * nx,), jnp.float32)
            .at[flat_idx]
            .max(jnp.where(is_last, iou_d, 0.0))
        )
        obj_logits = pi[..., 4].reshape(-1).astype(jnp.float32)
        obj_loss = bce_with_logits(obj_logits, tobj, cfg.obj_pw)
        if cfg.fl_gamma > 0:
            obj_loss = focal_modulation(obj_logits, tobj, obj_loss, cfg.fl_gamma)
        obji = obj_loss.mean()
        obj_per_layer.append(jax.lax.stop_gradient(obji))
        w_i = balance[i] if balance is not None else cfg.balance[i]
        lobj = lobj + obji * w_i

        # classification (loss.py:163-167)
        if cfg.nc > 1:
            tc = jax.nn.one_hot(t["tcls"].reshape(-1), cfg.nc) * (cp - cn) + cn
            cls_loss = bce_with_logits(psel[:, 5:], tc, cfg.cls_pw)
            if cfg.fl_gamma > 0:
                cls_loss = focal_modulation(psel[:, 5:], tc, cls_loss, cfg.fl_gamma)
            lcls = lcls + (cls_loss * m[:, None]).sum() / (n_match * cfg.nc)

    lbox = lbox * cfg.box
    lobj = lobj * cfg.obj
    lcls = lcls * cfg.cls
    total = (lbox + lobj + lcls) * bs  # reference scales by batch size (loss.py:179-181)
    comps = jax.lax.stop_gradient(jnp.stack([lbox, lobj, lcls]))
    if return_per_layer_obj:
        return total, comps, jnp.stack(obj_per_layer)
    return total, comps


def update_balance(balance, obj_per_layer, ssi=0):
    """Autobalance EMA of per-scale obj weights (reference loss.py:171-175):
    b_i <- 0.9999*b_i + 0.0001/obj_i, then normalized by the stride-16 scale."""
    new = balance * 0.9999 + 0.0001 / jnp.clip(obj_per_layer, 1e-6, None)
    return new / new[ssi]
