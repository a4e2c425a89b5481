"""Training engine: the `train(...)` entry mirroring reference train.py:105-530.

Flow: run dirs -> data -> model -> (autoanchor) -> optimizer/schedules ->
jitted sharded train step -> epoch loop (per-epoch EMA validation, fitness,
checkpointing, early stop) -> final strip + best-checkpoint validation.

TPU re-design highlights vs the reference:
 - the whole optimizer step (incl. warmup LR/momentum interpolation the
   reference does in python per batch, train.py:383-391) is compiled into the
   step as schedule functions of the global step counter;
 - batches are fixed-shape, so the epoch loop never recompiles (the
   reference's multi-scale resize, train.py:394-399, becomes an opt-in
   bucketed mode);
 - rank logic: jax.process_index()==0 replaces RANK checks; there is no DDP
   wrapper, no gradient-averaging compensation, no stop-flag broadcast
   (fitness is computed identically on every host).
"""

from __future__ import annotations

import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.data.dataset_yaml import check_dataset
from yolov3_tpu.data.datasets import DataLoader, DetectionDataset
from yolov3_tpu.eval import validator
from yolov3_tpu.eval.metrics import fitness
from yolov3_tpu.models.detection import DetectionModel

from yolov3_tpu.parallel.mesh import create_mesh, replicate, shard_batch
from yolov3_tpu.train.loss import LossConfig
from yolov3_tpu.train.optim import EarlyStopping, build_optimizer
from yolov3_tpu.train.step import init_train_state, make_train_step
from yolov3_tpu.utils.callbacks import Callbacks
from yolov3_tpu.utils.checks import check_bf16
from yolov3_tpu.utils.checkpoint import load_checkpoint, save_checkpoint, strip_checkpoint
from yolov3_tpu.utils.general import LOGGER, colorstr, increment_path, init_seeds, yaml_load, yaml_save

def train(
    data,
    cfg="yolov3-tiny",
    hyp=None,
    weights=None,
    epochs=100,
    batch_size=16,
    imgsz=640,
    optimizer="sgd",
    cos_lr=False,
    noautoanchor=False,
    noval=False,
    nosave=False,
    single_cls=False,
    patience=100,
    save_dir=None,
    project="runs/train",
    name="exp",
    exist_ok=False,
    seed=0,
    max_labels=300,
    callbacks=None,
    resume=False,
    save_period=-1,
    rect_val=True,
    image_weights=False,
    multi_scale=False,
    freeze=(),
    quad=False,
    workers=2,
    cache_images=None,
    remat=False,
    s2d_stem=False,
    noplots=False,
    rect=False,
    label_smoothing=0.0,
    sync_bn=False,
    half=None,
    entity=None,
    upload_dataset=False,
    bbox_interval=-1,
):
    """Train a detection model. Returns (best_fitness, results, save_dir)."""
    callbacks = callbacks or Callbacks()
    t_start = time.time()

    # dirs + config snapshot (reference train.py:157-172)
    save_dir = Path(save_dir) if save_dir else increment_path(Path(project) / name, exist_ok=exist_ok)
    wdir = save_dir / "weights"
    wdir.mkdir(parents=True, exist_ok=True)
    if isinstance(hyp, (str, Path)):
        hyp = yaml_load(hyp)
    hyp = dict(hyp or yaml_load(Path(__file__).parents[1] / "data" / "hyps" / "scratch-low.yaml"))
    if label_smoothing:
        hyp["label_smoothing"] = label_smoothing  # reference train.py --label-smoothing -> hyp
    yaml_save(save_dir / "hyp.yaml", hyp)
    if sync_bn:
        # reference train.py:270-272 converts to SyncBatchNorm; under one-program
        # GSPMD the BN batch statistics are already global-batch — nothing to convert
        LOGGER.info("--sync-bn: BatchNorm stats are global-batch by construction under pjit (no-op)")
    init_seeds(seed)
    loggers = None
    if jax.process_index() == 0:
        import types

        from yolov3_tpu.utils.loggers import Loggers

        # the opt view the third-party sinks read (reference train.py:176
        # passes the full argparse namespace; these are the fields they use)
        opt_ns = types.SimpleNamespace(
            project=str(project), name=name, entity=entity, resume=resume,
            epochs=epochs, bbox_interval=bbox_interval,
            upload_dataset=upload_dataset,
        )
        loggers = Loggers(save_dir=save_dir, opt=opt_ns, hyp=hyp, plots=not noplots)
        loggers.attach(callbacks)
    callbacks.run("on_pretrain_routine_start")

    # data
    data_dict = check_dataset(data)
    if loggers and upload_dataset:
        loggers.log_dataset_artifact(data_dict)
    names = data_dict["names"]
    nc = 1 if single_cls else data_dict["nc"]

    # model (reference train.py:199-213)
    if resume:
        model, start_epoch, best_fitness = _resume_model(save_dir)
    elif weights:
        from yolov3_tpu.utils.checkpoint import load_model_from_checkpoint

        model = load_model_from_checkpoint(weights)
        if model.spec.nc != nc:
            LOGGER.info(f"Overriding checkpoint nc={model.spec.nc} with nc={nc}: re-init Detect head")
            model = _transfer_to_nc(model, cfg, nc)
        start_epoch, best_fitness = 0, 0.0
    else:
        model = DetectionModel.from_config(cfg, nc=nc, imgsz=256)
        start_epoch, best_fitness = 0, 0.0
    model.names = names
    # bf16 compute policy (the reference's AMP: train.py:214 check_amp ->
    # autocast forward). half=None auto-selects: bf16 on accelerators when the
    # check_amp-analog sanity check passes; params/loss stay f32 (loss.py
    # casts feats up) so this is classic mixed precision.
    if half is None:
        half = jax.default_backend() != "cpu" and check_bf16(model)
    if half and model.dtype != jnp.bfloat16:
        model = DetectionModel(model.spec, model.variables, jnp.bfloat16, names, model.fused,
                               model.s2d_stem)
    if s2d_stem and not model.s2d_stem:
        from yolov3_tpu.models.detection import s2d_eligible

        if not s2d_eligible(model.spec):
            raise ValueError(
                f"--s2d-stem needs a [Conv k3 s1, Conv k3 s2] stem; {model.spec.name} "
                "is not eligible (yolov3/yolov3-spp are; tiny's maxpool stem is not)")
        # exact layout transform of the stem pair (see nn/modules.Conv s2d_mode)
        # — same parameter tree, so checkpoints/resume/EMA are unaffected
        model = DetectionModel(model.spec, model.variables, model.dtype, names, model.fused,
                               s2d_stem=True)
    stride = int(model.stride)
    nl = model.spec.nl
    if batch_size == -1:  # AutoBatch (reference train.py:230-232)
        from yolov3_tpu.utils.autobatch import check_train_batch_size

        batch_size = check_train_batch_size(model, imgsz=imgsz)
    if loggers is not None:
        loggers.log_model_graph(model, imgsz=min(imgsz, 256))  # TB graph-trace analog

    # datasets
    if rect:
        # rect train batches disable mosaic (dataset handles it) and shuffling
        # (reference dataloaders.py:121 rect+shuffle warning); each aspect-ratio
        # bucket shape compiles its own XLA program — bounded, but non-trivial
        # through a remote-compile runtime
        assert not multi_scale, "--rect and --multi-scale are incompatible"
        LOGGER.info("rect training: mosaic+shuffle off; one compile per shape bucket")
    train_ds = DetectionDataset(
        data_dict["train"], imgsz=imgsz, augment=True, hyp=hyp, rect=rect, stride=stride,
        batch_size=batch_size, num_cls=nc, max_labels=max_labels, single_cls=single_cls,
        cache_images=cache_images,
    )
    # per-batch label-dim buckets shrink the loss's fixed candidate tensor to
    # the data (M=300 worst-case pad is ~9x a typical batch's need at bs128);
    # multi-process needs identical global shapes on every host, so only the
    # single-process case buckets
    train_loader = DataLoader(train_ds, batch_size=batch_size, shuffle=not rect, max_labels=max_labels,
                              seed=seed, drop_last=True, quad=quad, workers=workers,
                              label_buckets=jax.process_count() == 1)
    if jax.process_count() > 1:
        train_loader.shard_per_host()
    steps_per_epoch = max(len(train_loader), 1)
    if multi_scale:
        # bucketed multi-scale (reference train.py:394-399 draws any stride
        # multiple in [0.5, 1.5]*imgsz — ~20 shapes = ~20 XLA recompiles at
        # minutes each through a remote-compile runtime). Here: 5 FIXED
        # buckets spanning the same range (at most 5 compiled programs), and
        # the resize runs inside the loader workers, overlapped with device
        # compute — the hot loop never touches cv2 or fetches the step count
        gs = int(stride)
        buckets = sorted({max(round(imgsz * f / gs), 1) * gs for f in (0.5, 0.75, 1.0, 1.25, 1.5)})
        train_loader.set_multi_scale(buckets, seed=seed)

    val_loader = None
    if not noval and jax.process_index() == 0:
        val_ds = DetectionDataset(
            data_dict.get("val") or data_dict["train"], imgsz=imgsz, augment=False, rect=rect_val,
            stride=stride, pad=0.5, batch_size=batch_size, num_cls=nc, max_labels=max_labels,
            single_cls=single_cls,
        )
        val_loader = DataLoader(val_ds, batch_size=batch_size, shuffle=False, max_labels=max_labels)

    # autoanchor (reference train.py:314-316)
    if not noautoanchor and not resume:
        from yolov3_tpu.utils.autoanchor import check_anchors

        new_anchors = check_anchors(train_ds, model.spec, thr=hyp.get("anchor_t", 4.0), imgsz=imgsz)
        if new_anchors is not None:
            model = _with_new_anchors(model, new_anchors)

    # hyp gain scaling (reference train.py:327-329)
    hyp = dict(hyp)
    hyp["box"] = hyp.get("box", 0.05) * 3 / nl
    hyp["cls"] = hyp.get("cls", 0.5) * nc / 80 * 3 / nl
    hyp["obj"] = hyp.get("obj", 1.0) * (imgsz / 640) ** 2 * 3 / nl
    loss_cfg = LossConfig.from_model(model.spec, hyp)

    # optimizer + schedules + step
    freeze_layers = list(range(freeze[0])) if len(freeze) == 1 else list(freeze)
    nh = jax.process_count()
    # batch_size is PER HOST (each host's loader shard feeds its local rows,
    # mesh.shard_batch assembles the global batch); the reference's
    # decay/accumulate scaling uses the TOTAL batch (torch_utils.py:207-237)
    tx, schedules, accumulate = build_optimizer(
        optimizer, model.params, hyp, epochs, steps_per_epoch, batch_size * nh, cos_lr=cos_lr,
        freeze=freeze_layers,
    )
    import math as _math

    n_dev = jax.device_count()
    eff_batch = (batch_size // 4 if quad else batch_size) * nh  # global batch on the mesh
    if nh > 1 and eff_batch % n_dev:
        # a device-subset mesh can't be picked host-balanced in general —
        # require divisibility instead of silently idling another host's chips
        raise ValueError(f"multi-host: global batch {eff_batch} must be divisible by "
                         f"{n_dev} devices ({nh} hosts x {n_dev // nh} chips)")
    n_use = _math.gcd(eff_batch, n_dev)
    if n_use < n_dev:
        LOGGER.warning(
            f"batch {eff_batch} not divisible by {n_dev} devices — using a {n_use}-device mesh"
        )
    mesh = create_mesh(jax.devices()[:n_use])
    step_fn = make_train_step(model.module, loss_cfg, tx, mesh=mesh, loss_scale=4.0 if quad else 1.0,
                              remat=remat)
    state = init_train_state(model, tx, loss_cfg=loss_cfg)
    if resume:
        last = Path(save_dir) / "weights" / "last"
        meta = yaml_load(last / "checkpoint.yaml")
        if meta.get("stripped"):
            # finished runs hold inference-only checkpoints (strip_checkpoint):
            # restore weights, re-seed EMA, start the optimizer fresh — matches
            # the reference's tolerance of optimizer-less resumes
            sub, _ = load_checkpoint(
                last, target={"params": state["params"], "batch_stats": state["batch_stats"]}
            )
            from yolov3_tpu.train.optim import EMA

            state["params"], state["batch_stats"] = sub["params"], sub["batch_stats"]
            state["ema"] = EMA({"params": sub["params"], "batch_stats": sub["batch_stats"]}).state
        else:
            # restore with the freshly-built state as target so optax namedtuple
            # structure survives the orbax round-trip
            state, _ = load_checkpoint(last, target=state)
    state = replicate(mesh, state)

    if jax.process_index() == 0 and train_ds.labels:
        # label statistics plots + correlogram (reference train.py:318, plots.py:198-240)
        all_labels = np.concatenate([lb for lb in train_ds.labels if len(lb)], 0) if any(
            len(lb) for lb in train_ds.labels
        ) else np.zeros((0, 5), np.float32)
        callbacks.run("on_pretrain_routine_end", labels=all_labels, names=names)

    stopper = EarlyStopping(patience=patience)
    results_file = save_dir / "results.csv"
    LOGGER.info(
        f"Image sizes {imgsz} train/val, mesh {mesh.shape}, "
        f"Logging to {colorstr('bold', str(save_dir))}, starting training for {epochs} epochs..."
    )
    callbacks.run("on_train_start")

    final_epoch = start_epoch
    results = (0, 0, 0, 0, 0, 0, 0)
    maps = np.zeros(nc)
    for epoch in range(start_epoch, epochs):
        final_epoch = epoch
        callbacks.run("on_train_epoch_start")
        if image_weights:
            # resample dataset indices by (1 - per-class mAP)^2 (reference train.py:360-363)
            from yolov3_tpu.utils.general import labels_to_class_weights, labels_to_image_weights

            cw = labels_to_class_weights(train_ds.labels, nc) * (1 - maps) ** 2 / nc
            iw = labels_to_image_weights(train_ds.labels, nc=nc, class_weights=cw)
            rng_iw = np.random.default_rng(seed + epoch)
            train_loader.set_indices(rng_iw.choice(len(train_ds), size=len(train_ds), p=iw / iw.sum()))
        mloss = np.zeros(3)
        nb = 0
        epoch_metrics = []
        t_epoch = time.time()
        # anchor this epoch's multi-scale draws to its first global step —
        # a host-side counter, deterministic across resume, no device fetch
        train_loader.ms_offset = epoch * steps_per_epoch
        for imgs, targets, mask, _ in train_loader:
            callbacks.run("on_train_batch_start")
            batch = shard_batch(mesh, (imgs, targets, mask))
            state, metrics = step_fn(state, *batch)
            # keep metrics as device arrays — float() here would block the
            # async dispatch queue every step, serializing H2D upload of the
            # next batch against the current step's compute
            epoch_metrics.append(metrics)
            ni = epoch * steps_per_epoch + nb  # global batch counter
            nb += 1
            if ni < 3:  # first-3-batch mosaics (reference loggers/__init__.py:124-136)
                callbacks.run("on_train_batch_end", ni=ni, imgs=imgs, targets=targets, mask=mask)
            else:
                callbacks.run("on_train_batch_end", ni=ni)
        if epoch_metrics:  # one sync at epoch end instead of one per step:
            # stack on device (async dispatches), then ONE blocking fetch —
            # per-scalar float() here would pay 3 D2H round trips per step
            mloss = np.asarray(jnp.stack(
                [jnp.stack([m["lbox"], m["lobj"], m["lcls"]]) for m in epoch_metrics]
            )).mean(axis=0)
        lr_now = float(schedules.lr(np.float32(int(state["step"]))))
        LOGGER.info(
            f"epoch {epoch + 1}/{epochs}: box {mloss[0]:.4f} obj {mloss[1]:.4f} cls {mloss[2]:.4f} "
            f"lr {lr_now:.5f} ({time.time() - t_epoch:.1f}s)"
        )
        callbacks.run("on_train_epoch_end", epoch=epoch)

        # per-epoch validation with EMA weights (reference train.py:446-459)
        fi = 0.0
        if val_loader is not None:
            ema_vars = dict(state["ema"]["ema"])
            if jax.process_count() > 1:
                # multi-host: the EMA arrays are committed to the GLOBAL mesh,
                # but only process 0 has a val loader — materialize host-local
                # copies (fully-replicated arrays are host-addressable) so the
                # local val forward doesn't mix global and local placements
                ema_vars = jax.tree.map(np.asarray, ema_vars)
            # single-host: EMA weights stay device-resident — host copies
            # would re-upload all params into the jitted val forward per batch
            ema_model = model.replace_variables(ema_vars)
            results, maps, _ = validator.run(
                data_dict, model=ema_model, batch_size=batch_size, imgsz=imgsz,
                dataloader=val_loader, loss_cfg=loss_cfg, compute_loss_flag=True, names=names,
                single_cls=single_cls, plots=(epoch == epochs - 1) and not noplots, save_dir=save_dir,
                # data-parallel val over the training mesh's devices (the
                # reference's DDP validates on rank 0 only, train.py:446);
                # pass the mesh itself — EMA params live replicated on ITS
                # device set, which may be a subset of jax.devices().
                # multi-host: val is process-0-local (host-local loader +
                # host-local EMA copy above), so no sharding
                sharded=mesh if (mesh.devices.size > 1 and jax.process_count() == 1) else False,
                callbacks=callbacks,  # on_val_image_end -> logger prediction depth
            )
            fi = float(np.asarray(fitness(np.array(results).reshape(1, -1))).reshape(-1)[0])
            callbacks.run("on_val_end", epoch=epoch)
        # 13 standard keys -> Loggers fan-out (CSV always, TB/W&B/... when active)
        vals = [*mloss, *[float(v) for v in (list(results) + [0.0] * 7)[:7]], lr_now, lr_now, lr_now]
        callbacks.run("on_fit_epoch_end", epoch=epoch, fitness=fi, vals=vals)

        # checkpointing (reference train.py:469-489)
        if not nosave and jax.process_index() == 0:
            host_state = jax.tree.map(np.asarray, state)
            meta = {
                "epoch": epoch, "best_fitness": max(best_fitness, fi),
                "names": {int(k): v for k, v in names.items()},
                "hyp": hyp, "results": [float(x) for x in results],
            }
            save_checkpoint(wdir / "last", host_state, spec=model.spec, meta=meta)
            if fi >= best_fitness:
                best_fitness = fi
                save_checkpoint(wdir / "best", host_state, spec=model.spec, meta=meta)
            if save_period > 0 and epoch % save_period == 0:
                save_checkpoint(wdir / f"epoch{epoch}", host_state, spec=model.spec, meta=meta)
            callbacks.run("on_model_save", epoch=epoch, last=str(wdir / "last"),
                          fitness=float(fi), best=bool(fi >= best_fitness),
                          final=epoch == epochs - 1, save_period=save_period)

        if jax.process_count() > 1:
            # fitness is computed on process 0 only (val_loader gating above);
            # every host must see the SAME value or a triggered stop leaves
            # the others blocked in the next epoch's collective — the analog
            # of the reference's broadcast_object_list stop flag
            # (reference train.py:492-496)
            from jax.experimental import multihost_utils

            fi = float(multihost_utils.broadcast_one_to_all(np.float32(fi)))
        if stopper(epoch, fi):
            LOGGER.info(f"EarlyStopping: no improvement in {patience} epochs, stopping at epoch {epoch}")
            break

    # finalize (reference train.py:502-527)
    if not nosave and jax.process_index() == 0:
        for f in (wdir / "last", wdir / "best"):
            if f.exists():
                strip_checkpoint(f)
    LOGGER.info(f"\n{final_epoch - start_epoch + 1} epochs completed in {(time.time() - t_start) / 3600:.3f} hours.")
    callbacks.run("on_train_end")
    callbacks.run("teardown")
    return best_fitness, results, save_dir


def _resume_model(save_dir):
    """Re-hydrate model + train state from save_dir/weights/last (reference train.py:642-654)."""
    from yolov3_tpu.utils.checkpoint import load_model_from_checkpoint

    last = Path(save_dir) / "weights" / "last"
    assert last.exists(), f"resume checkpoint not found at {last}"
    model = load_model_from_checkpoint(last)
    from yolov3_tpu.utils.general import yaml_load

    meta = yaml_load(last / "checkpoint.yaml")
    start_epoch = int(meta.get("epoch", -1)) + 1
    best_fitness = float(meta.get("best_fitness", 0.0))
    LOGGER.info(f"Resuming training from {last} at epoch {start_epoch}")
    return model, start_epoch, best_fitness


def _with_new_anchors(model, anchors_px):
    """Swap spec anchors (pixel units) preserving weights."""
    import dataclasses

    nl, na = model.spec.nl, model.spec.na
    new_anchors = tuple(tuple(float(v) for v in anchors_px.reshape(nl, na * 2)[i]) for i in range(nl))
    spec = dataclasses.replace(model.spec, anchors=new_anchors)
    return DetectionModel(spec, model.variables, model.dtype, model.names)


def _transfer_to_nc(model, cfg, nc):
    """Partial transfer: keep backbone weights, re-init Detect for a new class count
    (intersect_dicts parity, reference train.py:207-211)."""
    new = DetectionModel.from_config(cfg or model.spec.name, nc=nc, imgsz=256)
    old_p = model.variables["params"]
    new_p = dict(new.variables["params"])
    for k in new_p:
        if k in old_p and jax.tree.all(
            jax.tree.map(lambda a, b: a.shape == b.shape, old_p[k], new_p[k])
        ):
            new_p[k] = old_p[k]
    variables = {"params": new_p, "batch_stats": model.variables.get("batch_stats", new.variables["batch_stats"])}
    return DetectionModel(new.spec, variables, new.dtype, new.names)
