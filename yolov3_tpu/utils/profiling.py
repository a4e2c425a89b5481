"""Profiling: XLA cost analysis (FLOPs), memory analysis, trace capture, layer timing.

TPU counterparts of the reference's profiling stack (SURVEY.md §5):
thop GFLOPs -> compiled.cost_analysis(); CUDA-event timers -> block_until_ready
wall timers; torch.profiler -> jax.profiler traces (view in TensorBoard/XProf);
AutoBatch VRAM fit -> compiled.memory_analysis() vs HBM capacity.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np

from yolov3_tpu.utils.general import LOGGER


def compile_forward(model, batch=1, imgsz=640, train=False):
    """AOT-compile the model forward; returns the compiled executable."""
    import jax.numpy as jnp

    def fwd(variables, x):
        return model.module.apply(variables, x, train=False)

    x = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    return jax.jit(fwd).lower(model.variables, x).compile()


def model_flops(model, imgsz=640, batch=1):
    """Forward FLOPs from XLA cost analysis (thop.profile parity, yolo.py:152)."""
    try:
        c = compile_forward(model, batch, imgsz)
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0))
    except Exception as e:  # noqa: BLE001
        LOGGER.warning(f"cost_analysis unavailable: {e}")
        return 0.0


def model_memory_bytes(model, batch, imgsz=640, train=False):
    """Peak device memory estimate for a forward at the given batch size."""
    c = compile_forward(model, batch, imgsz, train)
    ma = c.memory_analysis()
    total = (
        getattr(ma, "temp_size_in_bytes", 0)
        + getattr(ma, "argument_size_in_bytes", 0)
        + getattr(ma, "output_size_in_bytes", 0)
    )
    return int(total)


def model_info(model, imgsz=640, verbose=False):
    """Log params + GFLOPs summary (reference model_info, torch_utils)."""
    n_p = model.num_params()
    gflops = model_flops(model, imgsz) / 1e9
    LOGGER.info(f"{model.spec.name} summary: {len(model.spec.layers)} layers, {n_p:,} parameters, {gflops:.1f} GFLOPs @ {imgsz}px")
    return {"params": n_p, "gflops": gflops}


@contextlib.contextmanager
def trace(logdir="runs/profile"):
    """jax.profiler trace context — open the output in TensorBoard/XProf."""
    jax.profiler.start_trace(str(logdir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOGGER.info(f"Profile trace saved to {logdir}")


def speed_benchmark(fn, args, n=10, warmup=2, label=""):
    """Timed repeated execution with device sync (torch_utils.profile parity)."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    if label:
        LOGGER.info(f"{label}: {dt * 1e3:.2f} ms/iter")
    return dt


def prune(params, amount=0.3):
    """Global magnitude pruning of conv kernels (reference torch_utils.py:196-204):
    zero the smallest-|w| fraction per kernel. Returns (params, sparsity)."""
    import jax.numpy as jnp

    def prune_leaf(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name != "kernel" or x.ndim < 4:
            return x
        k = int(x.size * amount)
        if k == 0:
            return x
        thresh = jnp.sort(jnp.abs(x).reshape(-1))[k]
        return jnp.where(jnp.abs(x) < thresh, 0.0, x)

    pruned = jax.tree_util.tree_map_with_path(prune_leaf, params)
    total = sum(x.size for x in jax.tree.leaves(pruned))
    zeros = sum(int((np.asarray(x) == 0).sum()) for x in jax.tree.leaves(pruned))
    LOGGER.info(f"pruned model to {zeros / total:.3f} global sparsity")
    return pruned, zeros / total


def profile_layers(model, imgsz=640, batch=1, reps=10):
    """Per-layer forward profile: time + GFLOPs + params per spec layer
    (BaseModel._profile_one_layer parity, reference yolo.py:149-161: 10 reps +
    thop GFLOPs per module; here wall timers + XLA cost_analysis).

    Walks the graph eagerly, jitting each layer module in isolation on its
    real inputs. Returns a list of per-layer dicts and logs a table.
    """
    import jax.numpy as jnp

    from yolov3_tpu.models.detect_head import Detect
    from yolov3_tpu.nn.modules import MODULE_REGISTRY, MULTI_INPUT_OPS

    spec = model.spec
    params = model.variables["params"]
    bstats = model.variables.get("batch_stats", {})

    def layer_vars(name):
        v = {"params": params.get(name, {})}
        if name in bstats:
            v["batch_stats"] = bstats[name]
        return v

    def _fields(cls):
        import dataclasses

        return {f.name for f in dataclasses.fields(cls)}

    x = jnp.zeros((batch, imgsz, imgsz, 3), model.dtype)
    y, out, prev_i = {}, x, -1
    rows = []
    LOGGER.info(f"{'layer':>6} {'op':<18}{'params':>12}{'GFLOPs':>10}{'ms':>9}  output")
    for ls in spec.layers:
        if ls.op == "Detect":
            inp = [out if j == prev_i else y[j] for j in ls.f]
            mod = Detect(nc=spec.nc, na=spec.na, strides=spec.strides, dtype=model.dtype)
        elif ls.op in MULTI_INPUT_OPS:
            inp = [out if j == prev_i else y[j] for j in ls.f]
            mod = None
        else:
            inp = out if ls.f[0] == prev_i else y[ls.f[0]]
            mod = None

        sub_times, sub_flops, sub_params, result = 0.0, 0.0, 0, inp
        names = [f"l{ls.i}"] if ls.n == 1 or ls.op == "Detect" else [f"l{ls.i}_{r}" for r in range(ls.n)]
        for name in names:
            if mod is None:
                cls = MODULE_REGISTRY[ls.op]
                fields = _fields(cls)
                kw = {}
                if "dtype" in fields:
                    kw["dtype"] = model.dtype
                if getattr(model, "fused", False) and "fused" in fields:
                    kw["fused"] = True
                m = cls(*ls.args, **kw)
            else:
                m = mod
            v = layer_vars(name)
            fn = jax.jit(lambda vv, a, _m=m: _m.apply(vv, a, train=False))
            try:
                compiled = fn.lower(v, result).compile()
                flops = float((compiled.cost_analysis() or {}).get("flops", 0.0))
            except Exception:  # noqa: BLE001
                flops = 0.0
            t = speed_benchmark(fn, (v, result), n=reps, warmup=2)
            result = fn(v, result)
            sub_times += t
            sub_flops += flops
            sub_params += sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))

        shape = [tuple(r.shape) for r in result] if isinstance(result, (tuple, list)) else tuple(result.shape)
        rows.append({
            "i": ls.i, "op": ls.op, "params": sub_params,
            "gflops": sub_flops / 1e9, "ms": sub_times * 1e3, "out": shape,
        })
        LOGGER.info(
            f"{ls.i:>6} {ls.op:<18}{sub_params:>12,}{sub_flops / 1e9:>10.2f}{sub_times * 1e3:>9.2f}  {shape}"
        )
        out, prev_i = result, ls.i
        if ls.i in spec.save:
            y[ls.i] = out
        if ls.op == "Detect":
            break
    total_ms = sum(r["ms"] for r in rows)
    total_gflops = sum(r["gflops"] for r in rows)
    LOGGER.info(f"{'total':>6} {'':<18}{model.num_params():>12,}{total_gflops:>10.2f}{total_ms:>9.2f}")
    return rows
