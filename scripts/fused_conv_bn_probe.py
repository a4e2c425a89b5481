"""Measured go/no-go for the fused conv+BN-stats Pallas kernel (VERDICT r4 #2).

Per representative flagship train-layer shape (bs128@640 column sizes), times
three jitted programs, each N reps inside one lax.scan synced on a checksum
(CLAUDE.md timing rules — no MB-scale fetch in the timed region):

  xla_conv        lax.conv alone (the floor the Pallas conv must approach)
  xla_train       conv + f32 batch mean/var + normalize + SiLU — the exact
                  per-layer train-mode pattern XLA compiles today
  pallas_fused    conv3x3_bn_stats (conv + stats in one pass over Y) + the
                  same normalize + SiLU from the fused stats

The fused kernel wins only if (pallas_fused < xla_train) by more than noise;
the theoretical saving is one full HBM read of Y (the stats pass).

Run:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/fused_conv_bn_probe.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.utils.general import enable_compilation_cache

# flagship conv shapes at bs128@640 (stride-1 3x3 stages; H=W column sizes)
SHAPES = [
    # B, H, W, Cin, Cout, th
    (128, 160, 160, 64, 128, 8),
    (128, 80, 80, 128, 256, 8),
    (128, 40, 40, 256, 512, 8),
    (128, 20, 20, 512, 1024, 4),
]
REPS = 8


def timed(fn, *args):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    chk = np.asarray(jax.tree.leaves(out)[-1])  # tiny sync fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[-1])
        best = min(best, time.perf_counter() - t0)
    del chk
    return best / REPS


def main():
    enable_compilation_cache()
    from yolov3_tpu.ops.conv_bn_pallas import conv3x3_bn_stats

    dt = jnp.bfloat16
    print(f"backend={jax.default_backend()} dtype=bfloat16 reps={REPS}")
    print(f"{'shape':>28} {'xla_conv':>9} {'xla_train':>9} {'pallas':>9} {'fused_win':>9}")
    for B, H, W, Cin, Cout, th in SHAPES:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32), dt)
        w = jnp.asarray((rng.normal(size=(3, 3, Cin, Cout)) * 0.05).astype(np.float32), dt)
        gamma = jnp.ones((Cout,), jnp.float32)
        beta = jnp.zeros((Cout,), jnp.float32)

        def conv(xx):
            return jax.lax.conv_general_dilated(
                xx, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=dt,
            )

        def norm_act(y, mean, var):
            inv = gamma * jax.lax.rsqrt(var + 1e-3)
            z = (y.astype(jnp.float32) - mean) * inv + beta
            return (z * jax.nn.sigmoid(z)).astype(dt)  # SiLU

        @jax.jit
        def xla_conv(xx):
            def body(c, _):
                y = conv(xx + c)
                return c, jnp.sum(y[..., 0].astype(jnp.float32))

            _, s = jax.lax.scan(body, jnp.zeros((), dt), None, length=REPS)
            return s

        @jax.jit
        def xla_train(xx):
            def body(c, _):
                y = conv(xx + c)
                yf = y.astype(jnp.float32)
                mean = jnp.mean(yf, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(yf), axis=(0, 1, 2)) - mean * mean
                z = norm_act(y, mean, var)
                return c, jnp.sum(z[..., 0].astype(jnp.float32))

            _, s = jax.lax.scan(body, jnp.zeros((), dt), None, length=REPS)
            return s

        @jax.jit
        def pallas_fused(xx):
            def body(c, _):
                y, mean, var = conv3x3_bn_stats(xx + c, w, th=th)
                z = norm_act(y, mean, var)
                return c, jnp.sum(z[..., 0].astype(jnp.float32))

            _, s = jax.lax.scan(body, jnp.zeros((), dt), None, length=REPS)
            return s

        @jax.jit
        def xla_conv_bwd(xx):
            # fwd + dgrad + wgrad = 3 conv-equivalent FLOP volumes; the ratio
            # t_bwd/t_conv vs the ideal 3.0 measures XLA's conv-backward
            # kernel efficiency — the residual the train-step roofline
            # attribution blames (docs/PERF.md round-4)
            def one(c):
                def f(xi, wi):
                    y = jax.lax.conv_general_dilated(
                        xi + c, wi, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=dt,
                    )
                    # nonlinear loss: cotangent = y, so dgrad/wgrad are real
                    # data-dependent convolutions (a linear sum(y) loss lets
                    # XLA constant-fold the whole backward away)
                    return 0.5 * jnp.sum(jnp.square(y.astype(jnp.float32)))

                gx, gw = jax.grad(f, argnums=(0, 1))(xx, w)
                # FULL sums — but still NOT collapse-proof: the measured runs
                # imply a backward rate above the chip's bf16 peak, i.e. XLA
                # rewrites parts of dgrad/wgrad feeding a scalar sum into
                # cheap reductions even with the nonlinear loss, and the
                # cost model still reports the pre-rewrite 3x conv FLOPs.
                # This leg is context only; the go/no-go rests on
                # xla_train vs pallas_fused, which consume every channel
                # through the batch statistics (see docs/PERF.md round-5).
                return jnp.sum(gx.astype(jnp.float32)) + jnp.sum(
                    gw.astype(jnp.float32))

            def body(c, _):
                return c, one(c)

            _, s = jax.lax.scan(body, jnp.zeros((), dt), None, length=REPS)
            return s

        try:
            t_pallas = timed(pallas_fused, x) * 1e3
        except Exception as e:  # noqa: BLE001
            t_pallas = float("nan")
            print(f"  pallas failed for {(B, H, W, Cin, Cout)}: {type(e).__name__}: {e}")
        t_conv = timed(xla_conv, x) * 1e3
        t_train = timed(xla_train, x) * 1e3
        t_bwd = timed(xla_conv_bwd, x) * 1e3
        # self-check: the executed backward really carries ~3x the FLOPs
        fl_f = jax.jit(xla_conv).lower(x).compile().cost_analysis().get("flops", 0)
        fl_b = jax.jit(xla_conv_bwd).lower(x).compile().cost_analysis().get("flops", 0)
        win = (t_train - t_pallas) / t_train * 100 if t_pallas == t_pallas else float("nan")
        print(f"{str((B, H, W, Cin, Cout)):>28} {t_conv:>8.2f} {t_train:>8.2f} "
              f"{t_pallas:>8.2f} {win:>8.1f}%  bwd(f+d+w) {t_bwd:>6.2f} "
              f"(= {t_bwd / t_conv:>4.2f}x fwd time at "
              f"{fl_b / max(fl_f, 1):.2f}x cost-model FLOPs)")


if __name__ == "__main__":
    main()
