"""Is lax.top_k the decode leg's cost, and does approx_max_k beat it?

The fused serving decode (models/detect_head._decode_topk_scales) spends its
non-elementwise time in one lax.top_k per scale over (bs, na*ny*nx) masked
scores — 19200/4800/1200 rows at 640px. XLA lowers top_k to a sorting
network; TPU has a hardware-friendly approximate alternative
(jax.lax.approx_max_k, the MIPS kernel). This probe scan-times the three
per-scale top-k calls alone, both ways, at bench shapes (bs 128, k
256/128/64), plus a full-decode A/B through decode_topk_nhwc.

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/topk_probe.py
"""

import time

import numpy as np


def main(bs=128, iters=20):
    import jax
    import jax.numpy as jnp

    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    shapes = [(bs, 19200), (bs, 4800), (bs, 1200)]
    ks = (256, 128, 64)
    rng = np.random.default_rng(0)
    # serving-like score planes: almost all masked to -1, a tail above 0
    ops = []
    for (b, m) in shapes:
        x = np.full((b, m), -1.0, np.float32)
        nval = int(m * 0.01)
        idx = rng.integers(0, m, size=(b, nval))
        for i in range(b):
            x[i, idx[i]] = rng.random(nval).astype(np.float32)
        ops.append(jax.device_put(jnp.asarray(x)))

    def timed(fn, *args):
        @jax.jit
        def scan_run(a):
            def body(c, _):
                outs = fn(*a)
                s = sum(jnp.sum(o[0]) for o in outs)
                return c + s, ()
            tot, _ = jax.lax.scan(body, 0.0, None, length=iters)
            return tot

        r = scan_run(args)
        np.asarray(r)  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(scan_run(args))
            best = min(best, time.perf_counter() - t0)
        return best / iters * 1e3  # ms per iteration

    def exact(*xs):
        return [jax.lax.top_k(x, k) for x, k in zip(xs, ks)]

    def approx(*xs):
        return [jax.lax.approx_max_k(x, k) for x, k in zip(xs, ks)]

    t_exact = timed(exact, *ops)
    t_approx = timed(approx, *ops)
    print(f"top_k (3 scales, bs{bs}):      {t_exact:8.3f} ms/batch")
    print(f"approx_max_k (3 scales, bs{bs}): {t_approx:8.3f} ms/batch")

    # recall check at the planted-load regime: how often does approx miss a
    # valid (score>0) candidate that top_k would have kept?
    miss = 0
    tot = 0
    for x, k in zip(ops, ks):
        _, ti = jax.lax.top_k(x, k)
        _, ai = jax.lax.approx_max_k(x, k)
        xv = np.asarray(x)
        for i in range(min(bs, 16)):
            want = {j for j in np.asarray(ti)[i] if xv[i, j] > 0}
            got = {j for j in np.asarray(ai)[i] if xv[i, j] > 0}
            miss += len(want - got)
            tot += len(want)
    print(f"approx recall on valid candidates: {1 - miss / max(tot, 1):.6f} ({miss}/{tot} missed)")


if __name__ == "__main__":
    main()
