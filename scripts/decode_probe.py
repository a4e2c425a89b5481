"""Decode-leg breakdown: where do the ~7 ms/batch of fused top-k decode go?

docs/PERF.md attributes the e2e-over-forward gap at bs128/640px to decode
7.2 ms + NMS 1.9 ms; scripts/topk_probe.py pinned the three lax.top_k calls
at 1.50 ms. This probe splits the remaining decode cost over the real head
shapes ((bs,80,80,255)/(40,40)/(20,20) bf16 NHWC):

  score      obj-sigmoid * sigmoid(max cls logit) + conf mask   (reads 255ch)
  score+arg  + argmax over the 80 cls logits                    (2nd reduce?)
  topk       lax.top_k over the masked (bs, M) planes
  full       decode_topk_nhwc end-to-end (score+arg+topk+gather+box decode)

Inputs are made carry-dependent (feat + c) so XLA cannot hoist the work out
of the timing scan; syncs consume every output element nonlinearly (sum of
squares) per the checksum-collapse rule (CLAUDE.md).

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/decode_probe.py
"""

import time

import numpy as np


def main(bs=128, iters=10):
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from yolov3_tpu.models.detect_head import decode_topk_nhwc
    from yolov3_tpu.utils.general import enable_compilation_cache

    enable_compilation_cache()

    na, no = 3, 85
    shapes = [(bs, 80, 80, na * no), (bs, 40, 40, na * no), (bs, 20, 20, na * no)]
    ks = (256, 128, 64)
    conf = 0.25
    anchors = np.array(
        [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119], [116, 90, 156, 198, 373, 326]],
        np.float32,
    ).reshape(3, 3, 2)
    strides = (8.0, 16.0, 32.0)

    rng = np.random.default_rng(0)
    # serving-like logits: obj mostly very negative, ~1% above threshold
    feats = []
    for (b, ny, nx, ch) in shapes:
        x = rng.normal(0, 1, (b, ny, nx, ch)).astype(np.float32)
        x[..., 4::no] -= 6.0  # push obj sigmoid ~0.002
        hot = rng.random((b, ny, nx, na)) < 0.01
        xo = x[..., 4::no]
        xo[hot] += 9.0  # ~1% candidates above conf
        x[..., 4::no] = xo
        feats.append(jax.device_put(jnp.asarray(x, jnp.bfloat16)))

    def timed(make_out, args, tag):
        @jax.jit
        def scan_run(a):
            def body(c, _):
                shifted = [f + c.astype(jnp.bfloat16) for f in a]
                outs = make_out(shifted)
                s = sum(jnp.sum(jnp.square(o.astype(jnp.float32))) for o in outs)
                return c + s * 1e-20, ()
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return tot

        r = scan_run(feats)
        np.asarray(r)  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(scan_run(args))
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        print(f"{tag:34s} {ms:8.3f} ms/batch", flush=True)
        return ms

    def masked_scores(fs):
        outs = []
        for f in fs:
            b, ny, nx, ch = f.shape
            flat = f.reshape(b, ny * nx * na, no)
            obj = nn.sigmoid(flat[..., 4].astype(jnp.float32))
            cmax = jnp.max(flat[..., 5:], axis=-1).astype(jnp.float32)
            score = obj * nn.sigmoid(cmax)
            valid = (score > conf) & (obj > conf)
            outs.append(jnp.where(valid, score, -1.0))
        return outs

    def score_only(fs):
        return masked_scores(fs)

    def score_arg(fs):
        outs = list(masked_scores(fs))
        for f in fs:
            b, ny, nx, ch = f.shape
            flat = f.reshape(b, ny * nx * na, no)
            outs.append(jnp.argmax(flat[..., 5:], axis=-1).astype(jnp.float32))
        return outs

    def topk_of_scores(fs):
        outs = []
        for m, k in zip(masked_scores(fs), ks):
            s, i = jax.lax.top_k(m, k)
            outs.append(s)
            outs.append(i.astype(jnp.float32))
        return outs

    def full(fs):
        boxes, scores, cls = decode_topk_nhwc(fs, anchors, strides, ks, conf)
        return [boxes, scores, cls]

    def full_pallas(fs):
        boxes, scores, cls = decode_topk_nhwc(fs, anchors, strides, ks, conf, use_pallas=True)
        return [boxes, scores, cls]

    def score_pallas_only(fs):
        from yolov3_tpu.ops.score_pallas import masked_scores_pallas

        outs = []
        for f in fs:
            b, ny, nx, ch = f.shape
            s, a = masked_scores_pallas(f.reshape(b, ny * nx, ch), na, no, conf)
            outs.append(s)
            outs.append(a.astype(jnp.float32))
        return outs

    t_score = timed(score_only, feats, "score+mask (reads all 255ch)")
    t_arg = timed(score_arg, feats, "score+mask+argmax")
    t_topk = timed(topk_of_scores, feats, "score+mask+top_k")
    t_full = timed(full, feats, "full decode_topk_nhwc")
    t_ps = timed(score_pallas_only, feats, "pallas score kernel only")
    t_pf = timed(full_pallas, feats, "full decode (pallas score)")
    print(
        f"\nattribution: score={t_score:.3f}  +argmax={t_arg - t_score:.3f}  "
        f"+topk={t_topk - t_arg:.3f}(over score+arg basis may differ)  "
        f"+gather/box={t_full - t_topk:.3f}"
    )
    # bandwidth floor: one bf16 read of every head element
    nbytes = sum(np.prod(s) for s in shapes) * 2
    print(f"one-pass bf16 floor @819GB/s: {nbytes / 819e9 * 1e3:.3f} ms ({nbytes / 1e6:.0f} MB)")


if __name__ == "__main__":
    main()
