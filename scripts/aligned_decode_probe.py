"""Probe: does a 128-lane-padded head layout fix the decode score pass?

docs/PERF.md round-5: the XLA score pass over the natural (bs, ny, nx, 255)
head output costs 6.25 ms/batch at bs128/640 against a 0.67 ms one-pass
floor, because the (na=3, no=85) split of the 255-lane minor dim is not
tile-aligned (XLA materializes a relayout); a Pallas one-read kernel lost
4.5x to in-VMEM lane rotates (ops/score_pallas.py).

The remaining layout lever: pad the head conv to na*128 = 384 output
channels (anchor a's 85 outputs at lanes [a*128, a*128+85), zeros between).
Then (bs, ny, nx, 384) -> (bs, M, 3, 128) is a FREE tile-aligned view and
the per-anchor obj/cls accesses are in-register lane ops. Cost side: the
head tensor grows 548 -> 825 MB (+0.68 ms of conv-output write + score-pass
read at 819 GB/s) and the head 1x1 convs gain ~50% FLOPs (~0.5% of the
model). This probe measures BOTH sides on synthetic tensors:

  score@255    baseline score+mask pass on the (…, 255) layout
  score@384    score+mask pass on the padded (…, 384) layout
  full@255     decode_topk_nhwc end-to-end (XLA path)
  full@384     padded-layout decode end-to-end (same candidate flat order)
  conv255/384  the three head 1x1 convs at each width (the producer-side delta)

Run on TPU: PYTHONPATH=/root/repo:/root/.axon_site python scripts/aligned_decode_probe.py
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
    pad = 128
    shapes = [(bs, 80, 80), (bs, 40, 40), (bs, 20, 20)]
    cins = (256, 512, 1024)  # head conv input widths (yolov3 P3/P4/P5)
    ks = (256, 128, 64)
    conf = 0.25
    anchors = np.array(
        [[10, 13, 16, 30, 33, 23], [30, 61, 62, 45, 59, 119], [116, 90, 156, 198, 373, 326]],
        np.float32,
    ).reshape(3, 3, 2)
    strides = (8.0, 16.0, 32.0)

    rng = np.random.default_rng(0)
    feats, feats_pad, pre = [], [], []
    for (b, ny, nx), cin in zip(shapes, cins):
        x = rng.normal(0, 1, (b, ny, nx, na * no)).astype(np.float32)
        x[..., 4::no] -= 6.0
        hot = rng.random((b, ny, nx, na)) < 0.01
        xo = x[..., 4::no]
        xo[hot] += 9.0
        x[..., 4::no] = xo
        feats.append(jax.device_put(jnp.asarray(x, jnp.bfloat16)))
        xp = np.full((b, ny, nx, na * pad), -20.0, np.float32)  # pad lanes: sigmoid ~ 0
        for a in range(na):
            xp[..., a * pad : a * pad + no] = x[..., a * no : (a + 1) * no]
        feats_pad.append(jax.device_put(jnp.asarray(xp, jnp.bfloat16)))
        pre.append(jax.device_put(jnp.asarray(
            rng.normal(0, 0.1, (b, ny, nx, cin)), jnp.bfloat16)))

    def timed(make_out, args, tag):
        @jax.jit
        def scan_run(a):
            def body(c, _):
                shifted = [f + c.astype(f.dtype) for f in a]
                outs = make_out(shifted)
                s = sum(jnp.sum(jnp.square(o.astype(jnp.float32))) for o in outs)
                return c + s * 1e-20, ()
            tot, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return tot

        r = scan_run(args)
        np.asarray(r)  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(scan_run(args))
            best = min(best, time.perf_counter() - t0)
        ms = best / iters * 1e3
        print(f"{tag:34s} {ms:8.3f} ms/batch", flush=True)
        return ms

    def score255(fs):
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

    def score384(fs):
        outs = []
        for f in fs:
            b, ny, nx, ch = f.shape
            v = f.reshape(b, ny * nx, na, pad)  # free tile-aligned view
            obj = nn.sigmoid(v[..., 4].astype(jnp.float32))  # (b, M, na)
            cmax = jnp.max(v[..., 5:no], axis=-1).astype(jnp.float32)
            score = obj * nn.sigmoid(cmax)
            valid = (score > conf) & (obj > conf)
            outs.append(jnp.where(valid, score, -1.0).reshape(b, ny * nx * na))
        return outs

    def full255(fs):
        boxes, scores, cls = decode_topk_nhwc(fs, anchors, strides, ks, conf)
        return [boxes, scores, cls]

    def full384(fs):
        boxes_all, scores_all, cls_all = [], [], []
        for i, f in enumerate(fs):
            b, ny, nx, ch = f.shape
            m = ny * nx
            k = min(ks[i], na * m)
            v = f.reshape(b, m, na, pad)
            obj = nn.sigmoid(v[..., 4].astype(jnp.float32))
            cls = v[..., 5:no]
            cmax = jnp.max(cls, axis=-1).astype(jnp.float32)
            score = nn.sigmoid(cmax) * obj
            valid = (score > conf) & (obj > conf)
            masked = jnp.where(valid, score, -1.0).reshape(b, m * na)  # (y,x,a) order
            top_s, top_i = jax.lax.top_k(masked, k)
            a_idx = top_i % na
            yx = top_i // na
            y_idx = yx // nx
            x_idx = yx % nx
            flat = f.reshape(b, m * na, pad)
            sel = jnp.take_along_axis(flat, top_i[..., None], axis=1)  # (b, k, pad)
            sig = nn.sigmoid(sel[..., :4].astype(jnp.float32))
            carg = jnp.argmax(sel[..., 5:no], axis=-1).astype(jnp.float32)
            gx = x_idx.astype(jnp.float32) - 0.5
            gy = y_idx.astype(jnp.float32) - 0.5
            cx = (sig[..., 0] * 2 + gx) * strides[i]
            cy = (sig[..., 1] * 2 + gy) * strides[i]
            awh = jnp.asarray(anchors[i])[a_idx]
            w = (sig[..., 2] * 2) ** 2 * awh[..., 0]
            h = (sig[..., 3] * 2) ** 2 * awh[..., 1]
            boxes_all.append(jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1))
            scores_all.append(top_s)
            cls_all.append(carg)
        return [jnp.concatenate(x, axis=1) for x in (boxes_all, scores_all, cls_all)]

    def head_convs(width):
        kers = [jax.device_put(jnp.asarray(rng.normal(0, 0.02, (1, 1, cin, width)), jnp.bfloat16))
                for cin in cins]

        def run(ps):
            return [jax.lax.conv_general_dilated(
                        p, k, (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    for p, k in zip(ps, kers)]
        return run

    t_s255 = timed(score255, feats, "score+mask @255")
    t_s384 = timed(score384, feats_pad, "score+mask @384 (aligned)")
    t_f255 = timed(full255, feats, "full decode @255 (XLA path)")
    t_f384 = timed(full384, feats_pad, "full decode @384 (aligned)")
    t_c255 = timed(head_convs(na * no), pre, "head 1x1 convs -> 255")
    t_c384 = timed(head_convs(na * pad), pre, "head 1x1 convs -> 384")
    nb = sum(b * ny * nx for b, ny, nx in shapes)
    print(f"\nfloors @819GB/s: 255ch {nb * na * no * 2 / 819e9 * 1e3:.3f} ms, "
          f"384ch {nb * na * pad * 2 / 819e9 * 1e3:.3f} ms")
    print(f"net (full+conv): 255 = {t_f255 + t_c255:.3f} ms, 384 = {t_f384 + t_c384:.3f} ms, "
          f"delta = {t_f255 + t_c255 - t_f384 - t_c384:+.3f} ms/batch")


if __name__ == "__main__":
    main()
