"""Module zoo: TPU-native (NHWC, flax.linen) building blocks.

Functional re-design of the reference's torch module zoo
(reference models/common.py:57-428). Key departures from the reference:

- NHWC layout throughout (XLA's preferred TPU conv layout; NCHW in the
  reference is a CUDA/cuDNN convention).
- BatchNorm carried as a flax `batch_stats` collection; eps=1e-3 and
  torch-momentum 0.03 (flax decay 0.97) matching the reference's
  initialize_weights BN settings.
- `dtype` threads a bf16 compute policy through convs (params stay fp32);
  the reference's AMP GradScaler is unnecessary on TPU (bf16 keeps the fp32
  exponent range).
- Conv+BN fusion (`fuse()` parity, reference models/yolo.py:163-172) is a
  pure parameter transform in `yolov3_tpu.models.fuse`, not a module rewrite.

Modules take `train: bool` to select BN batch-vs-running statistics.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from yolov3_tpu.nn.activations import get_activation

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)),
# i.e. variance_scaling(1/3, fan_in, uniform). Kept for training-dynamics parity.
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class TorchBatchNorm(nn.BatchNorm):
    """flax BatchNorm with torch's *unbiased* running variance.

    torch BatchNorm2d normalizes with the biased batch variance but stores the
    Bessel-corrected (n/(n-1)) variance in running_var; flax stores the biased
    one. The gap is invisible at production shapes (n = B*H*W, correction
    <1e-4) but shows up on small grids (deep layers of small test images) and
    would make N-step training-trajectory parity vs the reference
    (reference train.py:377-435) drift in batch_stats. Normalization numerics
    are flax's own (_compute_stats/_normalize) — only the stored var changes.
    """

    @nn.compact
    def __call__(self, x, use_running_average=None, *, mask=None):
        from flax.linen import normalization as _fn

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feature_axes = _fn._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim) if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]

        ra_mean = self.variable("batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), feature_shape)
        ra_var = self.variable("batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), feature_shape)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean, var = _fn._compute_stats(
                x,
                reduction_axes,
                dtype=self.dtype,
                axis_name=self.axis_name if not self.is_initializing() else None,
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance,
                mask=mask,
                force_float32_reductions=self.force_float32_reductions,
            )
            if not self.is_initializing():
                n = 1.0
                for i in reduction_axes:
                    n *= x.shape[i]
                bessel = n / max(n - 1.0, 1.0)
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * (var * bessel)

        return _fn._normalize(
            self, x, mean, var, reduction_axes, feature_axes,
            self.dtype, self.param_dtype, self.epsilon,
            self.use_bias, self.use_scale, self.bias_init, self.scale_init,
            self.force_float32_reductions,
        )


def autopad(k, p=None, d=1):
    """Same-shape padding for a given kernel/dilation (reference common.py:48-54)."""
    if d > 1:
        k = d * (k - 1) + 1 if isinstance(k, int) else [d * (x - 1) + 1 for x in k]
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def max_pool2d(x, k, s, p=0):
    """NHWC max pool as separable shifted-slice maximums (torch MaxPool2d
    semantics: square window, -inf padding of p on each side).

    Deliberately NOT `lax.reduce_window`: for overlapping windows (stride <
    kernel — yolov3-tiny's ZeroPad+k2s1 pool, SPP/SPPF's k5/9/13 s1 pyramids)
    XLA lowers the reduce_window backward to SelectAndScatter, which GSPMD
    mis-partitions when H/W are sharded — gradients come back wrong by ~45%
    of scale on a spatially-sharded mesh (verified; tests/test_multichip.py
    dp×sp parity). A k×k max is separable into k shifted strided slices per
    axis folded with elementwise `maximum`, whose autodiff is plain
    slice/select — exact under any sharding — and which fuses into adjacent
    elementwise work instead of emitting a windowed op. Forward values are
    bit-identical to reduce_window (same maxima).

    Gradient tie handling differs from torch/reduce_window: `jnp.maximum`
    splits the subgradient evenly among tied positions instead of routing the
    whole gradient to one winner. Total gradient mass is preserved, but
    per-element grads differ on plateaued activations (frequent in cascaded
    SPPF pools) — expected when parity-debugging gradients against torch."""

    def pool_axis(y, axis):
        if p:
            widths = [(0, 0)] * y.ndim
            widths[axis] = (p, p)
            y = jnp.pad(y, widths, constant_values=-jnp.inf if jnp.issubdtype(y.dtype, jnp.floating) else jnp.iinfo(y.dtype).min)
        out = (y.shape[axis] - k) // s + 1
        m = None
        for i in range(k):
            sl = jax.lax.slice_in_dim(y, i, i + (out - 1) * s + 1, stride=s, axis=axis)
            m = sl if m is None else jnp.maximum(m, sl)
        return m

    return pool_axis(pool_axis(x, 1), 2)


class _ConvParams(nn.Module):
    """Declares kernel/bias params with nn.Conv's exact names, shapes and
    inits, without running a conv — used by the space-to-depth stem paths that
    apply the kernel through a transformed lax conv. Keeping the parameter
    tree identical to the standard `Conv` means the same checkpoints, the
    same .pt converter and the same fuse() transform work unchanged."""

    features: int
    kernel_shape: tuple
    use_bias: bool

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", conv_kernel_init, (*self.kernel_shape, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32) if self.use_bias else None
        return kernel, bias


class _GroupedBatchNorm(nn.Module):
    """BatchNorm with (C,)-shaped params applied to a space-to-depth tensor
    whose channels are 4 offset blocks of C: batch statistics reduce over
    (batch, space, offset) — exactly the population the plain-layout BN sees —
    so the transformed stem's training dynamics match the untransformed one.
    Numerics match TorchBatchNorm (eps 1e-3, momentum 0.97, biased var for
    normalization, Bessel-corrected var in the running average)."""

    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        c = self.channels
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        b_, h_, w_, ch = x.shape
        xg = x.reshape(b_, h_, w_, ch // c, c)
        if train:
            xf = xg.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2, 3))
            var = jnp.mean(jnp.square(xf), axis=(0, 1, 2, 3)) - jnp.square(mean)
            if not self.is_initializing():
                n = float(b_ * h_ * w_ * (ch // c))
                ra_mean.value = 0.97 * ra_mean.value + 0.03 * mean
                ra_var.value = 0.97 * ra_var.value + 0.03 * (var * (n / max(n - 1.0, 1.0)))
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = (scale * jax.lax.rsqrt(var + 1e-3)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + 1e-3)).astype(self.dtype)
        y = xg * mul + add
        return y.reshape(b_, h_, w_, ch)


def _scatter_s2d_same(kernel, c1, c2):
    """Scatter a canonical (3,3,c1,c2) stride-1 kernel into the dense
    (3,3,4c1,4c2) form that computes all four output phases of a 3x3 s1 conv
    directly in s2d layout (offset-major phase blocks). For output phase
    (a,b), tap (du,dv) lands at s2d spatial offset ((a+du)//2, (b+dv)//2)
    and input phase ((a+du)%2, (b+dv)%2). No (tap -> slot) collisions: for a
    fixed output phase, the three du values map to distinct (offset, phase)
    pairs. Unused slots stay zero (25% density — the MXU eats the zeros far
    faster than the lane-padded plain layout pays for its 4x HBM bytes)."""
    w4 = jnp.zeros((3, 3, 4 * c1, 4 * c2), dtype=kernel.dtype)
    for a in range(2):
        for du in (-1, 0, 1):
            rr, pr = (a + du) // 2 + 1, (a + du) % 2
            for b in range(2):
                for dv in (-1, 0, 1):
                    cc, pc = (b + dv) // 2 + 1, (b + dv) % 2
                    w4 = w4.at[
                        rr, cc,
                        (pr * 2 + pc) * c1 : (pr * 2 + pc + 1) * c1,
                        (a * 2 + b) * c2 : (a * 2 + b + 1) * c2,
                    ].set(kernel[du + 1, dv + 1])
    return w4


class Conv(nn.Module):
    """Conv2d (no bias) + BatchNorm + activation (reference common.py:57-82).

    With `fused=True` the BN is folded into the conv weights ahead of time
    (see models/fuse.py) and the conv carries a bias — the inference-time
    form the reference produces with fuse() (models/yolo.py:163-172).

    `s2d_mode` (TPU lane-padding fix, no reference analog): re-expresses the
    stem pair [Conv(c,3,1), Conv(2c,3,2)] in space-to-depth layout so the
    full-resolution low-channel activation (e.g. bf16[B,1280,1280,32], which
    XLA pads 4x to 128 lanes) is never materialized — mathematically exact,
    same parameter tree.
      - "out" (first conv, k3 s1): emits s2d layout (B,H/2,W/2,4*c2),
        channel blocks offset-major ((a,b) in row-major, a=row offset);
        computed as 4 stride-2 convs sharing the (3,3,c1,c2) kernel.
      - "in" (second conv, k3 s2): consumes that layout via a 2x2 conv whose
        (2,2,4*c1,c2) kernel is the (3,3,c1,c2) kernel scattered by block
        offset; emits the standard (B,H/2,W/2,c2) layout."""

    c2: int
    k: int = 1
    s: int = 1
    p: Any = None
    g: int = 1
    d: int = 1
    act: Any = True
    dtype: Any = jnp.float32
    fused: bool = False
    s2d_mode: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d_mode == "out":
            return self._s2d_out(x, train)
        if self.s2d_mode == "in":
            return self._s2d_in(x, train)
        if self.s2d_mode == "s2s":
            return self._s2d_s2s(x, train)
        if self.s2d_mode == "down":
            return self._s2d_down(x, train)
        if self.s2d_mode == "g1x1":
            return self._s2d_g1x1(x, train)
        pad = autopad(self.k, self.p, self.d)
        pad = [(pad, pad), (pad, pad)] if isinstance(pad, int) else [(p, p) for p in pad]
        x = nn.Conv(
            self.c2,
            (self.k, self.k) if isinstance(self.k, int) else tuple(self.k),
            strides=self.s,
            padding=pad,
            feature_group_count=self.g,
            kernel_dilation=self.d,
            use_bias=self.fused,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.fused:
            x = TorchBatchNorm(
                use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype, name="bn"
            )(x)
        return get_activation(self.act)(x)

    def _s2d_finish(self, y, bias, train):
        """Shared bias/BN/act tail for modes emitting s2d layout (4*c2 chans)."""
        if self.fused:
            y = y + jnp.tile(bias, 4).astype(self.dtype)
        else:
            y = _GroupedBatchNorm(self.c2, dtype=self.dtype, name="bn")(y, train)
        return get_activation(self.act)(y)

    def _s2d_out(self, x, train):
        """y = s2d(act(bn(conv3x3_s1(x)))) as ONE stride-2 conv on the raw
        input: output phase (a,b) at s2d pos (i,j) is the plain conv at pixel
        (2i+a, 2j+b), whose 3x3 taps span input rows 2i-1..2i+2 — a 4x4
        window at stride 2. The (4,4,c1,4c2) kernel scatters the canonical
        (3,3,c1,c2) kernel as W[a+du+1, b+dv+1, :, (a*2+b)c2+co]. The input
        is read once in its natural layout (no explicit space-to-depth
        rearrange — an earlier version materialized the transposed u8 tensor
        and paid 8.8 ms of lane-padded copies at bs32, docs/PERF.md) and the
        output carries 4*c2 >= 128 lanes, so no tile padding on the write."""
        assert self.k == 3 and self.s == 1 and self.g == 1 and self.d == 1
        b_, h_, w_, c1 = x.shape
        assert h_ % 2 == 0 and w_ % 2 == 0, "s2d stem needs even input dims"
        kernel, bias = _ConvParams(self.c2, (3, 3, c1), use_bias=self.fused, name="conv")()
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        w4 = jnp.zeros((4, 4, c1, 4 * self.c2), dtype=kernel.dtype)
        for a in range(2):
            for b in range(2):
                w4 = w4.at[
                    a : a + 3, b : b + 3, :,
                    (a * 2 + b) * self.c2 : (a * 2 + b + 1) * self.c2,
                ].set(kernel)
        dn = jax.lax.conv_dimension_numbers(x.shape, w4.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w4, (2, 2), ((1, 1), (1, 1)), dimension_numbers=dn)
        return self._s2d_finish(y, bias, train)

    def _s2d_s2s(self, x, train):
        """conv3x3_s1 with BOTH sides in s2d layout: the same scattered
        (3,3,4c1,4c2) kernel as `_s2d_out`, minus the input rearrange."""
        assert self.k == 3 and self.s == 1 and self.g == 1 and self.d == 1
        c1 = x.shape[-1] // 4
        kernel, bias = _ConvParams(self.c2, (3, 3, c1), use_bias=self.fused, name="conv")()
        x = x.astype(self.dtype)
        w4 = _scatter_s2d_same(kernel.astype(self.dtype), c1, self.c2)
        dn = jax.lax.conv_dimension_numbers(x.shape, w4.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w4, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
        return self._s2d_finish(y, bias, train)

    def _s2d_down(self, x, train):
        """conv3x3_s2 from s2d-of-G to s2d-of-G/2 layout: output phase (a,b)
        at pos (i,j) = the plain stride-2 conv at G/2-pos (2i+a, 2j+b), i.e.
        centered on G-row 4i+2a; tap du reads s2d row 2i+(2a+du)//2 phase
        du%2 — a (3,3,4c1,4c2) scattered kernel at stride 2, pad (1,0)."""
        assert self.k == 3 and self.s == 2 and self.g == 1 and self.d == 1
        c1 = x.shape[-1] // 4
        assert x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0, "s2d down needs even s2d dims"
        kernel, bias = _ConvParams(self.c2, (3, 3, c1), use_bias=self.fused, name="conv")()
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        w4 = jnp.zeros((3, 3, 4 * c1, 4 * self.c2), dtype=kernel.dtype)
        for a in range(2):
            for du in (-1, 0, 1):
                rr, pr = (2 * a + du) // 2 + 1, du % 2
                for b in range(2):
                    for dv in (-1, 0, 1):
                        cc, pc = (2 * b + dv) // 2 + 1, dv % 2
                        w4 = w4.at[
                            rr, cc,
                            (pr * 2 + pc) * c1 : (pr * 2 + pc + 1) * c1,
                            (a * 2 + b) * self.c2 : (a * 2 + b + 1) * self.c2,
                        ].set(kernel[du + 1, dv + 1])
        dn = jax.lax.conv_dimension_numbers(x.shape, w4.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w4, (2, 2), ((1, 0), (1, 0)), dimension_numbers=dn)
        return self._s2d_finish(y, bias, train)

    def _s2d_g1x1(self, x, train):
        """conv1x1 in s2d layout: one dense (1,1,4c1,4c2) conv whose kernel
        is block-diagonal (phase p's input block maps to phase p's output
        block through the canonical (1,1,c1,c2) kernel). A feature-grouped
        conv is the obvious encoding but starves the MXU (64-deep contractions
        per group ran at 7.7 TF/s); the dense block-diagonal form is a single
        256-deep matmul and the MXU eats the zeros (scripts/s2d_probe.py)."""
        assert self.k == 1 and self.s == 1 and self.g == 1 and self.d == 1
        c1 = x.shape[-1] // 4
        kernel, bias = _ConvParams(self.c2, (1, 1, c1), use_bias=self.fused, name="conv")()
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        w4 = jnp.zeros((1, 1, 4 * c1, 4 * self.c2), dtype=kernel.dtype)
        for p in range(4):
            w4 = w4.at[:, :, p * c1 : (p + 1) * c1, p * self.c2 : (p + 1) * self.c2].set(kernel)
        dn = jax.lax.conv_dimension_numbers(x.shape, w4.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w4, (1, 1), "VALID", dimension_numbers=dn)
        return self._s2d_finish(y, bias, train)

    def _s2d_in(self, x, train):
        """conv3x3_s2 consuming the s2d layout: 2x2 conv with the 3x3 kernel
        scattered into block-offset channel slots (pad top/left by 1)."""
        assert self.k == 3 and self.s == 2 and self.g == 1 and self.d == 1
        c1 = x.shape[-1] // 4
        kernel, bias = _ConvParams(self.c2, (3, 3, c1), use_bias=self.fused, name="conv")()
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        w2 = jnp.zeros((2, 2, 4 * c1, self.c2), dtype=kernel.dtype)
        for tr in range(2):
            for a in range(2):
                u = 2 * (tr - 1) + a
                if u not in (-1, 0, 1):
                    continue
                for tc in range(2):
                    for bb in range(2):
                        v = 2 * (tc - 1) + bb
                        if v not in (-1, 0, 1):
                            continue
                        blk = (a * 2 + bb) * c1
                        w2 = w2.at[tr, tc, blk : blk + c1, :].set(kernel[u + 1, v + 1])
        dn = jax.lax.conv_dimension_numbers(x.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, w2, (1, 1), ((1, 0), (1, 0)), dimension_numbers=dn)
        if self.fused:
            y = y + bias.astype(self.dtype)
        else:
            y = TorchBatchNorm(
                use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=self.dtype, name="bn"
            )(y)
        return get_activation(self.act)(y)


class DWConv(nn.Module):
    """Depthwise-ish conv: groups = gcd(c1, c2) (reference common.py:85-93)."""

    c2: int
    k: int = 1
    s: int = 1
    d: int = 1
    act: Any = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        g = math.gcd(x.shape[-1], self.c2)
        return Conv(self.c2, self.k, self.s, g=g, d=self.d, act=self.act, dtype=self.dtype, name="dw")(x, train)


class DWConvTranspose2d(nn.Module):
    """Depthwise transposed conv (reference common.py:96-101: ConvTranspose2d
    with groups = gcd(c1, c2)); NHWC via flax ConvTranspose per group."""

    c2: int
    k: int = 1
    s: int = 1
    p1: int = 0  # input padding
    p2: int = 0  # output padding
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math

        g = math.gcd(x.shape[-1], self.c2)
        # flax ConvTranspose has no feature_group_count: run the g groups as a
        # batched conv via split/concat (trace-time loop; XLA fuses the slices)
        xs = jnp.split(x, g, axis=-1) if g > 1 else [x]
        outs = [
            nn.ConvTranspose(
                self.c2 // g,
                (self.k, self.k),
                strides=(self.s, self.s),
                padding=[(self.p1, self.p1), (self.p1, self.p1)],
                dtype=self.dtype,
                name=f"dwt{i}" if g > 1 else "dwt",
            )(xi)
            for i, xi in enumerate(xs)
        ]
        out = jnp.concatenate(outs, axis=-1) if g > 1 else outs[0]
        if self.p2:
            out = jnp.pad(out, ((0, 0), (0, self.p2), (0, self.p2), (0, 0)))
        return out


class Bottleneck(nn.Module):
    """1x1 reduce -> 3x3 conv with optional residual add (reference common.py:150-166)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False
    s2d: bool = False  # both convs + residual stay in s2d layout (4x channel blocks)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1] // 4 if self.s2d else x.shape[-1]
        c_ = int(self.c2 * self.e)
        kw1 = {"s2d_mode": "g1x1"} if self.s2d else {}
        kw2 = {"s2d_mode": "s2s"} if self.s2d else {}
        y = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1", **kw1)(x, train)
        y = Conv(self.c2, 3, 1, g=self.g, dtype=self.dtype, fused=self.fused, name="cv2", **kw2)(y, train)
        return x + y if (self.shortcut and c1 == self.c2) else y


class BottleneckCSP(nn.Module):
    """CSP bottleneck (reference common.py:168-196)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False  # the standalone concat-BN stays (running stats kept by fuse_variables)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, fused=self.fused,
                            name=f"m{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, name="bn")(y)
        y = get_activation("silu")(y)
        return Conv(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv4")(y, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convolutions (reference common.py:199-221)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.g, e=1.0, dtype=self.dtype, fused=self.fused,
                            name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, fused=self.fused, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)


class SPP(nn.Module):
    """Spatial pyramid pooling (reference common.py:267-290)."""

    c2: int
    k: Sequence[int] = (5, 9, 13)
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        pools = [max_pool2d(x, k, 1, k // 2) for k in self.k]
        x = jnp.concatenate([x, *pools], axis=-1)
        return Conv(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)


class SPPF(nn.Module):
    """Fast SPP: 3 chained k-pools == SPP(k, 2k-1, 3k-2) (reference common.py:293-313)."""

    c2: int
    k: int = 5
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y1 = max_pool2d(x, self.k, 1, self.k // 2)
        y2 = max_pool2d(y1, self.k, 1, self.k // 2)
        y3 = max_pool2d(y2, self.k, 1, self.k // 2)
        return Conv(self.c2, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(
            jnp.concatenate([x, y1, y2, y3], axis=-1), train
        )


class Focus(nn.Module):
    """Space-to-depth stem: (b,h,w,c) -> (b,h/2,w/2,4c) -> Conv (reference common.py:316-332)."""

    c2: int
    k: int = 1
    s: int = 1
    p: Any = None
    g: int = 1
    act: Any = True
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.concatenate(
            [x[:, ::2, ::2, :], x[:, 1::2, ::2, :], x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1
        )
        return Conv(self.c2, self.k, self.s, self.p, self.g, act=self.act, dtype=self.dtype,
                    fused=self.fused, name="conv")(x, train)


class GhostConv(nn.Module):
    """Ghost convolution (reference common.py:335-352)."""

    c2: int
    k: int = 1
    s: int = 1
    g: int = 1
    act: Any = True
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        y = Conv(c_, self.k, self.s, None, self.g, act=self.act, dtype=self.dtype,
                 fused=self.fused, name="cv1")(x, train)
        import math

        y2 = Conv(c_, 5, 1, None, g=math.gcd(c_, c_), act=self.act, dtype=self.dtype,
                  fused=self.fused, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class MaxPool(nn.Module):
    """Plain max pooling (nn.MaxPool2d analog). Pads with -inf like torch."""

    k: int = 2
    s: int = 2
    p: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        return max_pool2d(x, self.k, self.s, self.p)


class ZeroPad(nn.Module):
    """Explicit zero padding on H/W: pad = (left, right, top, bottom), torch ZeroPad2d order."""

    pad: Sequence[int] = (0, 1, 0, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        l, r, t, b = self.pad
        return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


class Upsample(nn.Module):
    """Nearest-neighbor integer upsample (nn.Upsample analog) via jnp.repeat — exact and cheap."""

    scale: int = 2
    mode: str = "nearest"

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.mode == "nearest", f"unsupported upsample mode {self.mode}"
        return jnp.repeat(jnp.repeat(x, self.scale, axis=1), self.scale, axis=2)


class Concat(nn.Module):
    """Concatenate a list of NHWC tensors on channels (reference common.py:416-430)."""

    axis: int = -1

    @nn.compact
    def __call__(self, xs, train: bool = False):
        return jnp.concatenate(xs, axis=self.axis)


class Contract(nn.Module):
    """Space-to-depth: (b, h, w, c) -> (b, h/g, w/g, c*g^2) (reference common.py:380-395)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.gain
        x = x.reshape(b, h // g, g, w // g, g, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h // g, w // g, c * g * g)


class Expand(nn.Module):
    """Depth-to-space: (b, h, w, c) -> (b, h*g, w*g, c/g^2) (reference common.py:398-413)."""

    gain: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, h, w, c = x.shape
        g = self.gain
        x = x.reshape(b, h, w, g, g, c // (g * g))
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(b, h * g, w * g, c // (g * g))


class Sum(nn.Module):
    """Weighted sum of feature maps (reference models/experimental.py:15-39)."""

    n: int
    weight: bool = False

    @nn.compact
    def __call__(self, xs, train: bool = False):
        y = xs[0]
        if self.weight:
            w = self.param("w", lambda k, s: -jnp.arange(1.0, s[0] + 1.0) / 2.0, (self.n - 1,))
            w = nn.sigmoid(w) * 2
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i]
        else:
            for i in range(self.n - 1):
                y = y + xs[i + 1]
        return y


class GhostBottleneck(nn.Module):
    """Ghost bottleneck (reference common.py:355-377)."""

    c2: int
    k: int = 3
    s: int = 1
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.c2 // 2
        kw = {"dtype": self.dtype, "fused": self.fused}
        y = GhostConv(c_, 1, 1, act=True, name="gc1", **kw)(x, train)
        if self.s == 2:
            y = DWConv(c_, self.k, self.s, act=False, name="dw", **kw)(y, train)
        y = GhostConv(self.c2, 1, 1, act=False, name="gc2", **kw)(y, train)
        if self.s == 2:
            sc = DWConv(x.shape[-1], self.k, self.s, act=False, name="dws", **kw)(x, train)
            sc = Conv(self.c2, 1, 1, act=False, name="sc", **kw)(sc, train)
        else:
            sc = x if x.shape[-1] == self.c2 else Conv(self.c2, 1, 1, act=False, name="sc", **kw)(x, train)
        return y + sc


class TransformerLayer(nn.Module):
    """Self-attention + MLP block sans LayerNorm (reference common.py:104-127)."""

    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (seq, batch, c)
        q = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="q")(x)
        k = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="k")(x)
        v = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="v")(x)
        s, b, c = x.shape
        h = self.num_heads
        hd = c // h
        qh = q.reshape(s, b * h, hd).transpose(1, 0, 2)
        kh = k.reshape(s, b * h, hd).transpose(1, 0, 2)
        vh = v.reshape(s, b * h, hd).transpose(1, 0, 2)
        att = jax.nn.softmax(jnp.einsum("bqd,bkd->bqk", qh, kh) / jnp.sqrt(hd), axis=-1)
        out = jnp.einsum("bqk,bkd->bqd", att, vh).transpose(1, 0, 2).reshape(s, b, c)
        x = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="proj")(out) + x
        return nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(
            nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        ) + x


class TransformerBlock(nn.Module):
    """Vision-transformer block over a conv feature map (reference common.py:130-147)."""

    c2: int
    num_heads: int = 4
    num_layers: int = 1
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.c2:
            x = Conv(self.c2, dtype=self.dtype, fused=self.fused, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c).transpose(1, 0, 2)  # (seq, batch, c)
        pos = nn.Dense(c, dtype=self.dtype, name="linear")(p)
        p = p + pos
        for i in range(self.num_layers):
            p = TransformerLayer(c, self.num_heads, dtype=self.dtype, name=f"tr{i}")(p, train)
        return p.transpose(1, 0, 2).reshape(b, h, w, c)


class CrossConv(nn.Module):
    """Cross-convolution downsample: 1xk then kx1 (reference common.py:224-240)."""

    c2: int
    k: int = 3
    s: int = 1
    g: int = 1
    e: float = 1.0
    shortcut: bool = False
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c1 = x.shape[-1]
        c_ = int(self.c2 * self.e)
        y = Conv(c_, (1, self.k), (1, self.s), dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y = Conv(self.c2, (self.k, 1), (self.s, 1), g=self.g, dtype=self.dtype, fused=self.fused,
                 name="cv2")(y, train)
        return x + y if (self.shortcut and c1 == self.c2) else y


class C3x(C3):
    """C3 with CrossConv bottlenecks (reference common.py:244-250)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        for i in range(self.n):
            y1 = CrossConv(c_, 3, 1, self.g, 1.0, self.shortcut, dtype=self.dtype,
                           fused=self.fused, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, fused=self.fused, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)


class C3TR(C3):
    """C3 with a TransformerBlock instead of bottlenecks (reference common.py:253-259)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y1 = TransformerBlock(c_, 4, self.n, dtype=self.dtype, fused=self.fused, name="m")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, fused=self.fused, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)


class C3SPP(C3):
    """C3 with an SPP core (reference common.py:262-268)."""

    k: Sequence[int] = (5, 9, 13)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        y1 = SPP(c_, self.k, dtype=self.dtype, fused=self.fused, name="m")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, fused=self.fused, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)


class C3Ghost(C3):
    """C3 with GhostBottlenecks (reference common.py:271-277)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.c2 * self.e)
        y1 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv1")(x, train)
        for i in range(self.n):
            y1 = GhostBottleneck(c_, dtype=self.dtype, fused=self.fused, name=f"m{i}")(y1, train)
        y2 = Conv(c_, 1, 1, dtype=self.dtype, fused=self.fused, name="cv2")(x, train)
        return Conv(self.c2, 1, dtype=self.dtype, fused=self.fused, name="cv3")(
            jnp.concatenate([y1, y2], axis=-1), train)


class MixConv2d(nn.Module):
    """Mixed-kernel-size conv groups (reference models/experimental.py:42-71)."""

    c2: int
    k: Sequence[int] = (1, 3)
    s: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.k)
        # reference equal_ch split (experimental.py:55): linspace-floor puts
        # remainder channels in the LAST groups — order matters for .pt parity
        lin = np.floor(np.linspace(0, n - 1e-6, self.c2))
        splits = [int((lin == g).sum()) for g in range(n)]
        outs = [
            nn.Conv(c, (k, k), strides=self.s, padding=k // 2, use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype, name=f"m{i}")(x)
            for i, (c, k) in enumerate(zip(splits, self.k))
        ]
        y = jnp.concatenate(outs, axis=-1)
        y = TorchBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, name="bn")(y)
        return get_activation("silu")(y)


# Registry mapping spec op names -> (module class, kind). kind 'multi' modules
# consume a list of inputs; 'single' consume one tensor. Aliases cover the
# reference YAML spellings so reference-format model files load unchanged.
MODULE_REGISTRY = {
    "Conv": Conv,
    "DWConv": DWConv,
    "DWConvTranspose2d": DWConvTranspose2d,
    "Bottleneck": Bottleneck,
    "BottleneckCSP": BottleneckCSP,
    "C3": C3,
    "C3x": C3x,
    "C3TR": C3TR,
    "C3SPP": C3SPP,
    "C3Ghost": C3Ghost,
    "CrossConv": CrossConv,
    "TransformerBlock": TransformerBlock,
    "MixConv2d": MixConv2d,
    "SPP": SPP,
    "SPPF": SPPF,
    "Focus": Focus,
    "GhostConv": GhostConv,
    "GhostBottleneck": GhostBottleneck,
    "MaxPool": MaxPool,
    "nn.MaxPool2d": MaxPool,
    "ZeroPad": ZeroPad,
    "nn.ZeroPad2d": ZeroPad,
    "Upsample": Upsample,
    "nn.Upsample": Upsample,
    "Concat": Concat,
    "Contract": Contract,
    "Expand": Expand,
    "Sum": Sum,
}

MULTI_INPUT_OPS = {"Concat", "Sum"}
