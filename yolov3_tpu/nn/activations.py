"""Activation zoo (reference utils/activations.py:9-119, re-done functionally).

Stateless activations are plain jnp functions; parameterized ones (FReLU,
AconC, MetaAconC) are linen modules. On TPU these all fuse into the preceding
conv via XLA — no MemoryEfficientMish-style custom autograd needed since XLA
rematerializes cheaply under jax.checkpoint.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def silu(x):
    return x * nn.sigmoid(x)


def hardswish(x):
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def mish(x):
    return x * jnp.tanh(nn.softplus(x))


def relu(x):
    return nn.relu(x)


def leaky_relu(x, negative_slope=0.1):
    return nn.leaky_relu(x, negative_slope=negative_slope)


def identity(x):
    return x


ACTIVATIONS = {
    "silu": silu,
    "swish": silu,
    "hardswish": hardswish,
    "mish": mish,
    "relu": relu,
    "leakyrelu": leaky_relu,
    "identity": identity,
    "none": identity,
}


# process-wide default for act=True — the reference's mutable Conv.default_act
# (models/common.py:60, overridden by a YAML `activation:` key, yolo.py:313)
_DEFAULT_ACT = [silu]


def set_default_activation(act):
    """Override the default activation (YAML `activation:` key)."""
    _DEFAULT_ACT[0] = get_activation(act) if act not in (None, True) else silu


def get_activation(act):
    """Resolve an activation spec (True/False/str/callable) to a function."""
    if act is True:
        return _DEFAULT_ACT[0]
    if act in (False, None):
        return identity
    if callable(act):
        return act
    key = str(act).lower().replace("nn.", "").replace("()", "")
    if key not in ACTIVATIONS:
        raise KeyError(f"unknown activation {act!r}; available: {sorted(ACTIVATIONS)}")
    return ACTIVATIONS[key]


class FReLU(nn.Module):
    """Funnel activation: max(x, depthwise_conv_bn(x)). Reference activations.py:57-71."""

    k: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        t = nn.Conv(c, (self.k, self.k), padding="SAME", feature_group_count=c, use_bias=False, name="conv")(x)
        t = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, name="bn")(t)
        return jnp.maximum(x, t)


class AconC(nn.Module):
    """ACON-C activation: (p1-p2)*x*sigmoid(beta*(p1-p2)*x) + p2*x (arxiv 2009.04759)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        p1 = self.param("p1", nn.initializers.normal(1.0), (1, 1, 1, c))
        p2 = self.param("p2", nn.initializers.normal(1.0), (1, 1, 1, c))
        beta = self.param("beta", nn.initializers.ones, (1, 1, 1, c))
        dpx = (p1 - p2) * x
        return dpx * nn.sigmoid(beta * dpx) + p2 * x
