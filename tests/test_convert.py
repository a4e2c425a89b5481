"""Converter + numeric parity vs torch: layout mapping, Conv/BN/SiLU equivalence."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from yolov3_tpu.models.convert import convert_torch_checkpoint, torch_key_to_path  # noqa: E402
from yolov3_tpu.models.detection import DetectionModel  # noqa: E402


def build_torch_tiny_equivalent(nc=2):
    """A torch model whose state_dict names mirror the reference layout for a
    small custom spec (built independently — NOT imported from the reference)."""
    import torch.nn as nn

    class ConvBnSiLU(nn.Module):
        def __init__(self, c1, c2, k=1, s=1):
            super().__init__()
            self.conv = nn.Conv2d(c1, c2, k, s, k // 2, bias=False)
            self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
            self.act = nn.SiLU()

        def forward(self, x):
            return self.act(self.bn(self.conv(x)))

    class Btl(nn.Module):
        def __init__(self, c1, c2):
            super().__init__()
            self.cv1 = ConvBnSiLU(c1, c2 // 2, 1, 1)
            self.cv2 = ConvBnSiLU(c2 // 2, c2, 3, 1)
            self.add = c1 == c2

        def forward(self, x):
            y = self.cv2(self.cv1(x))
            return x + y if self.add else y

    class Det(nn.Module):
        def __init__(self, chs, na=3, nc=2):
            super().__init__()
            self.m = nn.ModuleList(nn.Conv2d(c, na * (nc + 5), 1) for c in chs)

    model = nn.Sequential()
    model.add_module("0", ConvBnSiLU(3, 8, 3, 1))
    model.add_module("1", ConvBnSiLU(8, 16, 3, 2))
    model.add_module("2", Btl(16, 16))
    model.add_module("3", ConvBnSiLU(16, 32, 3, 2))
    model.add_module("4", Det([16, 32], na=3, nc=nc))
    root = nn.Module()
    root.model = model
    return root


SPEC = {
    "nc": 2,
    "anchors": [[10, 14, 23, 27, 37, 58], [81, 82, 135, 169, 344, 319]],
    "layers": [
        {"from": -1, "n": 1, "op": "Conv", "args": [8, 3, 1]},
        {"from": -1, "n": 1, "op": "Conv", "args": [16, 3, 2]},
        {"from": -1, "n": 1, "op": "Bottleneck", "args": [16]},
        {"from": -1, "n": 1, "op": "Conv", "args": [32, 3, 2]},
        {"from": [2, 3], "n": 1, "op": "Detect", "args": ["nc", "anchors"]},
    ],
}


def test_key_mapping():
    assert torch_key_to_path("model.0.conv.weight")[1] == ("l0", "conv", "kernel")
    assert torch_key_to_path("model.0.bn.weight")[:2] == ("params", ("l0", "bn", "scale"))
    assert torch_key_to_path("model.2.cv1.bn.running_mean")[0] == "batch_stats"
    assert torch_key_to_path("model.4.m.1.weight")[1] == ("l4", "m1", "kernel")
    assert torch_key_to_path("model.4.1.cv1.conv.weight")[1] == ("l4_1", "cv1", "conv", "kernel")
    assert torch_key_to_path("model.0.bn.num_batches_tracked") is None


def test_full_numeric_parity_torch_vs_flax(rng):
    """Convert a torch model's weights and verify the *entire forward pass*
    (convs, BN eval stats, SiLU, residual, strides, detect convs) matches."""
    tm = build_torch_tiny_equivalent()
    tm.eval()
    # randomize BN stats so eval-mode normalization is non-trivial
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.uniform_(0.5, 1.5)
                m.bias.uniform_(-0.5, 0.5)

    model = DetectionModel.from_config(SPEC, imgsz=64)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables, report = convert_torch_checkpoint(sd, model)
    assert not report["missed"], report["missed"]
    model = model.replace_variables(variables)

    x = rng.uniform(0, 1, size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t = torch.from_numpy(x)
        feats_t = []
        y = tm.model[0](t)
        y = tm.model[1](y)
        y2 = tm.model[2](y)
        y3 = tm.model[3](y2)
        feats_t = [tm.model[4].m[0](y2), tm.model[4].m[1](y3)]

    feats_j = model(jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for ft, fj in zip(feats_t, feats_j):
        # ours: (bs, na, ny, nx, no); torch raw conv: (bs, na*no, ny, nx)
        bs, na, ny, nx, no = fj.shape
        ft = ft.numpy().reshape(bs, na, no, ny, nx).transpose(0, 1, 3, 4, 2)
        np.testing.assert_allclose(np.asarray(fj), ft, rtol=1e-4, atol=1e-4)


def test_converted_all_leaves_match_count():
    tm = build_torch_tiny_equivalent()
    model = DetectionModel.from_config(SPEC, imgsz=64)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables, report = convert_torch_checkpoint(sd, model)
    import jax

    n_converted = len(report["matched"])
    n_t = len([k for k in sd if not k.endswith("num_batches_tracked")])
    assert n_converted == n_t
