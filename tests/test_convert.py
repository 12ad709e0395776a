"""torch->flax conversion parity tests.

Small torch modules are built with the reference's state-dict naming
conventions (conv at Sequential index 3i / BN at 3i+1 for MLPs;
layerN.B.convM for ResNet stages; layers.i.attn.proj.{0,1,2} for GNN
layers), converted with pats_tpu.io.convert, and their outputs compared.
"""

import numpy as np
import torch
import torch.nn as tnn
import jax.numpy as jnp

from pats_tpu.io.convert import _Mapper
from pats_tpu.models.backbone import FineTrunk
from pats_tpu.models.gnn import AttentionalGNN, MLPStack

torch.manual_seed(0)


def _randomize_bn(bn):
    with torch.no_grad():
        bn.running_mean.normal_(0, 0.5)
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_(1, 0.2)
        bn.bias.normal_(0, 0.2)


def test_mlp_conversion(rng):
    layers = [6, 12, 10]
    seq = []
    for i in range(1, len(layers)):
        seq.append(tnn.Conv1d(layers[i - 1], layers[i], 1, bias=True))
        if i < len(layers) - 1:
            bn = tnn.BatchNorm1d(layers[i])
            _randomize_bn(bn)
            seq.append(bn)
            seq.append(tnn.ReLU())
    net = tnn.Sequential(*seq).eval()
    sd = {f"mlp.{k}": v for k, v in net.state_dict().items()}

    m = _Mapper(sd)
    m.mlp("mlp", 2, "stack")
    variables = m.variables()

    x = rng.normal(size=(3, 6, 20)).astype(np.float32)   # (B, C, N)
    with torch.no_grad():
        want = net(torch.from_numpy(x)).numpy()          # (B, C_out, N)

    model = MLPStack((12, 10), use_running_average=True)
    got = model.apply({"params": variables["params"]["stack"],
                       "batch_stats": variables["batch_stats"]["stack"]},
                      jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               rtol=1e-4, atol=1e-5)


class _TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))
        else:
            self.downsample = None
        for bn in [self.bn1, self.bn2] + (
                [self.downsample[1]] if self.downsample else []):
            _randomize_bn(bn)

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + r)


class _TorchTrunk(tnn.Module):
    """conv1+bn1+relu / maxpool+layer1 / layer2 with reference naming."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        _randomize_bn(self.bn1)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(_TorchBasicBlock(64, 64, 1))
        self.layer2 = tnn.Sequential(_TorchBasicBlock(64, 128, 2))

    def forward(self, x):
        x0 = torch.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(self.maxpool(x0))
        x2 = self.layer2(x1)
        return x0, x1, x2


def test_fine_trunk_conversion(rng):
    net = _TorchTrunk().eval()
    sd = {f"descriptor_extract.{k}": v for k, v in net.state_dict().items()}
    m = _Mapper(sd)
    m.resnet("descriptor_extract", {"layer1": 1, "layer2": 1}, "trunk")
    variables = m.variables()

    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        w0, w1, w2 = [t.numpy() for t in net(torch.from_numpy(x))]

    model = FineTrunk(layers=(1, 1), use_running_average=True)
    g0, g1, g2 = model.apply(
        {"params": variables["params"]["trunk"],
         "batch_stats": variables["batch_stats"]["trunk"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    for got, want in [(g0, w0), (g1, w1), (g2, w2)]:
        np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2),
                                   want, rtol=1e-3, atol=1e-4)


class _TorchGNN(tnn.Module):
    """Two-layer self/cross attentional GNN with reference naming/semantics
    (modules.py:84-134)."""

    def __init__(self, d, heads):
        super().__init__()
        self.d, self.h = d, heads
        self.layers = tnn.ModuleList()
        for _ in range(2):
            layer = tnn.Module()
            layer.attn = tnn.Module()
            layer.attn.proj = tnn.ModuleList(
                [tnn.Conv1d(d, d, 1) for _ in range(3)])
            layer.attn.merge = tnn.Conv1d(d, d, 1)
            layer.mlp = tnn.Sequential(
                tnn.Conv1d(2 * d, 2 * d, 1), tnn.BatchNorm1d(2 * d),
                tnn.ReLU(), tnn.Conv1d(2 * d, d, 1))
            _randomize_bn(layer.mlp[1])
            self.layers.append(layer)

    def _attn(self, layer, x, src):
        b = x.shape[0]
        dh = self.d // self.h
        q, k, v = [p(t).view(b, dh, self.h, -1)
                   for p, t in zip(layer.attn.proj, (x, src, src))]
        scores = torch.einsum("bdhn,bdhm->bhnm", q, k) / dh ** 0.5
        prob = torch.softmax(scores, dim=-1)
        out = torch.einsum("bhnm,bdhm->bdhn", prob, v)
        msg = layer.attn.merge(out.contiguous().view(b, self.d, -1))
        return layer.mlp(torch.cat([x, msg], dim=1))

    def forward(self, d0, d1):
        for i, layer in enumerate(self.layers):
            s0, s1 = (d1, d0) if i % 2 == 1 else (d0, d1)
            d0 = d0 + self._attn(layer, d0, s0)
            d1 = d1 + self._attn(layer, d1, s1)
        return d0, d1


def test_gnn_conversion(rng):
    d, heads = 16, 4
    net = _TorchGNN(d, heads).eval()
    sd = {f"gnn.{k}": v for k, v in net.state_dict().items()}
    m = _Mapper(sd)
    m.gnn("gnn", 2, "gnn")
    variables = m.variables()

    x0 = rng.normal(size=(2, d, 9)).astype(np.float32)
    x1 = rng.normal(size=(2, d, 9)).astype(np.float32)
    with torch.no_grad():
        w0, w1 = net(torch.from_numpy(x0), torch.from_numpy(x1))

    model = AttentionalGNN(d, 2, heads, use_running_average=True)
    g0, g1 = model.apply(
        {"params": variables["params"]["gnn"],
         "batch_stats": variables["batch_stats"]["gnn"]},
        jnp.asarray(x0.transpose(0, 2, 1)), jnp.asarray(x1.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(g0).transpose(0, 2, 1), w0.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1).transpose(0, 2, 1), w1.numpy(),
                               rtol=1e-3, atol=1e-4)
