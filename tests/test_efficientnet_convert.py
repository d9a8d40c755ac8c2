"""Golden parity: a torch EfficientNet (NVIDIA DeepLearningExamples widese
layout: stem/layer{L}.block{j}.{expand,depsep,se,proj}/features with Linear
SE pairs sized from the expanded width) vs our EfficientNetEncoder with
converted weights (reference loads nvidia_efficientnet_widese_b4,
src/classes/CnnEncoder.py:106-126).

The full B4 trunk is too big for a unit test; we monkeypatch the block table
to a 2-stage toy with the same code path (expand==1 first stage, widese SE,
depthwise stride, projection skip)."""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import vit_ad_tpu.models.efficientnet as effnet
from vit_ad_tpu.config import DtypePolicy

F32 = DtypePolicy.f32()

TOY_BLOCKS = ((1, 8, 1, 1, 3), (6, 16, 2, 2, 3))


@pytest.fixture
def toy_arch(monkeypatch):
    # width 1.4 / depth 1.8 scaling stays active (exercises rounding)
    monkeypatch.setattr(effnet, "_B0_BLOCKS", TOY_BLOCKS)
    yield


class TorchConvBN(tnn.Module):
    def __init__(self, in_ch, out_ch, k=1, s=1, groups=1):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, k, s, k // 2, groups=groups,
                               bias=False)
        self.bn = tnn.BatchNorm2d(out_ch, eps=1e-3)

    def forward(self, x, act=True):
        x = self.bn(self.conv(x))
        return torch.nn.functional.silu(x) if act else x


class TorchSE(tnn.Module):
    def __init__(self, ch, squeeze):
        super().__init__()
        self.squeeze = tnn.Linear(ch, squeeze)
        self.expand = tnn.Linear(squeeze, ch)

    def forward(self, x):
        out = torch.mean(x, [2, 3])
        out = torch.nn.functional.silu(self.squeeze(out))
        out = torch.sigmoid(self.expand(out))
        return x * out.view(x.size(0), -1, 1, 1)


class TorchMBConv(tnn.Module):
    def __init__(self, in_ch, out_ch, expand, k, s):
        super().__init__()
        mid = in_ch * expand
        self.expand = TorchConvBN(in_ch, mid, 1) if expand != 1 else None
        self.depsep = TorchConvBN(mid, mid, k, s, groups=mid)
        self.se = TorchSE(mid, max(1, int(mid * 0.25)))  # widese
        self.proj = TorchConvBN(mid, out_ch, 1)
        self.residual = s == 1 and in_ch == out_ch

    def forward(self, x):
        h = x
        if self.expand is not None:
            h = self.expand(h)
        h = self.depsep(h)
        h = self.se(h)
        h = self.proj(h, act=False)
        return h + x if self.residual else h


class TorchEffNet(tnn.Module):
    def __init__(self):
        super().__init__()
        rc, rr = effnet._round_channels, effnet._round_repeats
        stem = rc(32)
        self.stem = TorchConvBN(3, stem, 3, 2)
        in_ch = stem
        for li, (expand, ch, reps, stride, k) in enumerate(TOY_BLOCKS):
            out_ch = rc(ch)
            blocks = []
            for r in range(rr(reps)):
                blocks.append(TorchMBConv(in_ch, out_ch, expand, k,
                                          stride if r == 0 else 1))
                in_ch = out_ch
            layer = tnn.Module()
            for j, b in enumerate(blocks):
                setattr(layer, f"block{j}", b)
            layer._blocks = blocks
            setattr(self, f"layer{li + 1}", layer)
        self.features = TorchConvBN(in_ch, rc(1280), 1)
        self.classifier = tnn.Module()
        self.classifier.fc = tnn.Linear(rc(1280), 10)

    def extract_features(self, x):
        x = self.stem(x)
        for li in range(len(TOY_BLOCKS)):
            for b in getattr(self, f"layer{li + 1}")._blocks:
                x = b(x)
        return self.features(x)


def test_efficientnet_convert_golden(toy_arch, rng):
    from vit_ad_tpu.utils.torch_convert import (
        convert_efficientnet,
        merge_variables,
        state_dict_to_numpy,
    )
    import jax
    import jax.numpy as jnp

    torch.manual_seed(3)
    tm = TorchEffNet().eval()
    # non-trivial running stats
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.6, 1.4)

    model = effnet.EfficientNetEncoder(img_size=32, dtypes=F32)
    base = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    converted = convert_efficientnet(state_dict_to_numpy(tm.state_dict()))
    variables = merge_variables(base, converted)

    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm.extract_features(torch.from_numpy(x).permute(0, 3, 1, 2))
    want_tokens = want.permute(0, 2, 3, 1).reshape(2, -1, want.shape[1]).numpy()

    out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out.patch_embedding), want_tokens, rtol=3e-4, atol=3e-5
    )


def test_efficientnet_convert_strict(toy_arch):
    from vit_ad_tpu.utils.torch_convert import (
        convert_efficientnet,
        state_dict_to_numpy,
    )

    torch.manual_seed(3)
    sd = state_dict_to_numpy(TorchEffNet().state_dict())
    sd["layer1.block0.se.gate.weight"] = np.zeros(2)
    with pytest.raises(ValueError, match="not consumed"):
        convert_efficientnet(sd)
