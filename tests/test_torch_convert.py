"""Golden parity: a torch ViT (timm-structured) vs our ViTEncoder with
converted weights — the strongest numerics check for the encoder path.
Also: ResNet-50 conversion vs a torchvision-structured torch model."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.resnet import ResNetEncoder
from vit_ad_tpu.models.vit import ViTEncoder
from vit_ad_tpu.utils.torch_convert import (
    convert_resnet50,
    convert_vit,
    merge_variables,
    state_dict_to_numpy,
)

F32 = DtypePolicy.f32()


# --- minimal timm-structured torch ViT (pre-LN, fused qkv) -----------------

class TorchBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(dim, dim * 3)
        self.attn.proj = tnn.Linear(dim, dim)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)
        self.heads = heads

    def _attn(self, x):
        b, n, d = x.shape
        hd = d // self.heads
        qkv = self.attn.qkv(x).reshape(b, n, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        att = torch.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k).softmax(-1)
        out = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(b, n, d)
        return self.attn.proj(out)

    def forward(self, x):
        x = x + self._attn(self.norm1(x))
        x = x + self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x


class TorchViT(tnn.Module):
    def __init__(self, img=32, patch=8, dim=32, depth=2, heads=4, prefix=2):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        n = (img // patch) ** 2
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        if prefix == 2:
            self.dist_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = tnn.Parameter(torch.randn(1, n + prefix, dim) * 0.02)
        self.blocks = tnn.ModuleList([TorchBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)
        self.prefix = prefix

    def forward(self, x, block_index=0):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        toks = [self.cls_token.expand(x.shape[0], -1, -1)]
        if self.prefix == 2:
            toks.append(self.dist_token.expand(x.shape[0], -1, -1))
        x = torch.cat(toks + [x], dim=1) + self.pos_embed
        if block_index != 0:
            for i in range(block_index + 1):
                x = self.blocks[i](x)
                x = self.norm(x)
        else:
            for blk in self.blocks:
                x = blk(x)
            x = self.norm(x)
        return x


@pytest.mark.parametrize("block_index", [0, 1])
def test_vit_parity_with_torch(rng, block_index):
    torch.manual_seed(7)
    tm = TorchViT().eval()
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)

    with torch.no_grad():
        want = tm(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), block_index
        ).numpy()

    enc = ViTEncoder(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_prefix_tokens=2, dtypes=F32,
    )
    base = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    converted = convert_vit(
        state_dict_to_numpy(tm.state_dict()), depth=2, num_prefix_tokens=2
    )
    variables = merge_variables(base, converted)
    out = enc.apply(variables, jnp.asarray(x), block_index=block_index)

    np.testing.assert_allclose(
        np.asarray(out.patch_embedding), want[:, 2:, :], rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.latent), want[:, 0, :], rtol=1e-4, atol=1e-5
    )


# --- torchvision-structured ResNet-50 ---------------------------------------

def _torch_resnet50():
    import torchvision_free_resnet as _  # noqa: F401  (never exists)


class TorchBottleneck(tnn.Module):
    def __init__(self, inp, planes, stride=1, downsample=False):
        super().__init__()
        self.conv1 = tnn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(planes)
        self.conv2 = tnn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(planes)
        self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(planes * 4)
        self.relu = tnn.ReLU()
        self.downsample = None
        if downsample:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(inp, planes * 4, 1, stride, bias=False),
                tnn.BatchNorm2d(planes * 4),
            )

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        return self.relu(out + idt)


class TorchResNet50(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU()
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cfg = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        inp = 64
        for li, (planes, blocks, stride) in enumerate(cfg):
            layer = []
            for bi in range(blocks):
                layer.append(
                    TorchBottleneck(
                        inp, planes, stride if bi == 0 else 1, downsample=bi == 0
                    )
                )
                inp = planes * 4
            setattr(self, f"layer{li + 1}", tnn.Sequential(*layer))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = []
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
            feats.append(x)
        return feats


def test_resnet50_parity_with_torch(rng):
    torch.manual_seed(3)
    tm = TorchResNet50().eval()
    # randomize running stats so eval-mode BN is a real test
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)

    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        want = [
            f.numpy() for f in tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
        ]

    enc = ResNetEncoder(img_size=64, dtypes=F32)
    base = enc.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    converted = convert_resnet50(state_dict_to_numpy(tm.state_dict()))
    variables = merge_variables(base, converted)

    stages = enc.apply(
        variables, jnp.asarray(x), train=False,
        method=ResNetEncoder.stage_features,
    )
    # stage_features applies the (fresh-init, identity-at-init) LayerNorms —
    # compare against torch maps normalized the same way instead: easier to
    # check the raw trunk via __call__ patch_embedding for stage 4 ...
    out = enc.apply(variables, jnp.asarray(x), train=False)
    got4 = np.asarray(out.patch_embedding).reshape(1, 2, 2, 2048)
    want4 = np.transpose(want[3], (0, 2, 3, 1))
    np.testing.assert_allclose(got4, want4, rtol=1e-3, atol=1e-4)
    # latent = avgpool
    np.testing.assert_allclose(
        np.asarray(out.latent), want4.mean((1, 2)), rtol=1e-3, atol=1e-4
    )
