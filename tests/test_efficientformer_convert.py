"""Golden parity: a torch EfficientFormer (timm 0.6.x layout: Stem4, 4D
pool-mixer blocks with ConvMlpWithNorm, Flat slot, LeViT-style 3D attention
with absolute-offset attention biases, final LayerNorm) vs our
EfficientFormer with converted weights (reference loads timm
efficientformer_l3 pretrained, src/classes/transformer/TransformerEncoder.py:92)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.efficientformer import EfficientFormer
from vit_ad_tpu.utils.torch_convert import (
    convert_efficientformer,
    merge_variables,
    state_dict_to_numpy,
)

F32 = DtypePolicy.f32()


class ConvNorm(tnn.Module):
    def __init__(self, in_ch, out_ch, k=1, s=1):
        super().__init__()
        # named fc/norm pairs are flattened by the callers' attribute names
        self.conv = tnn.Conv2d(in_ch, out_ch, k, s, k // 2)
        self.bn = tnn.BatchNorm2d(out_ch)


class TorchStem(tnn.Module):
    def __init__(self, out):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, out // 2, 3, 2, 1)
        self.norm1 = tnn.BatchNorm2d(out // 2)
        self.conv2 = tnn.Conv2d(out // 2, out, 3, 2, 1)
        self.norm2 = tnn.BatchNorm2d(out)

    def forward(self, x):
        x = torch.nn.functional.gelu(self.norm1(self.conv1(x)))
        return torch.nn.functional.gelu(self.norm2(self.conv2(x)))


class TorchDownsample(tnn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, 3, 2, 1)
        self.norm = tnn.BatchNorm2d(out_ch)

    def forward(self, x):
        return self.norm(self.conv(x))


class TorchMetaBlock2d(tnn.Module):
    def __init__(self, dim, mlp_ratio=4.0):
        super().__init__()
        h = int(dim * mlp_ratio)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Conv2d(dim, h, 1)
        self.mlp.norm1 = tnn.BatchNorm2d(h)
        self.mlp.fc2 = tnn.Conv2d(h, dim, 1)
        self.mlp.norm2 = tnn.BatchNorm2d(dim)
        self.layer_scale_1 = tnn.Parameter(1e-5 * torch.ones(dim))
        self.layer_scale_2 = tnn.Parameter(1e-5 * torch.ones(dim))

    def forward(self, x):
        pooled = torch.nn.functional.avg_pool2d(
            x, 3, stride=1, padding=1, count_include_pad=False
        )
        x = x + self.layer_scale_1.reshape(1, -1, 1, 1) * (pooled - x)
        y = self.mlp.norm1(self.mlp.fc1(x))
        y = torch.nn.functional.gelu(y)
        y = self.mlp.norm2(self.mlp.fc2(y))
        return x + self.layer_scale_2.reshape(1, -1, 1, 1) * y


class TorchAttention(tnn.Module):
    def __init__(self, dim, key_dim, num_heads, attn_ratio, resolution):
        super().__init__()
        self.num_heads, self.key_dim = num_heads, key_dim
        self.d = attn_ratio * key_dim
        self.dh = self.d * num_heads
        h = num_heads * (2 * key_dim + self.d)
        self.qkv = tnn.Linear(dim, h)
        self.proj = tnn.Linear(self.dh, dim)
        pts = list(itertools.product(range(resolution), range(resolution)))
        offsets, idxs = {}, []
        for p1 in pts:
            for p2 in pts:
                off = (abs(p1[0] - p2[0]), abs(p1[1] - p2[1]))
                # timm indexes |dy|*res + |dx| directly
                idxs.append(off[0] * resolution + off[1])
        self.attention_biases = tnn.Parameter(
            torch.zeros(num_heads, resolution**2)
        )
        self.register_buffer(
            "attention_bias_idxs",
            torch.LongTensor(idxs).view(len(pts), len(pts)),
        )

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.qkv(x).reshape(b, n, self.num_heads, -1).permute(0, 2, 1, 3)
        q, k, v = qkv.split([self.key_dim, self.key_dim, self.d], dim=3)
        attn = (q @ k.transpose(-2, -1)) * self.key_dim**-0.5
        attn = attn + self.attention_biases[:, self.attention_bias_idxs]
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, self.dh)
        return self.proj(out)


class TorchMetaBlock1d(tnn.Module):
    def __init__(self, dim, key_dim, num_heads, attn_ratio, resolution,
                 mlp_ratio=4.0):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.token_mixer = TorchAttention(dim, key_dim, num_heads, attn_ratio,
                                          resolution)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        h = int(dim * mlp_ratio)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, h)
        self.mlp.fc2 = tnn.Linear(h, dim)
        self.layer_scale_1 = tnn.Parameter(1e-5 * torch.ones(dim))
        self.layer_scale_2 = tnn.Parameter(1e-5 * torch.ones(dim))

    def forward(self, x):
        x = x + self.layer_scale_1 * self.token_mixer(self.norm1(x))
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + self.layer_scale_2 * y


class TorchEfficientFormer(tnn.Module):
    def __init__(self, img=32, dims=(8, 16), depths=(2, 3), vit_num=2,
                 key_dim=4, num_heads=2, attn_ratio=2):
        super().__init__()
        self.stem = TorchStem(dims[0])
        resolution = img // (4 * 2 ** (len(dims) - 1))
        stages = []
        for si, (dim, depth) in enumerate(zip(dims, depths)):
            stage = tnn.Module()
            stage.downsample = (
                TorchDownsample(dims[si - 1], dim) if si else tnn.Identity()
            )
            blocks = []
            n_3d = vit_num if si == len(dims) - 1 else 0
            for bi in range(depth - n_3d):
                blocks.append(TorchMetaBlock2d(dim))
            if n_3d:
                blocks.append(tnn.Identity())  # Flat slot (parameter-less)
                for bi in range(n_3d):
                    blocks.append(TorchMetaBlock1d(
                        dim, key_dim, num_heads, attn_ratio, resolution))
            stage.blocks = tnn.Sequential(*blocks)
            stages.append(stage)
        self.stages = tnn.ModuleList(stages)
        self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)
        self.n_3d = vit_num

    def forward_features(self, x):
        x = self.stem(x)
        for si, stage in enumerate(self.stages):
            x = stage.downsample(x)
            flat = False
            for blk in stage.blocks:
                if isinstance(blk, tnn.Identity):
                    b, c, h, w = x.shape
                    x = x.flatten(2).transpose(1, 2)  # [B, N, C]
                    flat = True
                elif isinstance(blk, TorchMetaBlock1d):
                    x = blk(x)
                else:
                    x = blk(x)
        return self.norm(x)  # [B, N, C]


def test_efficientformer_convert_golden(rng):
    torch.manual_seed(11)
    tm = TorchEfficientFormer().eval()
    # break the symmetry of zero-init attention biases
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, TorchAttention):
                m.attention_biases.normal_(0, 0.5)
            if isinstance(m, (TorchMetaBlock1d, TorchMetaBlock2d)):
                m.layer_scale_1.normal_(0.1, 0.05)
                m.layer_scale_2.normal_(0.1, 0.05)

    model = EfficientFormer(img_size=32, dims=(8, 16), depths=(2, 3),
                            vit_num=2, num_heads=2, key_dim=4, attn_ratio=2,
                            dtypes=F32)
    base = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    converted = convert_efficientformer(
        state_dict_to_numpy(tm.state_dict()), depths=(2, 3), vit_num=2
    )
    variables = merge_variables(base, converted)

    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = tm.forward_features(
            torch.from_numpy(x).permute(0, 3, 1, 2)
        ).numpy()
    out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out.patch_embedding), want, rtol=3e-4, atol=3e-5
    )


def test_efficientformer_convert_strict(rng):
    torch.manual_seed(11)
    tm = TorchEfficientFormer()
    sd = state_dict_to_numpy(tm.state_dict())
    sd["stages.0.blocks.0.mystery"] = np.zeros(2)
    import pytest

    with pytest.raises(ValueError, match="not consumed"):
        convert_efficientformer(sd, depths=(2, 3), vit_num=2)
