"""Golden parity: a torch NesT (timm jx_nest layout, including the
transposed head-merge quirk in its attention) vs our NesT with converted
weights (reference loads timm jx_nest_tiny pretrained,
src/classes/transformer/TransformerEncoder.py:57)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.nest import NesT
from vit_ad_tpu.utils.torch_convert import (
    convert_nest,
    merge_variables,
    state_dict_to_numpy,
)

F32 = DtypePolicy.f32()


def _blockify(x, block):  # [B, H, W, C] -> [B, T, N, C] (timm nest.blockify)
    b, h, w, c = x.shape
    gh, gw = h // block, w // block
    x = x.reshape(b, gh, block, gw, block, c)
    return x.transpose(2, 3).reshape(b, gh * gw, block * block, c)


def _deblockify(x, block, h, w):
    b = x.shape[0]
    c = x.shape[-1]
    gh = h // block
    x = x.reshape(b, gh, w // block, block, block, c)
    return x.transpose(2, 3).reshape(b, h, w, c)


class TorchNestAttention(tnn.Module):
    """timm nest Attention with its (head_dim, heads) output merge."""

    def __init__(self, dim, heads):
        super().__init__()
        self.qkv = tnn.Linear(dim, 3 * dim)
        self.proj = tnn.Linear(dim, dim)
        self.heads = heads

    def forward(self, x):  # [B, T, N, C]
        b, t, n, c = x.shape
        hd = c // self.heads
        qkv = self.qkv(x).reshape(b, t, n, 3, self.heads, hd).permute(
            3, 0, 4, 1, 2, 5
        )
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * hd**-0.5
        attn = attn.softmax(dim=-1)
        # timm quirk: merge as (..., head_dim, heads) then flatten
        return self.proj((attn @ v).permute(0, 2, 3, 4, 1).reshape(b, t, n, c))


class TorchNestBlock(tnn.Module):
    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchNestAttention(dim, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class TorchConvPool(tnn.Module):
    def __init__(self, in_ch, out_ch):
        super().__init__()
        self.conv = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.norm = tnn.LayerNorm(out_ch, eps=1e-6)
        self.pool = tnn.MaxPool2d(3, stride=2, padding=1)

    def forward(self, x):  # NCHW
        x = self.conv(x)
        x = self.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        return self.pool(x)


class TorchNestLevel(tnn.Module):
    def __init__(self, prev_dim, dim, heads, depth, num_blocks, seq_len):
        super().__init__()
        self.pos_embed = tnn.Parameter(
            torch.randn(1, num_blocks, seq_len, dim) * 0.02
        )
        self.pool = TorchConvPool(prev_dim, dim) if prev_dim else tnn.Identity()
        self.transformer_encoder = tnn.Sequential(
            *[TorchNestBlock(dim, heads) for _ in range(depth)]
        )
        self.block = int(seq_len**0.5)

    def forward(self, x):  # NCHW
        x = self.pool(x)
        x = x.permute(0, 2, 3, 1)
        h, w = x.shape[1], x.shape[2]
        x = _blockify(x, self.block) + self.pos_embed
        x = self.transformer_encoder(x)
        return _deblockify(x, self.block, h, w).permute(0, 3, 1, 2)


class TorchNest(tnn.Module):
    def __init__(self, img=32, patch=4, dims=(4, 8, 16), heads=(1, 2, 4),
                 depths=(1, 1, 2)):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dims[0], patch, stride=patch)
        final_side = img // (patch * 2 ** (len(depths) - 1))
        levels = []
        res = img // patch
        prev = None
        for i, (d, h, dep) in enumerate(zip(dims, heads, depths)):
            grid = (res // final_side) ** 2
            levels.append(
                TorchNestLevel(prev, d, h, dep, grid, final_side**2)
            )
            prev = d
            res //= 2
        self.levels = tnn.Sequential(*levels)
        self.norm = tnn.LayerNorm(dims[-1], eps=1e-6)

    def forward_features(self, x):
        x = self.patch_embed.proj(x)
        x = self.levels(x)
        return self.norm(x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)


def test_nest_convert_golden(rng):
    torch.manual_seed(7)
    tm = TorchNest().eval()
    model = NesT(img_size=32, patch_size=4, embed_dims=(4, 8, 16),
                 num_heads=(1, 2, 4), depths=(1, 1, 2), dtypes=F32)
    base = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    converted = convert_nest(
        state_dict_to_numpy(tm.state_dict()),
        depths=(1, 1, 2), num_heads=(1, 2, 4),
    )
    variables = merge_variables(base, converted)

    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm.forward_features(torch.from_numpy(x).permute(0, 3, 1, 2))
    # timm returns NCHW [B, C, s, s]; ours returns tokens [B, s*s, C]
    want_tokens = want.permute(0, 2, 3, 1).reshape(2, -1, 16).numpy()

    out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out.patch_embedding), want_tokens, rtol=2e-4, atol=2e-5
    )


def test_nest_convert_strict_rejects_unknown_keys(rng):
    torch.manual_seed(7)
    tm = TorchNest()
    sd = state_dict_to_numpy(tm.state_dict())
    sd["levels.0.transformer_encoder.0.attn.extra.weight"] = np.zeros(3)
    import pytest

    with pytest.raises(ValueError, match="not consumed"):
        convert_nest(sd, depths=(1, 1, 2), num_heads=(1, 2, 4))
