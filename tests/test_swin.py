"""Swin/EsViT backbone: golden parity with a torch implementation of the
reference's vendored Swin semantics (reference
src/classes/transformer/SwinTransformerModule.py: WindowAttention :84-193,
block shift/pad :349-416, PatchMerging :439-505, forward_features :821-837),
plus shape tests for the full EsViT config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.swin import SwinTransformer
from vit_ad_tpu.ops import window_attention as wa

F32 = DtypePolicy.f32()


# ---------------- torch mini-swin (reference semantics) ---------------------

def t_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)


def t_window_reverse(win, ws, H, W):
    B = win.shape[0] // (H * W // ws // ws)
    x = win.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(B, H, W, -1)


class TWindowAttention(tnn.Module):
    def __init__(self, dim, ws, heads):
        super().__init__()
        self.dim, self.ws, self.heads = dim, ws, heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, heads) * 0.02
        )
        coords = torch.stack(
            torch.meshgrid(torch.arange(ws), torch.arange(ws), indexing="ij")
        ).flatten(1)
        rel = (coords[:, :, None] - coords[:, None, :]).permute(1, 2, 0)
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))

    def forward(self, x, mask=None):
        B_, N, C = x.shape
        qkv = self.qkv(x).reshape(B_, N, 3, self.heads, C // self.heads).permute(
            2, 0, 3, 1, 4
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * (C // self.heads) ** -0.5) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[self.relative_position_index.view(-1)].view(
            N, N, -1
        ).permute(2, 0, 1)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.view(B_ // nW, nW, self.heads, N, N) + mask[None, :, None]
            attn = attn.view(-1, self.heads, N, N)
        attn = attn.softmax(-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, N, C)
        return self.proj(x)


class TBlock(tnn.Module):
    def __init__(self, dim, res, heads, ws, shift):
        super().__init__()
        self.res, self.dim = res, dim
        if min(res) <= ws:
            ws, shift = min(res), 0
        self.ws, self.shift = ws, shift
        self.norm1 = tnn.LayerNorm(dim, eps=1e-5)
        self.attn = TWindowAttention(dim, ws, heads)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-5)
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)
        if shift > 0:
            H, W = res
            img_mask = torch.zeros(1, H, W, 1)
            cnt = 0
            for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                    img_mask[:, hs, wsl, :] = cnt
                    cnt += 1
            mw = t_window_partition(img_mask, ws).squeeze(-1)
            am = mw.unsqueeze(1) - mw.unsqueeze(2)
            am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
            self.register_buffer("attn_mask", am)
        else:
            self.attn_mask = None

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        shortcut = x
        x = self.norm1(x).view(B, H, W, C)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), (1, 2))
        win = t_window_partition(x, self.ws)
        win = self.attn(win, self.attn_mask)
        x = t_window_reverse(win, self.ws, H, W)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), (1, 2))
        x = shortcut + x.reshape(B, L, C)
        x = x + self.fc2(TF.gelu(self.fc1(self.norm2(x))))
        return x


class TMerge(tnn.Module):
    def __init__(self, res, dim):
        super().__init__()
        self.res, self.dim = res, dim
        self.norm = tnn.LayerNorm(4 * dim, eps=1e-5)
        self.reduction = tnn.Linear(4 * dim, 2 * dim, bias=False)

    def forward(self, x):
        H, W = self.res
        B, L, C = x.shape
        x = x.view(B, H, W, C)
        x = torch.cat(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]],
            -1,
        ).view(B, -1, 4 * C)
        return self.reduction(self.norm(x))


class TSwin(tnn.Module):
    def __init__(self, img=16, patch=2, dim=8, depths=(2, 2), heads=(2, 4), ws=4):
        super().__init__()
        self.patch_embed = tnn.Conv2d(3, dim, patch, patch)
        self.patch_norm = tnn.LayerNorm(dim, eps=1e-5)
        res = (img // patch, img // patch)
        self.blocks = tnn.ModuleList()
        self.merges = tnn.ModuleList()
        d = dim
        for si, (depth, h) in enumerate(zip(depths, heads)):
            for bi in range(depth):
                self.blocks.append(
                    TBlock(d, res, h, ws, 0 if bi % 2 == 0 else ws // 2)
                )
            if si < len(depths) - 1:
                self.merges.append(TMerge(res, d))
                res = (res[0] // 2, res[1] // 2)
                d *= 2
        self.depths = depths
        self.norm = tnn.LayerNorm(d, eps=1e-5)

    def forward(self, x):
        x = self.patch_embed(x).flatten(2).transpose(1, 2)
        x = self.patch_norm(x)
        bi = 0
        for si, depth in enumerate(self.depths):
            for _ in range(depth):
                x = self.blocks[bi](x)
                bi += 1
            if si < len(self.depths) - 1:
                x = self.merges[si](x)
        x = self.norm(x)
        return x.mean(1), x


def _torch_to_swin_params(tm: TSwin, depths=(2, 2)):
    """Map the torch mini-swin state onto our scan-stacked param tree."""
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    ln = lambda p: {"LayerNorm_0": {"scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"]}}
    params = {
        "patch_embed": {
            "kernel": np.transpose(sd["patch_embed.weight"], (2, 3, 1, 0)),
            "bias": sd["patch_embed.bias"],
        },
        "patch_norm": ln("patch_norm"),
        "norm": ln("norm"),
    }

    def block_leaves(p):
        return {
            "norm1_scale": sd[f"{p}.norm1.weight"],
            "norm1_bias": sd[f"{p}.norm1.bias"],
            "qkv_kernel": sd[f"{p}.attn.qkv.weight"].T,
            "qkv_bias": sd[f"{p}.attn.qkv.bias"],
            "bias_table": sd[f"{p}.attn.relative_position_bias_table"],
            "proj_kernel": sd[f"{p}.attn.proj.weight"].T,
            "proj_bias": sd[f"{p}.attn.proj.bias"],
            "norm2_scale": sd[f"{p}.norm2.weight"],
            "norm2_bias": sd[f"{p}.norm2.bias"],
            "fc1_kernel": sd[f"{p}.fc1.weight"].T,
            "fc1_bias": sd[f"{p}.fc1.bias"],
            "fc2_kernel": sd[f"{p}.fc2.weight"].T,
            "fc2_bias": sd[f"{p}.fc2.bias"],
        }

    bi = 0
    for si, depth in enumerate(depths):
        stage = {}
        for tag, parity in (("a", 0), ("b", 1)):
            leaves = [
                block_leaves(f"blocks.{bi + 2 * j + parity}")
                for j in range(depth // 2)
            ]
            for key in leaves[0]:
                stage[f"{tag}_{key}"] = np.stack([lv[key] for lv in leaves])
        params[f"layer{si}"] = stage
        bi += depth
        if si < len(depths) - 1:
            params[f"layer{si}_downsample"] = {
                "norm": ln(f"merges.{si}.norm"),
                "reduction": {"kernel": sd[f"merges.{si}.reduction.weight"].T},
            }
    return {"params": params}


def test_swin_parity_with_torch(rng):
    torch.manual_seed(11)
    tm = TSwin().eval()
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want_latent, want_region = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    model = SwinTransformer(
        img_size=16, patch_size=2, embed_dim=8, depths=(2, 2), num_heads=(2, 4),
        window=4, dtypes=F32,
    )
    variables = _torch_to_swin_params(tm)
    out = model.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out.patch_embedding), want_region.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out.latent), want_latent.numpy(), rtol=1e-4, atol=1e-5
    )


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
    w = wa.window_partition(x, 4)
    assert w.shape == (2 * 4, 16, 5)
    back = wa.window_reverse(w, 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_esvit_full_config_shapes():
    model = SwinTransformer(img_size=224, dtypes=F32)
    # trace shapes only (no weights materialized): use jax.eval_shape
    variables_shape = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 3))), jax.random.key(0)
    )
    out = jax.eval_shape(
        model.apply, variables_shape, jnp.zeros((1, 224, 224, 3))
    )
    assert out.patch_embedding.shape == (1, 49, 768)
    assert out.latent.shape == (1, 768)


def test_shift_mask_static():
    m = wa.shift_attention_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {-100.0, 0.0}
    assert wa.shift_attention_mask(8, 8, 4, 0) is None


def test_partition_perm_matches_roll_partition(rng):
    """The gather formulation (one static token permutation, roll folded
    in) must reproduce roll(-s) + window_partition exactly, and its inverse
    must reproduce window_reverse + roll(+s)."""
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)).astype(np.float32))
    for shift in (0, 2):
        perm, inv = wa.partition_perm(8, 8, 4, shift)
        got = jnp.take(x.reshape(2, 64, 5), jnp.asarray(perm), axis=1)
        got = got.reshape(-1, 16, 5)
        ref = wa.window_partition(
            jnp.roll(x, shift=(-shift, -shift), axis=(1, 2)), 4
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        back = jnp.take(got.reshape(2, 64, 5), jnp.asarray(inv), axis=1)
        np.testing.assert_array_equal(
            np.asarray(back.reshape(2, 8, 8, 5)), np.asarray(x)
        )


def test_swin_gather_partition_mode_equivalence(rng, monkeypatch):
    """VITAD_SWIN_PARTITION=gather (the transpose-kill A/B lever) must be
    bit-equal to the default transpose path through a full multi-stage
    Swin forward (includes shifted blocks)."""
    model = SwinTransformer(
        img_size=32, patch_size=2, embed_dim=8, depths=(2, 2),
        num_heads=(2, 4), window=4, dtypes=F32,
    )
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    ref = model.apply(variables, x)
    monkeypatch.setenv("VITAD_SWIN_PARTITION", "gather")
    got = model.apply(variables, x)
    np.testing.assert_array_equal(
        np.asarray(got.patch_embedding), np.asarray(ref.patch_embedding)
    )


def test_swin_ln_fold_equivalence(rng, monkeypatch):
    """VITAD_SWIN_LN_FOLD=1 (LN folded into the qkv/fc1 GEMMs via the
    commuting per-token rsqrt scalar) must match the default path to
    float reassociation tolerance through a full multi-stage forward."""
    model = SwinTransformer(
        img_size=32, patch_size=2, embed_dim=8, depths=(2, 2),
        num_heads=(2, 4), window=4, dtypes=F32,
    )
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    ref = model.apply(variables, x)
    monkeypatch.setenv("VITAD_SWIN_LN_FOLD", "1")
    got = model.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got.patch_embedding), np.asarray(ref.patch_embedding),
        rtol=2e-4, atol=2e-4,
    )


def test_vit_ln_fold_equivalence(rng, monkeypatch):
    """VITAD_VIT_LN_FOLD=1 on the ViT/DeiT blocks (same folded-GEMM math,
    models/vit._block_apply) must match the default forward to
    reassociation tolerance."""
    from vit_ad_tpu.models.vit import ViTEncoder

    enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=32, depth=2,
                     num_heads=4, num_prefix_tokens=2, dtypes=F32)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    variables = enc.init(jax.random.key(0), x)
    ref = enc.apply(variables, x)
    monkeypatch.setenv("VITAD_VIT_LN_FOLD", "1")
    got = enc.apply(variables, x)
    np.testing.assert_allclose(
        np.asarray(got.patch_embedding), np.asarray(ref.patch_embedding),
        rtol=2e-4, atol=2e-4,
    )
