"""EsViT Swin-Transformer backbone.

Capability parity with the reference's vendored EsViT Swin
(reference src/classes/transformer/SwinTransformerModule.py:689-852 root
model; EncoderEsVit wrapper at TransformerEncoder.py:211-273): patch-embed
conv (4x4, stride 4) + LayerNorm, four stages of shifted-window blocks
(depths 2/2/6/2, heads 3/6/12/24, dims 96*2^i, window 14) with PatchMerging
between stages, final LayerNorm; dense-prediction output = (avg-pooled
latent, per-patch grid) (reference :821-837).

Swin conventions preserved:
  * window/shift clamped when stage resolution <= window size (stage 3 at
    224px runs 7x7 full-resolution attention, no shift)
  * alternating shift 0 / window//2 per block
  * padding to window multiples before partition (reference :359-363)
  * per-window relative position bias; additive -100 shift mask

The attention core is ops/window_attention.window_attention_core (XLA,
swappable for the Pallas kernel).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import LayerNorm, Mlp
from vit_ad_tpu.models.outputs import EncoderOutput
from vit_ad_tpu.ops import window_attention as wa

Array = jax.Array


class WindowAttention(nn.Module):
    """QKV/proj projections + relative-position-bias table around the core."""

    dim: int
    num_heads: int
    window: int
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, windows: Array, mask) -> Array:
        b_, n, c = windows.shape
        qkv = nn.Dense(
            3 * self.dim, dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="qkv",
        )(windows)
        qkv = qkv.reshape(b_, n, 3, self.num_heads, c // self.num_heads)
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
            self.dtypes.param_dtype,
        )
        import os

        core = wa.window_attention_core
        if os.environ.get("VITAD_PALLAS_WINDOW_ATTN") == "1":
            from vit_ad_tpu.ops.pallas.window_attention import (
                window_attention_core_pallas as core,
            )
        out = core(
            qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2],
            bias_table.astype(jnp.float32),
            self.num_heads,
            (self.window, self.window),
            mask,
            accum_dtype=self.dtypes.accum_dtype,
        )
        return nn.Dense(
            self.dim, dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="proj",
        )(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    input_resolution: Tuple[int, int]
    mlp_ratio: float = 4.0
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.input_resolution
        window, shift = self.window, self.shift
        if min(h, w) <= window:
            window, shift = min(h, w), 0

        b, l, c = x.shape
        shortcut = x
        y = LayerNorm(dtypes=self.dtypes, eps=1e-5, name="norm1")(x)
        y = y.reshape(b, h, w, c)

        pad_b = (window - h % window) % window
        pad_r = (window - w % window) % window
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
        windows = wa.window_partition(y, window)

        mask_np = wa.shift_attention_mask(hp, wp, window, shift)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        attn_out = WindowAttention(
            dim=c, num_heads=self.num_heads, window=window,
            dtypes=self.dtypes, name="attn",
        )(windows, mask)

        y = wa.window_reverse(attn_out, window, hp, wp)
        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            y = y[:, :h, :w, :]
        x = shortcut + y.reshape(b, l, c)

        y = LayerNorm(dtypes=self.dtypes, eps=1e-5, name="norm2")(x)
        x = x + Mlp(
            hidden_dim=int(c * self.mlp_ratio), dtypes=self.dtypes, name="mlp"
        )(y)
        return x


class PatchMerging(nn.Module):
    """2x2 concat + LayerNorm(4C) + Linear 4C→2C (reference :439-505)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = LayerNorm(dtypes=self.dtypes, eps=1e-5, name="norm")(x)
        return nn.Dense(
            2 * self.dim, use_bias=False, dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="reduction",
        )(x)


class SwinTransformer(nn.Module):
    """Swin-T trunk with dense-prediction output."""

    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 14
    mlp_ratio: float = 4.0
    dtypes: DtypePolicy = DtypePolicy()

    @property
    def final_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @property
    def num_patches(self) -> int:
        side = self.img_size // self.patch_size // 2 ** (len(self.depths) - 1)
        return side * side

    @nn.compact
    def __call__(self, x: Array, block_index: int = 0) -> EncoderOutput:
        b = x.shape[0]
        x = x.astype(self.dtypes.compute_dtype)
        x = nn.Conv(
            self.embed_dim, (self.patch_size,) * 2, strides=(self.patch_size,) * 2,
            padding="VALID", dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="patch_embed",
        )(x)
        _, h, w, _ = x.shape
        x = x.reshape(b, h * w, self.embed_dim)
        x = LayerNorm(dtypes=self.dtypes, eps=1e-5, name="patch_norm")(x)

        res = (h, w)
        dim = self.embed_dim
        for si, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            for bi in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=heads,
                    window=self.window,
                    shift=0 if bi % 2 == 0 else self.window // 2,
                    input_resolution=res,
                    mlp_ratio=self.mlp_ratio,
                    dtypes=self.dtypes,
                    name=f"layer{si}_block{bi}",
                )(x)
            if si < len(self.depths) - 1:
                x = PatchMerging(
                    input_resolution=res, dim=dim, dtypes=self.dtypes,
                    name=f"layer{si}_downsample",
                )(x)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        x_region = LayerNorm(dtypes=self.dtypes, eps=1e-5, name="norm")(x)
        latent = jnp.mean(x_region, axis=1)  # avgpool (reference :832-833)
        return EncoderOutput(patch_embedding=x_region, latent=latent)


class EsViTEncoder(nn.Module):
    """EncoderEsVit parity wrapper (reference TransformerEncoder.py:211-273):
    effective patch 32, embed 768 at the dense-prediction output."""

    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        self.esvit = SwinTransformer(img_size=self.img_size, dtypes=self.dtypes)

    @property
    def embed_dim(self) -> int:
        return 768

    @property
    def num_patches(self) -> int:
        return (self.img_size // 32) ** 2

    def __call__(self, x: Array, block_index: int = 0) -> EncoderOutput:
        return self.esvit(x, block_index=block_index)


def esvit_swin_tiny(img_size: int = 224, dtypes: DtypePolicy = DtypePolicy()) -> EsViTEncoder:
    return EsViTEncoder(img_size=img_size, dtypes=dtypes)
