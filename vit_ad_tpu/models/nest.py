"""NesT (Nested Transformer) tiny backbone.

Capability parity with reference EncoderNest (reference
src/classes/transformer/TransformerEncoder.py:46-78), which wraps timm
`jx_nest_tiny`: patch-embed conv 4x4/s4, three levels with embed dims
(96, 192, 384), heads (3, 6, 12), depths (2, 2, 8); each level partitions the
grid into non-overlapping 14x14-token blocks, runs standard pre-LN
transformer blocks *within* each block (plus a per-level positional
embedding), and aggregates between levels with ConvPool
(conv3x3 → LayerNorm → maxpool3x3/s2). Output: [B, 196, 384] tokens at /16
with avg-pool latent (reference :67-76).

Deviation (documented): the reference reshapes timm's NCHW [B,384,14,14]
feature map directly to [B,196,384], which interleaves channels and
positions (TransformerEncoder.py:71-75). We return properly-transposed
channel-last tokens; downstream heads are permutation-agnostic at
training time, so behavior parity is preserved while the map is actually
spatially meaningful.

Block attention maps onto the same windowed-attention core as Swin
(ops/window_attention) — NesT blocks are windows without shifting.
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


class NestBlock(nn.Module):
    """Pre-LN transformer block over [B*nBlocks, N, C] block tokens.

    NesT's non-overlapping block attention is an unshifted window attention,
    so it rides the same fused-Pallas-on-TPU path as the ViT blocks
    (models/vit.py _use_pallas_attention)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b_, n, c = x.shape
        y = LayerNorm(dtypes=self.dtypes, name="norm1")(x)
        qkv = nn.Dense(3 * c, dtype=self.dtypes.compute_dtype,
                       param_dtype=self.dtypes.param_dtype, name="qkv")(y)
        from vit_ad_tpu.models.vit import _use_pallas_attention

        if _use_pallas_attention():
            # packed [B_, N, 3C] straight into the kernel — the host-side
            # [B,N,3,H,hd] split materializes three strided HBM copies the
            # packed kernel avoids (see ops/pallas _kernel_qkv)
            from vit_ad_tpu.ops.pallas.window_attention import (
                vit_attention_qkv,
            )

            out = vit_attention_qkv(qkv, self.num_heads).astype(
                self.dtypes.compute_dtype
            )
        else:
            qkv = qkv.reshape(b_, n, 3, self.num_heads, c // self.num_heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            scale = (c // self.num_heads) ** -0.5
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                              preferred_element_type=self.dtypes.accum_dtype)
            attn = jax.nn.softmax(attn.astype(self.dtypes.accum_dtype), axis=-1)
            out = jnp.einsum(
                "bhnm,bmhd->bnhd", attn.astype(self.dtypes.compute_dtype), v
            ).reshape(b_, n, c)
        x = x + nn.Dense(c, dtype=self.dtypes.compute_dtype,
                         param_dtype=self.dtypes.param_dtype, name="proj")(out)
        y = LayerNorm(dtypes=self.dtypes, name="norm2")(x)
        x = x + Mlp(hidden_dim=int(c * self.mlp_ratio), dtypes=self.dtypes,
                    name="mlp")(y)
        return x


class ConvPool(nn.Module):
    """Between-level aggregation: conv3x3 → LayerNorm → maxpool3x3/s2."""

    out_dim: int
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array) -> Array:  # [B, H, W, C]
        x = nn.Conv(self.out_dim, (3, 3), padding="SAME",
                    dtype=self.dtypes.compute_dtype,
                    param_dtype=self.dtypes.param_dtype, name="conv")(x)
        x = LayerNorm(dtypes=self.dtypes, name="norm")(x)
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))


class NesT(nn.Module):
    img_size: int = 224
    patch_size: int = 4
    embed_dims: Sequence[int] = (96, 192, 384)
    num_heads: Sequence[int] = (3, 6, 12)
    depths: Sequence[int] = (2, 2, 8)
    dtypes: DtypePolicy = DtypePolicy()

    @property
    def embed_dim(self) -> int:
        return self.embed_dims[-1]

    @property
    def num_patches(self) -> int:
        # final grid is at stride patch_size * 2^(levels-1)
        side = self.img_size // (self.patch_size * 2 ** (len(self.depths) - 1))
        return side * side

    @nn.compact
    def __call__(self, x: Array, block_index: int = 0) -> EncoderOutput:
        b = x.shape[0]
        x = nn.Conv(
            self.embed_dims[0], (self.patch_size,) * 2,
            strides=(self.patch_size,) * 2, padding="VALID",
            dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="patch_embed",
        )(x.astype(self.dtypes.compute_dtype))

        n_levels = len(self.depths)
        # NesT block side: final level is one block covering the whole grid
        final_side = self.img_size // (self.patch_size * 2 ** (n_levels - 1))
        for lvl, (dim, heads, depth) in enumerate(
            zip(self.embed_dims, self.num_heads, self.depths)
        ):
            _, h, w, c = x.shape
            block = final_side  # block side in tokens, same at every level
            grid = h // block   # blocks per side
            pos = self.param(
                f"pos_embed_{lvl}",
                nn.initializers.truncated_normal(0.02),
                (1, grid * grid, block * block, dim),
                self.dtypes.param_dtype,
            )
            tokens = wa.window_partition(x, block)  # [B*nB, block², C]
            tokens = tokens.reshape(b, grid * grid, block * block, dim)
            tokens = tokens + pos.astype(tokens.dtype)
            tokens = tokens.reshape(b * grid * grid, block * block, dim)
            for bi in range(depth):
                tokens = NestBlock(
                    dim=dim, num_heads=heads, dtypes=self.dtypes,
                    name=f"level{lvl}_block{bi}",
                )(tokens)
            x = wa.window_reverse(tokens, block, h, w)
            if lvl < n_levels - 1:
                x = ConvPool(
                    out_dim=self.embed_dims[lvl + 1], dtypes=self.dtypes,
                    name=f"pool{lvl}",
                )(x)

        x = LayerNorm(dtypes=self.dtypes, name="norm")(x)  # [B, s, s, 384]
        tokens = x.reshape(b, -1, self.embed_dims[-1])
        return EncoderOutput(
            patch_embedding=tokens, latent=jnp.mean(tokens, axis=1)
        )


def nest_tiny(img_size: int = 224, dtypes: DtypePolicy = DtypePolicy()) -> NesT:
    return NesT(img_size=img_size, dtypes=dtypes)
