"""ViT / DeiT encoders.

Capability parity with reference EncoderDeit / EncoderVit
(reference src/classes/transformer/TransformerEncoder.py:116-208):

  * DeiT-base distilled patch16 224 — 2 prefix tokens (cls + dist); forward
    strips both; latent = cls token (reference :168-172).
  * ViT-base patch16 224 — 1 prefix token; latent = cls token (ref :204-207).
  * Truncated forward at `block_index` with the trained final LayerNorm
    re-applied after EVERY block — the FastFlow trick (reference :149-163:
    when block_index != 0 the loop runs blocks 0..block_index and applies
    `self.deit.norm` inside the loop each iteration).

The whole forward is a single jit-compiled graph: patch-embed conv (MXU),
`depth` pre-LN blocks, final norm. Weights are frozen by construction —
parameters live outside any optimizer state and gradients are never taken
through the encoder (see pipeline.features).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import LayerNorm, PatchEmbed, TransformerBlock
from vit_ad_tpu.models.outputs import EncoderOutput

Array = jax.Array


class ViTEncoder(nn.Module):
    """Monolithic pre-LN vision transformer (ViT/DeiT family).

    num_prefix_tokens: 1 for ViT (cls), 2 for distilled DeiT (cls + dist).
    block_index semantics follow the reference: 0 = full depth with one final
    norm; k != 0 = run blocks 0..k applying the final norm after every block.
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_prefix_tokens: int = 1
    dtypes: DtypePolicy = DtypePolicy()

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    @nn.compact
    def __call__(self, x: Array, block_index: int = 0) -> EncoderOutput:
        b = x.shape[0]
        x = x.astype(self.dtypes.compute_dtype)
        tokens = PatchEmbed(
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            dtypes=self.dtypes,
            name="patch_embed",
        )(x)

        prefix = self.param(
            "prefix_tokens",
            nn.initializers.truncated_normal(0.02),
            (1, self.num_prefix_tokens, self.embed_dim),
            self.dtypes.param_dtype,
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, self.num_prefix_tokens + self.num_patches, self.embed_dim),
            self.dtypes.param_dtype,
        )
        tokens = jnp.concatenate(
            [
                jnp.broadcast_to(
                    prefix, (b, self.num_prefix_tokens, self.embed_dim)
                ).astype(self.dtypes.compute_dtype),
                tokens,
            ],
            axis=1,
        )
        tokens = tokens + pos_embed.astype(self.dtypes.compute_dtype)

        blocks = [
            TransformerBlock(
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                dtypes=self.dtypes,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        final_norm = LayerNorm(dtypes=self.dtypes, name="norm")

        if block_index != 0:
            # FastFlow truncation: norm re-applied after every block
            # (reference TransformerEncoder.py:159-163).
            for i in range(block_index + 1):
                tokens = blocks[i](tokens)
                tokens = final_norm(tokens)
        else:
            for blk in blocks:
                tokens = blk(tokens)
            tokens = final_norm(tokens)

        patch_embedding = tokens[:, self.num_prefix_tokens :, :]
        latent = tokens[:, 0, :]  # cls token (reference :169, :206)
        return EncoderOutput(patch_embedding=patch_embedding, latent=latent)


def deit_base_distilled_patch16(img_size: int = 224, dtypes: DtypePolicy = DtypePolicy()) -> ViTEncoder:
    """DeiT-base distilled /16 — reference EncoderDeit (TransformerEncoder.py:116)."""
    return ViTEncoder(
        img_size=img_size,
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        num_prefix_tokens=2,
        dtypes=dtypes,
    )


def vit_base_patch16(img_size: int = 224, dtypes: DtypePolicy = DtypePolicy()) -> ViTEncoder:
    """ViT-base /16 — reference EncoderVit (TransformerEncoder.py:176)."""
    return ViTEncoder(
        img_size=img_size,
        patch_size=16,
        embed_dim=768,
        depth=12,
        num_heads=12,
        num_prefix_tokens=1,
        dtypes=dtypes,
    )
