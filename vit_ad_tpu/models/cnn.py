"""Vanilla CNN encoder.

Parity with reference EncoderVanillaCNN (reference
src/classes/CnnEncoder.py:16-103): five stages of conv3x3(s1) → BN → ReLU →
maxpool3x3(s2), channels 3→48→96→192→384→768; a 224px image becomes a
[7, 7, 768] feature map. NHWC throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import FusedBatchNorm
from vit_ad_tpu.models.outputs import EncoderOutput

Array = jax.Array

CHANNELS = (48, 96, 192, 384, 768)


class VanillaCNNEncoder(nn.Module):
    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    @property
    def embed_dim(self) -> int:
        return CHANNELS[-1]

    @property
    def num_patches(self) -> int:
        # each stage's MaxPool(3, stride 2, pad 1) gives ceil(n/2) — (img//32)²
        # is only correct for img_size divisible by 32 (e.g. 100px → 4² grid,
        # not 3²)
        side = self.img_size
        for _ in CHANNELS:
            side = -(-side // 2)
        return side * side

    @nn.compact
    def __call__(
        self, x: Array, block_index: int = 0, train: bool = False
    ) -> EncoderOutput:
        """Uniform encoder API (patch tokens + pooled latent; block_index is
        accepted and ignored — no truncation point in a 5-stage CNN), so the
        MDN/NF heads can train on this backbone like any other."""
        b = x.shape[0]
        x = x.astype(self.dtypes.compute_dtype)
        for i, ch in enumerate(CHANNELS):
            x = nn.Conv(
                ch, (3, 3), strides=(1, 1), padding="SAME",
                dtype=self.dtypes.compute_dtype,
                param_dtype=self.dtypes.param_dtype,
                name=f"conv{i + 1}",
            )(x)
            x = FusedBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtypes=self.dtypes,
                name=f"bn{i + 1}",
            )(x).astype(self.dtypes.compute_dtype)
            x = nn.relu(x)
            # torch MaxPool2d(kernel 3, stride 2, padding 1): halves H/W.
            x = nn.max_pool(
                x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
            )
        tokens = x.reshape(b, -1, CHANNELS[-1])  # [B, (img/32)^2, 768]
        return EncoderOutput(
            patch_embedding=tokens, latent=jnp.mean(tokens, axis=1)
        )
