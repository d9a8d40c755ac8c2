"""Conv decoders for the reconstruction head.

Parity with reference CnnDecoder.py:
  * SmallDecoder — DecoderVanillaCNN (reference src/classes/CnnDecoder.py:16-117):
    optional MLP z→2z→768·s·s + unflatten, then five ConvTranspose stages
    768→384→192→96→48→3 each followed by BN+ReLU, final BN+Tanh.
  * ResNetDecoder — DecoderResNetVariableEmbeddingSize (CnnDecoder.py:158-196):
    fc emb→2·emb→2048, ReverseResNet trunk to [img/4, img/4, 64], nearest
    upsample to img/2, 7x7 stride-2 transposed conv, BN, Tanh.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import FusedBatchNorm
from vit_ad_tpu.models.reverse_resnet import ReverseResNetTrunk, _upsample_nearest

Array = jax.Array

DECODER_CHANNELS = (384, 192, 96, 48, 3)


class SmallDecoder(nn.Module):
    """5-stage transposed-conv decoder ("small decoder").

    linear_end=True reproduces DecoderCNNLinEnd (reference
    CnnDecoder.py:120-155, "currently not in use"): ReLU + a final linear
    3x3 conv instead of Tanh."""

    img_size: int = 224
    z_space: int = 0  # 0 → input is already a [B, s, s, 768] map
    linear_end: bool = False
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd, pd = self.dtypes.compute_dtype, self.dtypes.param_dtype
        s = math.ceil(self.img_size / 32)
        if self.z_space != 0:
            x = nn.Dense(2 * self.z_space, dtype=cd, param_dtype=pd,
                         name="fc1")(x.astype(cd))
            x = nn.relu(x)
            x = nn.Dense(768 * s * s, dtype=cd, param_dtype=pd, name="fc2")(x)
            x = nn.relu(x)
            x = x.reshape(x.shape[0], s, s, 768)
        x = x.astype(cd)
        for i, ch in enumerate(DECODER_CHANNELS):
            # torch ConvTranspose2d(3, s2, p1, op1) ≡ ((1,2),(1,2)) here
            x = nn.ConvTranspose(
                ch, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)),
                dtype=cd, param_dtype=pd, name=f"recon_conv{i + 1}",
            )(x)
            x = FusedBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtypes=self.dtypes,
                name=f"bn{i + 1}",
            )(x).astype(cd)
            if i < len(DECODER_CHANNELS) - 1:
                x = nn.relu(x)
        if self.linear_end:
            x = nn.relu(x)
            return nn.Conv(3, (3, 3), padding="SAME", dtype=cd,
                           param_dtype=pd, name="linear_end")(x)
        return jnp.tanh(x)  # [B, 32s, 32s, 3] in [-1, 1]


class ResNetDecoder(nn.Module):
    """Variable-embedding ResNet-style decoder for transformer latents."""

    embedding_size: int
    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, z: Array, train: bool = False) -> Array:
        cd, pd = self.dtypes.compute_dtype, self.dtypes.param_dtype
        x = nn.Dense(2 * self.embedding_size, dtype=cd, param_dtype=pd,
                     name="fc1")(z.astype(cd))
        x = nn.relu(x)
        x = nn.Dense(2048, dtype=cd, param_dtype=pd, name="fc2")(x)
        x = nn.relu(x)
        x = ReverseResNetTrunk(
            img_size=self.img_size, dtypes=self.dtypes, name="trunk"
        )(x, train=train)
        x = _upsample_nearest(x, self.img_size // 2)
        x = nn.ConvTranspose(
            3, (7, 7), strides=(2, 2), padding=((3, 4), (3, 4)),
            use_bias=False, dtype=cd, param_dtype=pd, name="de_conv1",
        )(x)
        x = FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtypes=self.dtypes, name="bn1",
        )(x).astype(cd)
        return jnp.tanh(x)
