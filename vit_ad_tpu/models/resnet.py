"""ResNet-50 encoder with FastFlow-style trainable per-stage LayerNorms.

Parity with reference ResNetEncoder / ResNetModel (reference
src/classes/CnnEncoder.py:129-169, src/classes/resnet/ResNetModel.py):
standard bottleneck-v1.5 ResNet-50 (stage channels 256/512/1024/2048 at
scales 4/8/16/32), frozen in training; a trainable LayerNorm over each full
stage map [H/s, W/s, C] with per-element affine (torch
LayerNorm([C, H/s, W/s]) equivalent, CnnEncoder.py:150-158).

The reference's maxpool returns unpool indices for its decoder
(ResNetModel.py:140-142); scatter-style unpooling is hostile to TPU tiling,
so the decoder side uses nearest upsampling instead (see reverse_resnet.py) —
the substitution the reference itself uses in
DecoderResNetVariableEmbeddingSize. No indices are produced here.

Module names mirror torchvision's state-dict layout (conv1, bn1,
layer{1-4}.{i}.conv{1-3}/bn{1-3}/downsample) so the torch→JAX converter is a
pure name map.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import FusedBatchNorm
from vit_ad_tpu.models.outputs import EncoderOutput

Array = jax.Array

STAGE_CHANNELS = (256, 512, 1024, 2048)
STAGE_SCALES = (4, 8, 16, 32)
LAYERS = (3, 4, 6, 3)


class Bottleneck(nn.Module):
    """torchvision bottleneck v1.5: 1x1 → 3x3(stride) → 1x1(4x), residual."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd, pd = self.dtypes.compute_dtype, self.dtypes.param_dtype

        def bn(name):
            return FusedBatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtypes=self.dtypes, name=name,
            )

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=cd,
                      param_dtype=pd, name="conv1")(x)
        out = nn.relu(bn("bn1")(out).astype(cd))
        # explicit (1,1) padding: torch pads symmetrically; flax SAME would
        # pad (0,1) for stride 2 and misalign the windows
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=cd,
                      param_dtype=pd, name="conv2")(out)
        out = nn.relu(bn("bn2")(out).astype(cd))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=cd,
                      param_dtype=pd, name="conv3")(out)
        out = bn("bn3")(out).astype(cd)
        if self.downsample:
            identity = nn.Conv(
                self.planes * 4, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, dtype=cd, param_dtype=pd, name="downsample_conv",
            )(x)
            identity = bn("downsample_bn")(identity).astype(cd)
        return nn.relu(out + identity)


class ResNet50(nn.Module):
    """Backbone trunk; `stage_features` returns the four stage maps."""

    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> List[Array]:
        cd, pd = self.dtypes.compute_dtype, self.dtypes.param_dtype
        x = x.astype(cd)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=cd, param_dtype=pd, name="conv1")(x)
        x = FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtypes=self.dtypes, name="bn1",
        )(x).astype(cd)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        stages = []
        for li, (blocks, planes) in enumerate(zip(LAYERS, (64, 128, 256, 512))):
            for bi in range(blocks):
                stride = 2 if (bi == 0 and li > 0) else 1
                x = Bottleneck(
                    planes=planes,
                    stride=stride,
                    downsample=(bi == 0),
                    dtypes=self.dtypes,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)
            stages.append(x)
        return stages


def _stage_layer_norm(x: Array, scale: Array, bias: Array, eps: float = 1e-5,
                      out_dtype=jnp.float32) -> Array:
    """LayerNorm over the whole [H, W, C] map with per-element affine —
    the NHWC equivalent of torch LayerNorm([C, H, W])
    (reference CnnEncoder.py:150-158)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale + bias).astype(out_dtype)


class ResNetEncoder(nn.Module):
    """Reference ResNetEncoder parity: frozen trunk + trainable stage norms.

    __call__ returns EncoderOutput with latent = global-avg-pooled stage-4
    (the torch avgpool 2048-vector, ResNetModel.py:210-225) and
    patch_embedding = stage-4 map flattened to [B, P, 2048].
    `stage_features` returns the four LayerNorm'd maps (CnnEncoder.py:160-169,
    separate_layer=True path)."""

    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        self.trunk = ResNet50(dtypes=self.dtypes)
        # Stage-norm affine params declared here (static shapes from img_size)
        # so they exist regardless of which method is traced at init.
        self.norm_scales = [
            self.param(
                f"norm{i}_scale", nn.initializers.ones,
                (self.img_size // s, self.img_size // s, c),
                self.dtypes.param_dtype,
            )
            for i, (c, s) in enumerate(zip(STAGE_CHANNELS, STAGE_SCALES))
        ]
        self.norm_biases = [
            self.param(
                f"norm{i}_bias", nn.initializers.zeros,
                (self.img_size // s, self.img_size // s, c),
                self.dtypes.param_dtype,
            )
            for i, (c, s) in enumerate(zip(STAGE_CHANNELS, STAGE_SCALES))
        ]

    @property
    def embed_dim(self) -> int:
        return STAGE_CHANNELS[-1]

    def __call__(self, x: Array, block_index: int = 0, train: bool = False) -> EncoderOutput:
        stages = self.trunk(x, train=train)
        final = stages[-1]
        b, h, w, c = final.shape
        latent = jnp.mean(final, axis=(1, 2))
        return EncoderOutput(
            patch_embedding=final.reshape(b, h * w, c), latent=latent
        )

    def stage_features(self, x: Array, train: bool = False) -> List[Array]:
        stages = self.trunk(x, train=train)
        return [
            _stage_layer_norm(s, sc, b, out_dtype=self.dtypes.compute_dtype)
            for s, sc, b in zip(stages, self.norm_scales, self.norm_biases)
        ]
