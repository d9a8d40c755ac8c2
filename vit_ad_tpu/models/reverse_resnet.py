"""Mirror-image ResNet decoder.

Parity with reference ReverseResNet (reference
src/classes/resnet/ReverseResNet.py:106-252): transposed-conv bottlenecks in
stage layout [3, 6, 4, 3], walking 2048→1024→512→256→64 channels while
upsampling 1→(img/32)→...→img/4, then a final 7x7 stride-2 transposed conv to
3 channels with Tanh.

Deviations (documented):
  * MaxUnpool2d-with-indices (ReverseResNet.py:218-232) is replaced by nearest
    upsampling — index scatter defeats TPU tiling, and the reference itself
    uses this substitution in DecoderResNetVariableEmbeddingSize
    (CnnDecoder.py:158-196).
  * `img_size` is a parameter instead of the reference's hardcoded 224.

Transposed convs use the torch-exact padding: ConvTranspose2d(k, s,
padding=p, output_padding=op) ≡ flax ConvTranspose(k, s, padding=
((p, p+op), (p, p+op))) with the kernel transposed to [kh, kw, in, out] and
spatially flipped (verified to 4e-6; utils/torch_convert._convt) — so
reference-trained decoder weights convert bit-faithfully.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import FusedBatchNorm

Array = jax.Array

LAYERS = (3, 6, 4, 3)  # reference ReverseResNet layers (ReverseResNet.py:115)


def _upsample_nearest(x: Array, size: int) -> Array:
    b, h, w, c = x.shape
    if h == size:
        return x
    if size % h == 0:
        r = size // h
        return jnp.repeat(jnp.repeat(x, r, axis=1), r, axis=2)
    return jax.image.resize(x, (b, size, size, c), method="nearest")


class ReverseBottleneck(nn.Module):
    """Transposed bottleneck: 1x1 (4p→p) → 3x3 convT (stride) → 1x1 (p→out)."""

    planes: int
    out_channels: int
    stride: int = 1
    upsample_identity: bool = False
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
        out = nn.ConvTranspose(self.planes, (1, 1), dtype=cd, param_dtype=pd,
                               use_bias=False, name="conv3")(x)
        out = nn.relu(bn("bn3")(out).astype(cd))
        # torch conv3x3(stride, p=1, op=stride-1): ((1,2)) when upsampling,
        # symmetric ((1,1)) at stride 1 (reference ReverseResNet.py:10-29)
        pad2 = ((1, self.stride), (1, self.stride))
        out = nn.ConvTranspose(
            self.planes, (3, 3), strides=(self.stride,) * 2, padding=pad2,
            dtype=cd, param_dtype=pd, use_bias=False, name="conv2",
        )(out)
        out = nn.relu(bn("bn2")(out).astype(cd))
        out = nn.ConvTranspose(self.out_channels, (1, 1), dtype=cd,
                               param_dtype=pd, use_bias=False, name="conv1")(out)
        out = bn("bn1")(out).astype(cd)
        if self.upsample_identity:
            # torch conv1x1(stride, p=0, op=stride-1) → ((0, stride-1))
            identity = nn.ConvTranspose(
                self.out_channels, (1, 1), strides=(self.stride,) * 2,
                padding=((0, self.stride - 1),) * 2, dtype=cd, param_dtype=pd,
                use_bias=False, name="upsample_conv",
            )(x)
            identity = bn("upsample_bn")(identity).astype(cd)
        return nn.relu(out + identity)


class ReverseResNet(nn.Module):
    """2048×1×1 (or 2048 vector) → [img, img, 3] reconstruction in [-1, 1]."""

    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd, pd = self.dtypes.compute_dtype, self.dtypes.param_dtype
        if x.ndim == 2:
            x = x[:, None, None, :]
        x = x.astype(cd)
        # upsample1: 1x1 → (img/32)x(img/32) (reference :136 — size 7 at 224px)
        x = _upsample_nearest(x, self.img_size // 32)

        # (planes, out_channels, stride): layer4..layer1 mirroring the encoder
        specs = [
            (512, 2048, 1024, LAYERS[3], 2),
            (256, 1024, 512, LAYERS[2], 2),
            (128, 512, 256, LAYERS[1], 2),
            (64, 256, 64, LAYERS[0], 1),
        ]
        for li, (planes, in_ch, out_ch, blocks, stride) in enumerate(specs):
            for bi in range(blocks - 1):
                x = ReverseBottleneck(
                    planes=planes, out_channels=in_ch, stride=1,
                    dtypes=self.dtypes, name=f"layer{4 - li}_{bi}",
                )(x, train=train)
            # last block changes channels (and resolution when stride=2)
            x = ReverseBottleneck(
                planes=planes, out_channels=out_ch, stride=stride,
                upsample_identity=True, dtypes=self.dtypes,
                name=f"layer{4 - li}_{blocks - 1}",
            )(x, train=train)

        # unpool-equivalent: img/4 → img/2 (reference uses MaxUnpool2d, :218)
        x = _upsample_nearest(x, self.img_size // 2)
        # torch de_conv1: k7 s2 p3 op1 (reference :128-130) → ((3,4),(3,4))
        x = nn.ConvTranspose(
            3, (7, 7), strides=(2, 2), padding=((3, 4), (3, 4)),
            use_bias=False, dtype=cd, param_dtype=pd, name="de_conv1",
        )(x)
        x = FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtypes=self.dtypes, name="bn1",
        )(x).astype(cd)
        return jnp.tanh(x)


class ReverseResNetTrunk(nn.Module):
    """The cnns-only path (reference _forward_cnns_only, ReverseResNet.py:234-242):
    2048×1×1 → [img/4, img/4, 64], for DecoderResNetVariableEmbeddingSize."""

    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if x.ndim == 2:
            x = x[:, None, None, :]
        x = x.astype(self.dtypes.compute_dtype)
        x = _upsample_nearest(x, self.img_size // 32)
        specs = [
            (512, 2048, 1024, LAYERS[3], 2),
            (256, 1024, 512, LAYERS[2], 2),
            (128, 512, 256, LAYERS[1], 2),
            (64, 256, 64, LAYERS[0], 1),
        ]
        for li, (planes, in_ch, out_ch, blocks, stride) in enumerate(specs):
            for bi in range(blocks - 1):
                x = ReverseBottleneck(
                    planes=planes, out_channels=in_ch, stride=1,
                    dtypes=self.dtypes, name=f"layer{4 - li}_{bi}",
                )(x, train=train)
            x = ReverseBottleneck(
                planes=planes, out_channels=out_ch, stride=stride,
                upsample_identity=True, dtypes=self.dtypes,
                name=f"layer{4 - li}_{blocks - 1}",
            )(x, train=train)
        return x
