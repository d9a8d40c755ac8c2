"""EfficientNet-style CNN encoder.

Capability parity with reference EfficientNetEncoder (reference
src/classes/CnnEncoder.py:106-126), which wraps NVIDIA's torch-hub
`efficientnet_widese_b4` as a frozen feature extractor returning the last
feature map ("currently not in use" per the reference docstring). This is a
standard EfficientNet trunk (MBConv inverted-bottleneck blocks with
squeeze-excite, swish activations) at B4 width/depth scaling, NHWC.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import FusedBatchNorm
from vit_ad_tpu.models.outputs import EncoderOutput

Array = jax.Array


def _swish(x: Array) -> Array:
    """SiLU, or its piecewise hard approximation under
    VITAD_EFFNET_HARDSWISH=1 — a MEASUREMENT A/B gate, not a parity mode:
    EfficientNet-B4 runs at 26% of its tile bound (PERF.md) and its maps
    carry SiLU/sigmoid transcendentals over every expansion channel (the
    same VPU cost class the shared GELU policy removed elsewhere at
    +32..150%). The gate quantifies that term on hardware; exact SiLU (the
    reference's torch-hub semantics, CnnEncoder.py:106-126) stays the
    default."""
    import os

    if os.environ.get("VITAD_EFFNET_HARDSWISH") == "1":
        return x * jax.nn.relu6(x + 3.0) * (1.0 / 6.0)
    return nn.swish(x)


def _se_sigmoid(x: Array) -> Array:
    """Sigmoid for the squeeze-excite gate (hard variant under the same
    measurement gate as `_swish`)."""
    import os

    if os.environ.get("VITAD_EFFNET_HARDSWISH") == "1":
        return jax.nn.relu6(x + 3.0) * (1.0 / 6.0)
    return jax.nn.sigmoid(x)

# (expand_ratio, channels, repeats, stride, kernel) — EfficientNet-B0 base
_B0_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)
# B4 scaling
_WIDTH, _DEPTH = 1.4, 1.8


def _round_channels(c: float, divisor: int = 8) -> int:
    c *= _WIDTH
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return new_c


def _round_repeats(r: int) -> int:
    return int(math.ceil(_DEPTH * r))


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel,) * 2, strides=(self.stride,) * 2,
            padding=((pad, pad), (pad, pad)), feature_group_count=self.groups,
            use_bias=False, dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="conv",
        )(x)
        x = FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtypes=self.dtypes,
            name="bn",
        )(x).astype(self.dtypes.compute_dtype)
        return _swish(x) if self.act else x


class MBConv(nn.Module):
    in_ch: int
    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    widese: bool = True
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        cd = self.dtypes.compute_dtype
        identity = x
        h = x
        mid = self.in_ch * self.expand
        if self.expand != 1:
            h = ConvBNAct(mid, kernel=1, dtypes=self.dtypes, name="expand")(h, train)
        h = ConvBNAct(
            mid, kernel=self.kernel, stride=self.stride, groups=mid,
            dtypes=self.dtypes, name="depthwise",
        )(h, train)
        # squeeze-excite; "widese" sizes the squeeze from the EXPANDED width
        # (NVIDIA's efficientnet_widese variants — the reference loads
        # nvidia_efficientnet_widese_b4, src/classes/CnnEncoder.py:110-120)
        se_base = mid if self.widese else self.in_ch
        se_ch = max(1, int(se_base * self.se_ratio))
        s = jnp.mean(h, axis=(1, 2), keepdims=True)
        s = nn.Conv(se_ch, (1, 1), dtype=cd, param_dtype=self.dtypes.param_dtype,
                    name="se_reduce")(s)
        s = _swish(s)
        s = nn.Conv(mid, (1, 1), dtype=cd, param_dtype=self.dtypes.param_dtype,
                    name="se_expand")(s)
        h = h * _se_sigmoid(s)
        h = ConvBNAct(self.out_ch, kernel=1, act=False, dtypes=self.dtypes,
                      name="project")(h, train)
        if self.stride == 1 and self.in_ch == self.out_ch:
            h = h + identity
        return h


class EfficientNetEncoder(nn.Module):
    """B4-scaled EfficientNet feature trunk; returns the last feature map
    tokens + pooled latent."""

    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    @property
    def embed_dim(self) -> int:
        return _round_channels(1280)  # B4 head conv channels (1792)

    @property
    def num_patches(self) -> int:
        return (self.img_size // 32) ** 2  # stem /2 x stage strides = /32

    @nn.compact
    def __call__(
        self, x: Array, block_index: int = 0, train: bool = False
    ) -> EncoderOutput:
        b = x.shape[0]
        x = x.astype(self.dtypes.compute_dtype)
        stem = _round_channels(32)
        x = ConvBNAct(stem, stride=2, dtypes=self.dtypes, name="stem")(x, train)
        in_ch = stem
        bi = 0
        for expand, ch, reps, stride, kernel in _B0_BLOCKS:
            out_ch = _round_channels(ch)
            for r in range(_round_repeats(reps)):
                x = MBConv(
                    in_ch=in_ch, out_ch=out_ch, expand=expand, kernel=kernel,
                    stride=stride if r == 0 else 1, dtypes=self.dtypes,
                    name=f"block{bi}",
                )(x, train)
                in_ch = out_ch
                bi += 1
        head = _round_channels(1280)
        x = ConvBNAct(head, kernel=1, dtypes=self.dtypes, name="head")(x, train)
        tokens = x.reshape(b, -1, x.shape[-1])
        return EncoderOutput(
            patch_embedding=tokens, latent=jnp.mean(tokens, axis=1)
        )
