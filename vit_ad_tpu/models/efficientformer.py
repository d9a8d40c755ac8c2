"""EfficientFormer-L3 backbone.

Capability parity with reference EncoderEfficientFormer (reference
src/classes/transformer/TransformerEncoder.py:81-113), which wraps timm
`efficientformer_l3`: conv stem (two 3x3/s2 convs with BN), four stages with
dims (64, 128, 320, 512) and depths (4, 4, 12, 6); stages are "4D"
MetaFormer blocks (avg-pool token mixer + two 1x1-conv MLP with BN) except
the last `vit_num=4` blocks of stage 4, which flatten to tokens and run "3D"
pre-LN attention blocks. Output: [B, 49, 512] tokens at /32 with avg-pool
latent (reference :103-113).

All mixers are convolutions/pools — pure XLA-fusible NHWC ops.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import (
    FusedBatchNorm,
    LayerNorm,
    Mlp,
    resolve_gelu_approx,
)
from vit_ad_tpu.models.outputs import EncoderOutput

Array = jax.Array


class ConvBN(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel,) * 2,
                    strides=(self.stride,) * 2,
                    padding=((pad, pad), (pad, pad)),
                    dtype=self.dtypes.compute_dtype,
                    param_dtype=self.dtypes.param_dtype, name="conv")(x)
        return FusedBatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtypes=self.dtypes, name="bn",
        )(x).astype(self.dtypes.compute_dtype)


class Meta4D(nn.Module):
    """Pool token mixer + conv-MLP (the "4D" EfficientFormer block)."""

    dim: int
    mlp_ratio: float = 4.0
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        # layer-scaled residuals (EfficientFormer uses layer_scale init 1e-5)
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-5),
                         (self.dim,), self.dtypes.param_dtype)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-5),
                         (self.dim,), self.dtypes.param_dtype)
        # token mixer: avg_pool(3x3, s1) - identity
        pooled = nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                             count_include_pad=False)
        x = x + ls1.astype(x.dtype) * (pooled - x)
        h = int(self.dim * self.mlp_ratio)
        y = ConvBN(h, kernel=1, dtypes=self.dtypes, name="mlp_fc1")(x, train)
        # policy GELU (layers.resolve_gelu_approx): these 4x-wide stage maps
        # total ~1.0B activations/batch-128 — exact erf is ~10 ms of VPU
        y = nn.gelu(y, approximate=resolve_gelu_approx(self.dtypes))
        y = ConvBN(self.dim, kernel=1, dtypes=self.dtypes, name="mlp_fc2")(y, train)
        return x + ls2.astype(x.dtype) * y


def _abs_rel_pos_index(resolution: int) -> "np.ndarray":
    """[N, N] indices into the (resolution²)-entry attention-bias table:
    idx = |dy| * resolution + |dx| (timm efficientformer.Attention — LeViT
    -style absolute-offset biases)."""
    import numpy as np

    pos = np.stack(
        np.meshgrid(np.arange(resolution), np.arange(resolution), indexing="ij")
    ).reshape(2, -1)
    rel = np.abs(pos[:, :, None] - pos[:, None, :])
    return (rel[0] * resolution + rel[1]).astype(np.int32)


class Meta3D(nn.Module):
    """Pre-LN attention block over flattened tokens (the "3D" block).

    Faithful to timm `efficientformer_l3`'s Attention so pretrained weights
    convert exactly: asymmetric qkv (q,k get key_dim=32 per head, v gets
    attn_ratio*key_dim=128), learned per-head attention biases indexed by
    absolute relative offset, proj from the v width back to dim."""

    dim: int
    num_heads: int = 8
    key_dim: int = 32
    attn_ratio: int = 4
    mlp_ratio: float = 4.0
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, c = x.shape
        resolution = int(round(n ** 0.5))
        heads, kd = self.num_heads, self.key_dim
        d = self.attn_ratio * kd  # per-head v width
        ls1 = self.param("layer_scale_1", nn.initializers.constant(1e-5),
                         (c,), self.dtypes.param_dtype)
        ls2 = self.param("layer_scale_2", nn.initializers.constant(1e-5),
                         (c,), self.dtypes.param_dtype)
        biases = self.param(
            "attention_biases", nn.initializers.zeros,
            (heads, resolution * resolution), self.dtypes.param_dtype,
        )
        y = LayerNorm(dtypes=self.dtypes, name="norm1")(x)
        qkv = nn.Dense(heads * (2 * kd + d), dtype=self.dtypes.compute_dtype,
                       param_dtype=self.dtypes.param_dtype, name="qkv")(y)
        qkv = qkv.reshape(b, n, heads, 2 * kd + d)
        q, k, v = qkv[..., :kd], qkv[..., kd:2 * kd], qkv[..., 2 * kd:]
        scale = kd ** -0.5
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                          preferred_element_type=self.dtypes.accum_dtype)
        idx = _abs_rel_pos_index(resolution)
        attn = attn.astype(self.dtypes.accum_dtype) + biases.astype(
            self.dtypes.accum_dtype
        )[:, idx]
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bhnm,bmhd->bnhd", attn.astype(self.dtypes.compute_dtype), v
        ).reshape(b, n, heads * d)
        x = x + ls1.astype(x.dtype) * nn.Dense(
            c, dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="proj",
        )(out)
        y = LayerNorm(dtypes=self.dtypes, name="norm2")(x)
        return x + ls2.astype(x.dtype) * Mlp(
            hidden_dim=int(c * self.mlp_ratio), dtypes=self.dtypes, name="mlp"
        )(y)


class EfficientFormer(nn.Module):
    img_size: int = 224
    dims: Sequence[int] = (64, 128, 320, 512)
    depths: Sequence[int] = (4, 4, 12, 6)
    vit_num: int = 4
    num_heads: int = 8
    key_dim: int = 32
    attn_ratio: int = 4
    dtypes: DtypePolicy = DtypePolicy()

    @property
    def embed_dim(self) -> int:
        return self.dims[-1]

    @property
    def num_patches(self) -> int:
        return (self.img_size // 32) ** 2

    @nn.compact
    def __call__(
        self, x: Array, block_index: int = 0, train: bool = False
    ) -> EncoderOutput:
        b = x.shape[0]
        x = x.astype(self.dtypes.compute_dtype)
        gelu_approx = resolve_gelu_approx(self.dtypes)
        # stem: two 3x3/s2 ConvBN + GELU → /4
        x = nn.gelu(ConvBN(self.dims[0] // 2, stride=2, dtypes=self.dtypes,
                           name="stem1")(x, train), approximate=gelu_approx)
        x = nn.gelu(ConvBN(self.dims[0], stride=2, dtypes=self.dtypes,
                           name="stem2")(x, train), approximate=gelu_approx)

        for si, (dim, depth) in enumerate(zip(self.dims, self.depths)):
            if si > 0:
                # downsample: 3x3/s2 ConvBN
                x = ConvBN(dim, stride=2, dtypes=self.dtypes,
                           name=f"downsample{si}")(x, train)
            n_3d = self.vit_num if si == len(self.dims) - 1 else 0
            for bi in range(depth - n_3d):
                x = Meta4D(dim=dim, dtypes=self.dtypes,
                           name=f"stage{si}_block{bi}")(x, train)
            if n_3d:
                _, h, w, c = x.shape
                tokens = x.reshape(b, h * w, c)
                for bi in range(depth - n_3d, depth):
                    tokens = Meta3D(dim=dim, num_heads=self.num_heads,
                                    key_dim=self.key_dim,
                                    attn_ratio=self.attn_ratio,
                                    dtypes=self.dtypes,
                                    name=f"stage{si}_block{bi}")(tokens)
                x = tokens.reshape(b, h, w, c)

        tokens = x.reshape(b, -1, self.dims[-1])
        # final LayerNorm: timm's forward_features applies self.norm before
        # returning (the reference consumes forward_features output,
        # src/classes/transformer/TransformerEncoder.py:108-113)
        tokens = LayerNorm(dtypes=self.dtypes, name="norm")(tokens)
        return EncoderOutput(
            patch_embedding=tokens, latent=jnp.mean(tokens, axis=1)
        )


def efficientformer_l3(
    img_size: int = 224, dtypes: DtypePolicy = DtypePolicy()
) -> EfficientFormer:
    return EfficientFormer(img_size=img_size, dtypes=dtypes)
