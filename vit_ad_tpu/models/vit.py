"""ViT / DeiT encoders.

Capability parity with reference EncoderDeit / EncoderVit
(reference src/classes/transformer/TransformerEncoder.py:116-208):

  * DeiT-base distilled patch16 224 — 2 prefix tokens (cls + dist); forward
    strips both; latent = cls token (reference :168-172).
  * ViT-base patch16 224 — 1 prefix token; latent = cls token (ref :204-207).
  * Truncated forward at `block_index` with the trained final LayerNorm
    re-applied after EVERY block — the FastFlow trick (reference :149-163).

TPU-native structure: the `depth` identical blocks are stored as STACKED
parameters ([depth, ...] leading axis) and executed with `jax.lax.scan` —
one block body is compiled once instead of unrolled 12x. This keeps the HLO
small (the axon remote-compile endpoint rejects oversized programs) and
compile times flat, with identical math. Attention softmax runs in f32.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import PatchEmbed, resolve_gelu_approx
from vit_ad_tpu.models.outputs import EncoderOutput

Array = jax.Array


def _layer_norm(x: Array, scale: Array, bias: Array, eps: float = 1e-6) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return y * scale + bias


def _use_pallas_attention() -> bool:
    """Trace-time choice, same policy as the Swin window kernel: fused Pallas
    attention on TPU targets unless VITAD_PALLAS_VIT_ATTN=0 (or =1 to force).

    The Pallas forward carries a custom VJP that recomputes the backward
    through the XLA reference core, so gradients through the encoder work
    (e.g. recon with cache_frozen_features=False)."""
    import os

    flag = os.environ.get("VITAD_PALLAS_VIT_ATTN")
    if flag in ("0", "1"):
        return flag == "1"
    from vit_ad_tpu.ops.pallas.window_attention import _target_platform

    return _target_platform() == "tpu"


def _ln_fold() -> bool:
    """VITAD_VIT_LN_FOLD=1: fold the block LNs into the qkv/fc1 GEMMs (the
    per-token rsqrt scalar commutes with the channel contraction — see
    models/swin._ln_fold_gemm, the shared implementation). A/B lever for
    the flagship's LN traffic."""
    import os

    return os.environ.get("VITAD_VIT_LN_FOLD") == "1"


def _block_apply(
    x: Array, p: Dict[str, Array], num_heads: int, compute_dtype, accum_dtype,
    gelu_approx: bool = False,
) -> Array:
    """One pre-LN transformer block with params p (unstacked leaves)."""
    b, n, d = x.shape
    hd = d // num_heads

    if _ln_fold():
        from vit_ad_tpu.models.layers import _ln_fold_gemm

        qkv = _ln_fold_gemm(
            x, p["norm1_scale"], p["norm1_bias"],
            p["qkv_kernel"], p["qkv_bias"], compute_dtype, eps=1e-6,
        )  # [B, N, 3*D] packed, norm1 riding the GEMM
    else:
        y = _layer_norm(x, p["norm1_scale"], p["norm1_bias"]).astype(
            compute_dtype
        )
        qkv = jnp.einsum(
            "bnd,de->bne", y, p["qkv_kernel"].astype(compute_dtype)
        )
        qkv = qkv + p["qkv_bias"].astype(compute_dtype)  # [B, N, 3*D] packed
    if _use_pallas_attention():
        from vit_ad_tpu.ops.pallas.window_attention import vit_attention_qkv

        # packed path: q/k/v slicing happens inside the kernel's VMEM block —
        # host-level slices of [B,N,3,H,hd] materialize three strided copies
        # (profiled ~0.5 ms/block at batch 128 on v5e)
        out = vit_attention_qkv(qkv, num_heads).astype(compute_dtype)
    else:
        qkv = qkv.reshape(b, n, 3, num_heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q * (hd**-0.5), k,
            preferred_element_type=accum_dtype,
        )
        attn = jax.nn.softmax(attn.astype(accum_dtype), axis=-1).astype(
            compute_dtype
        )
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
    out = (
        jnp.einsum("bnd,de->bne", out, p["proj_kernel"].astype(compute_dtype))
        + p["proj_bias"].astype(compute_dtype)
    )
    x = x + out

    from vit_ad_tpu.ops.pallas.mlp import mlp_block, use_pallas_mlp

    if gelu_approx and use_pallas_mlp(d, p["fc1_kernel"].shape[-1]):
        # fused LN+fc1+gelu+fc2+residual: the [B,N,4D] gelu intermediate and
        # the LN output never touch HBM (ops/pallas/mlp.py)
        return mlp_block(
            x, p["norm2_scale"], p["norm2_bias"],
            p["fc1_kernel"].astype(compute_dtype),
            p["fc1_bias"],
            p["fc2_kernel"].astype(compute_dtype),
            p["fc2_bias"],
        )
    if _ln_fold():
        from vit_ad_tpu.models.layers import _ln_fold_gemm

        h = _ln_fold_gemm(
            x, p["norm2_scale"], p["norm2_bias"],
            p["fc1_kernel"], p["fc1_bias"], compute_dtype, eps=1e-6,
        )
        h = nn.gelu(h, approximate=gelu_approx)
    else:
        y = _layer_norm(x, p["norm2_scale"], p["norm2_bias"]).astype(
            compute_dtype
        )
        h = jnp.einsum("bnd,de->bne", y, p["fc1_kernel"].astype(compute_dtype))
        h = nn.gelu(
            h + p["fc1_bias"].astype(compute_dtype), approximate=gelu_approx
        )
    h = (
        jnp.einsum("bnh,hd->bnd", h, p["fc2_kernel"].astype(compute_dtype))
        + p["fc2_bias"].astype(compute_dtype)
    )
    return x + h


class ViTEncoder(nn.Module):
    """Monolithic pre-LN vision transformer (ViT/DeiT family), scan-stacked."""

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_prefix_tokens: int = 1
    dtypes: DtypePolicy = DtypePolicy()
    # lax.scan unroll factor for the block stack. 1 = compact HLO (fast
    # compiles, small remote-compile payload); depth = fully unrolled, which
    # removes the per-iteration parameter-slice copies the while loop incurs
    # (profiled ~6 ms/batch-128 on v5e) at the cost of a bigger program.
    scan_unroll: int = 1
    # GELU flavor. None (default) resolves to the tanh approximation when
    # compute_dtype is bfloat16 and exact erf otherwise: under bf16 the
    # tanh-vs-erf deviation (<=4e-3 on anomaly scores, measured) is the same
    # order as bf16 rounding itself, while exact erf costs ~9 ms/batch-128 of
    # VPU transcendentals on v5e (~15% of the whole DeiT-base forward).
    # f32 paths (torch bit-parity tests, converters) keep exact erf.
    gelu_tanh: Optional[bool] = None

    @property
    def num_patches(self) -> int:
        return (self.img_size // self.patch_size) ** 2

    def _stacked_block_params(self) -> Dict[str, Array]:
        d = self.embed_dim
        h = int(d * self.mlp_ratio)
        L = self.depth
        pdt = self.dtypes.param_dtype
        trunc = nn.initializers.truncated_normal(0.02)

        def stacked(init, shape):
            # per-layer init applied across the stacked leading axis
            def f(key, s, dtype):
                keys = jax.random.split(key, L)
                return jnp.stack([init(k, s[1:], dtype) for k in keys])

            return f

        mk = lambda name, init, shape: self.param(name, stacked(init, shape), (L, *shape[1:]), pdt)
        ones = nn.initializers.ones
        zeros = nn.initializers.zeros
        xavier = nn.initializers.xavier_uniform()
        return {
            "norm1_scale": mk("norm1_scale", ones, (L, d)),
            "norm1_bias": mk("norm1_bias", zeros, (L, d)),
            "qkv_kernel": mk("qkv_kernel", xavier, (L, d, 3 * d)),
            "qkv_bias": mk("qkv_bias", zeros, (L, 3 * d)),
            "proj_kernel": mk("proj_kernel", xavier, (L, d, d)),
            "proj_bias": mk("proj_bias", zeros, (L, d)),
            "norm2_scale": mk("norm2_scale", ones, (L, d)),
            "norm2_bias": mk("norm2_bias", zeros, (L, d)),
            "fc1_kernel": mk("fc1_kernel", xavier, (L, d, h)),
            "fc1_bias": mk("fc1_bias", zeros, (L, h)),
            "fc2_kernel": mk("fc2_kernel", xavier, (L, h, d)),
            "fc2_bias": mk("fc2_bias", zeros, (L, d)),
        }

    @nn.compact
    def __call__(self, x: Array, block_index: int = 0) -> EncoderOutput:
        b = x.shape[0]
        cd = self.dtypes.compute_dtype
        x = x.astype(cd)
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
                ).astype(cd),
                tokens,
            ],
            axis=1,
        )
        tokens = tokens + pos_embed.astype(cd)

        blocks = self._stacked_block_params()
        # Pre-cast the matmul weights/biases to compute dtype OUTSIDE the
        # block scan: inside the scan body the f32->bf16 cast of every
        # sliced leaf re-runs per iteration (XLA cannot hoist it), costing
        # a full f32 read of ~7M params per block. Norm params stay f32
        # (their math runs in f32).
        blocks = {
            k: (v if k.startswith("norm") else v.astype(cd))
            for k, v in blocks.items()
        }
        norm_scale = self.param(
            "norm_scale", nn.initializers.ones, (self.embed_dim,),
            self.dtypes.param_dtype,
        )
        norm_bias = self.param(
            "norm_bias", nn.initializers.zeros, (self.embed_dim,),
            self.dtypes.param_dtype,
        )
        num_heads, accum = self.num_heads, self.dtypes.accum_dtype
        # VITAD_EXACT_GELU=1 pins exact erf even under bf16 so score shifts
        # stay attributable when comparing against torch/timm references
        # (documented perf tradeoff: ~9 ms/batch-128 of VPU transcendentals
        # on v5e; see README "Numerics" and layers.resolve_gelu_approx —
        # the shared policy every backbone follows).
        gelu_approx = resolve_gelu_approx(self.dtypes, self.gelu_tanh)

        if block_index != 0:
            # FastFlow truncation: final norm after every block
            # (reference TransformerEncoder.py:159-163). block_index is
            # static; scan over the first block_index+1 stacked slices.
            sliced = jax.tree.map(lambda a: a[: block_index + 1], blocks)

            def body_trunc(carry, p):
                y = _block_apply(carry, p, num_heads, cd, accum, gelu_approx)
                y = _layer_norm(y, norm_scale, norm_bias).astype(cd)
                return y, None

            tokens, _ = jax.lax.scan(
                body_trunc, tokens, sliced, unroll=self.scan_unroll
            )
        else:
            def body(carry, p):
                return _block_apply(carry, p, num_heads, cd, accum, gelu_approx), None

            tokens, _ = jax.lax.scan(
                body, tokens, blocks, unroll=self.scan_unroll
            )
            tokens = _layer_norm(tokens, norm_scale, norm_bias).astype(cd)

        patch_embedding = tokens[:, self.num_prefix_tokens :, :]
        latent = tokens[:, 0, :]  # cls token (reference :169, :206)
        return EncoderOutput(patch_embedding=patch_embedding, latent=latent)


def deit_base_distilled_patch16(img_size: int = 224, dtypes: DtypePolicy = DtypePolicy()) -> ViTEncoder:
    """DeiT-base distilled /16 — reference EncoderDeit (TransformerEncoder.py:116)."""
    return ViTEncoder(
        img_size=img_size, patch_size=16, embed_dim=768, depth=12,
        num_heads=12, num_prefix_tokens=2, dtypes=dtypes,
    )


def vit_base_patch16(img_size: int = 224, dtypes: DtypePolicy = DtypePolicy()) -> ViTEncoder:
    """ViT-base /16 — reference EncoderVit (TransformerEncoder.py:176)."""
    return ViTEncoder(
        img_size=img_size, patch_size=16, embed_dim=768, depth=12,
        num_heads=12, num_prefix_tokens=1, dtypes=dtypes,
    )
