"""Shared flax.linen building blocks for the transformer backbones.

Semantics match the pre-LN ViT family used by the reference via timm
(reference src/classes/transformer/TransformerEncoder.py) so that converted
PyTorch weights reproduce outputs bit-for-bit (up to dtype): fused QKV
projection, per-head scaled dot-product attention, GELU MLP.

TPU notes: attention over the ViT/DeiT sequence (196-198 tokens) is small
enough that XLA's fused dot-general path is already MXU-optimal; windowed
attention for Swin/EsViT has a dedicated Pallas kernel in
ops/window_attention.py.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy

Array = jax.Array


class PatchEmbed(nn.Module):
    """Image → patch tokens via a stride=patch conv.

    XLA lowers a stride=kernel conv to a reshape + matmul that lands on the
    MXU, so there is no benefit to hand-writing it; NHWC layout keeps the
    channel dim minor as the TPU prefers.
    """

    patch_size: int = 16
    embed_dim: int = 768
    dtypes: DtypePolicy = DtypePolicy()
    flatten: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # x: [B, H, W, 3] NHWC
        x = nn.Conv(
            features=self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype,
            name="proj",
        )(x)
        if self.flatten:
            b, h, w, c = x.shape
            x = x.reshape(b, h * w, c)
        return x


def resolve_gelu_approx(
    dtypes: DtypePolicy, gelu_tanh: Optional[bool] = None
) -> bool:
    """The one GELU-flavor policy, shared by every backbone (first measured
    on DeiT-base, models/vit.py): exact erf is the torch/timm semantic the
    converters are golden-tested against, but it costs ~9 ms/batch-128 of
    VPU transcendentals on v5e per ~1B activations. Under bf16 compute the
    tanh-vs-erf deviation (<=4e-3 on anomaly scores, measured) is the same
    order as bf16 rounding itself, so bf16 defaults to tanh and f32 paths
    (torch bit-parity tests, converters) keep exact erf.
    VITAD_EXACT_GELU=1 pins exact erf everywhere so score shifts stay
    attributable (README "Numerics")."""
    import os

    if os.environ.get("VITAD_EXACT_GELU"):
        return False
    if gelu_tanh is not None:
        return gelu_tanh
    return dtypes.compute_dtype == jnp.bfloat16


class Mlp(nn.Module):
    """Transformer MLP: fc1 → GELU → fc2. The default activation follows
    `resolve_gelu_approx` (tanh under bf16, exact erf under f32)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dtypes: DtypePolicy = DtypePolicy()
    act: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(
            self.hidden_dim,
            dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype,
            name="fc1",
        )(x)
        if self.act is not None:
            x = self.act(x)
        else:
            x = nn.gelu(x, approximate=resolve_gelu_approx(self.dtypes))
        x = nn.Dense(
            out_dim,
            dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype,
            name="fc2",
        )(x)
        return x


class Attention(nn.Module):
    """Multi-head self-attention with fused QKV (timm layout parity).

    Softmax runs in accum (f32) precision for numerical stability in bf16.
    """

    num_heads: int
    dtypes: DtypePolicy = DtypePolicy()
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, d = x.shape
        head_dim = d // self.num_heads
        qkv = nn.Dense(
            3 * d,
            use_bias=self.qkv_bias,
            dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype,
            name="qkv",
        )(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, hd]
        scale = head_dim**-0.5
        attn = jnp.einsum(
            "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=self.dtypes.accum_dtype
        )
        attn = jax.nn.softmax(attn.astype(self.dtypes.accum_dtype), axis=-1)
        attn = attn.astype(self.dtypes.compute_dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
        out = nn.Dense(
            d,
            dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype,
            name="proj",
        )(out)
        return out


class FusedBatchNorm(nn.Module):
    """`nn.BatchNorm` drop-in (identical params/batch_stats layout and
    training math) whose INFERENCE path stays in the compute dtype.

    flax's eval path promotes the whole map to f32 (our dtype=accum) to
    normalize, which materializes f32 stage maps XLA cannot fuse into the
    producing conv's epilogue — measured as ~1.6 ms of f32
    [128,56,56,64] BN fusions in the EfficientFormer trace
    (tools/trace_eff_former.txt). Here the per-channel mean/mul/bias are
    derived in f32 from the f32 running stats, cast once ([C] vectors),
    and applied in the compute dtype with flax's exact op order
    ((x - mean) * (rsqrt(var+eps)*scale) + bias) — under a f32 policy
    this is bit-identical to nn.BatchNorm; under bf16 the map-sized ops
    run in bf16 like every other epilogue and fuse away. Training
    replicates flax op-for-op (f32 fast-variance stats, momentum blend,
    f32 normalize; running update skipped while initializing)."""

    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cd = self.dtypes.compute_dtype
        c = x.shape[-1]
        scale = self.param(
            "scale", nn.initializers.ones, (c,), self.dtypes.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (c,), self.dtypes.param_dtype
        )
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (c,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (c,)
        )
        if self.use_running_average:
            mul = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale.astype(
                jnp.float32
            )
            return (x - ra_mean.value.astype(cd)) * mul.astype(cd) + bias.astype(cd)
        x32 = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        mu = x32.mean(axes)
        mu2 = (x32 * x32).mean(axes)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mu
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var
            )
        mul = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        return (x32 - mu) * mul + bias.astype(jnp.float32)


class _LNParams(nn.Module):
    """Bare scale/bias holder so the fused-LN path keeps the exact param
    tree of the flax path (`<name>/LayerNorm_0/{scale,bias}`) that the
    torch converters consume (utils/torch_convert.py)."""

    dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones, (self.dim,), self.param_dtype
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.dim,), self.param_dtype
        )
        return scale, bias


class LayerNorm(nn.Module):
    """LayerNorm computed in f32 (bf16 variance is too coarse), cast back.

    flax's nn.LayerNorm is the default AND the fastest path — the fused
    Pallas kernel (ops/pallas/layer_norm.py, VITAD_PALLAS_LN=1) and a
    bf16-normalize XLA control (VITAD_BF16_LN=1) both measured SLOWER on
    hardware (NesT −30%/−4.9%, PERF.md LN A/B table); they are kept as
    opt-in decision records. All paths share the nn.LayerNorm param
    layout (LayerNorm_0/{scale,bias})."""

    dtypes: DtypePolicy = DtypePolicy()
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from vit_ad_tpu.ops.pallas.layer_norm import (
            layer_norm,
            pallas_ln_viable,
        )

        cd = self.dtypes.compute_dtype
        if pallas_ln_viable(x.shape, self.dtypes):
            scale, bias = _LNParams(
                x.shape[-1], self.dtypes.param_dtype, name="LayerNorm_0"
            )()
            return layer_norm(x, scale, bias, self.eps).astype(cd)
        import os

        if os.environ.get("VITAD_BF16_LN") == "1" and cd == jnp.bfloat16:
            # A/B control for the kernel: f32 stats, bf16 normalize ops
            # (XLA-only fusion variant; extra bf16 rounding per op).
            scale, bias = _LNParams(
                x.shape[-1], self.dtypes.param_dtype, name="LayerNorm_0"
            )()
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
            mul = (jax.lax.rsqrt(var + self.eps)).astype(cd)
            return (x - mean.astype(cd)) * mul * scale.astype(
                cd
            ) + bias.astype(cd)
        y = nn.LayerNorm(
            epsilon=self.eps,
            dtype=self.dtypes.accum_dtype,
            param_dtype=self.dtypes.param_dtype,
        )(x)
        return y.astype(cd)


class TransformerBlock(nn.Module):
    """Pre-LN transformer encoder block: x + MHSA(LN(x)); x + MLP(LN(x))."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtypes: DtypePolicy = DtypePolicy()
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        y = LayerNorm(dtypes=self.dtypes, eps=self.ln_eps, name="norm1")(x)
        x = x + Attention(num_heads=self.num_heads, dtypes=self.dtypes, name="attn")(y)
        y = LayerNorm(dtypes=self.dtypes, eps=self.ln_eps, name="norm2")(x)
        x = x + Mlp(
            hidden_dim=int(d * self.mlp_ratio), dtypes=self.dtypes, name="mlp"
        )(y)
        return x


def _token_moments(x: Array, eps: float = 1e-5):
    """Per-token (mu, rsqrt(var+eps)) over the channel dim, f32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return mean, jax.lax.rsqrt(var + eps)


def _ln_fold_gemm(x: Array, scale, bias, w, b, compute_dtype, eps=1e-5):
    """LayerNorm folded into the following GEMM (VITAD_SWIN_LN_FOLD lever).

    The per-token rsqrt scalar commutes with the channel contraction:
        LN(x) @ W + b
      = r·(x @ W' - mu·colsum(W')) + (beta @ W + b),   W' = gamma ⊙ W
    so the GEMM reads RAW x and the normalized activation tensor — EsViT's
    largest non-dot trace bucket is LN at 3.99 ms/iter (15.9%), mostly the
    normalize pass + its HBM write/read — never materializes. mu/r are two
    cheap per-token reduces of the same x the GEMM loads; the correction +
    scaling is an epilogue XLA fuses into the dot's consumer. W'/colsum/b'
    are weight-sized precomputes XLA hoists or folds per scan slice.

    bf16 caveat (review r5): the GEMM runs on RAW un-centered x in
    compute dtype and recovers LN(x)@W by subtracting mu*colsum AFTER —
    when the residual stream carries large per-token means (deep-block
    ViT outlier features), the bf16 rounding of x is amplified by
    |x|/|x-mu| relative to the default path, which normalizes in f32
    BEFORE the bf16 cast. The lever is opt-in and measured LOSING on
    every backbone (PERF.md r5: EsViT -3.9%, ViT -1.0%), so this
    hazard is documented rather than engineered around; equivalence
    tests pin the f32 policy only.

    Only valid when no zero-padding is appended between the LN and the
    GEMM (padding the LN *output* with zeros gives pad-qkv = bias, folding
    gives beta@W + bias) — callers gate on pad==0; at 224px no Swin stage
    pads."""
    mu, r = _token_moments(x, eps)
    wp = (scale[:, None] * w).astype(compute_dtype)  # gamma-scaled weights
    cs = jnp.sum(wp.astype(jnp.float32), axis=0)  # colsum(W'), [out]
    bp = bias.astype(jnp.float32) @ w.astype(jnp.float32) + b
    raw = jnp.einsum("...c,cd->...d", x.astype(compute_dtype), wp)
    out = r * (raw.astype(jnp.float32) - mu * cs) + bp
    return out.astype(compute_dtype)
