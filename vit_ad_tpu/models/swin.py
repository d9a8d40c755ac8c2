"""EsViT Swin-Transformer backbone.

Capability parity with the reference's vendored EsViT Swin
(reference src/classes/transformer/SwinTransformerModule.py:689-852 root
model; EncoderEsVit wrapper at TransformerEncoder.py:211-273): patch-embed
conv (4x4, stride 4) + LayerNorm, four stages of shifted-window blocks
(depths 2/2/6/2, heads 3/6/12/24, dims 96*2^i, window 14) with PatchMerging
between stages, final LayerNorm; dense-prediction output = (avg-pooled
latent, per-patch grid) (reference :821-837).

Swin conventions preserved:
  * window/shift clamped when stage resolution <= window size (stage 3 at
    224px runs 7x7 full-resolution attention, no shift)
  * alternating shift 0 / window//2 per block
  * padding to window multiples before partition (reference :359-363)
  * per-window relative position bias; additive -100 shift mask

TPU-native structure: each stage's blocks come in (unshifted, shifted) pairs
with identical programs, so — like the ViT blocks and NF coupling pairs —
their parameters are STACKED ([n_pairs, ...]) and the stack runs under
jax.lax.scan: one pair body per stage in the HLO, flat compile times, small
remote-compile payloads.

The attention core is ops/window_attention.window_attention_core (XLA) or
the fused Pallas kernel (VITAD_PALLAS_WINDOW_ATTN=1, read at trace time).
"""

from __future__ import annotations

import os
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_ad_tpu.config import DtypePolicy
from vit_ad_tpu.models.layers import (
    LayerNorm,
    _ln_fold_gemm,
    resolve_gelu_approx,
)
from vit_ad_tpu.models.outputs import EncoderOutput
from vit_ad_tpu.ops import window_attention as wa

Array = jax.Array


def _layer_norm(x, scale, bias, eps=1e-5):
    # VITAD_PALLAS_LN=1 routes the per-block norms through the fused Pallas
    # LN (ops/pallas/layer_norm.py) on TPU targets. Block LNs are EsViT's
    # largest non-dot trace bucket (3.99 ms / 15.9% at r4 defaults) and the
    # round-3 losing A/B never reached them — it only gated the module-level
    # LayerNorm (patch/merge/final norms), not this functional scan-body
    # path. Output dtype differs (kernel returns x.dtype, XLA path f32);
    # every caller casts to compute dtype immediately, so both are safe.
    if os.environ.get("VITAD_PALLAS_LN") == "1":
        from vit_ad_tpu.ops.pallas.layer_norm import layer_norm
        from vit_ad_tpu.ops.pallas.window_attention import _target_platform

        rows = int(np.prod(x.shape[:-1]))
        if _target_platform() == "tpu" and rows % 8 == 0:
            return layer_norm(x, scale, bias, eps)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return (xf - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def _attention_core():
    """Trace-time kernel selection for the packed-qkv windows attention
    ([B_, N, 3C] → [B_, N, C]): the fused Pallas kernel is the default on
    TPU targets. Set VITAD_PALLAS_WINDOW_ATTN=0 to force XLA, =1 to force
    Pallas (interpreted on CPU)."""
    from vit_ad_tpu.ops.pallas.window_attention import (
        _target_platform,
        _xla_attention_windows,
        swin_attention_windows,
    )

    flag = os.environ.get("VITAD_PALLAS_WINDOW_ATTN")
    if flag == "0":
        return _xla_attention_windows
    if flag == "1" or _target_platform() == "tpu":
        if os.environ.get("VITAD_SWIN_PACKED", "1") == "0":
            # experiment toggle: split q/k/v on the host (XLA fusion) and
            # run the v1 split-qkv kernel — the packed kernel's in-kernel
            # 32-lane head slices out of a 3C-wide block measured ~15%
            # slower per call than the split kernel's (see PERF.md EsViT
            # decomposition); this isolates kernel choice from the
            # map-native block layout
            from vit_ad_tpu.ops.pallas.window_attention import (
                window_attention,
            )

            def split_core(qkv3, bias_table, num_heads, window, mask):
                b_, n, c3 = qkv3.shape
                c = c3 // 3
                qkv = qkv3.reshape(b_, n, 3, num_heads, c // num_heads)
                return window_attention(
                    qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias_table,
                    num_heads, (window, window), mask,
                )

            return split_core
        # differentiable wrapper: Pallas forward, XLA-recompute backward
        core = swin_attention_windows
        # measured routing default: tiny windows (Swin stage 3's N=49)
        # are per-cell-overhead bound in the kernel and run 3x faster as
        # plain XLA batched dots (tools/bench_esvit_floor.py slope probe;
        # e2e +1.6% on top of W_BLK=1, PERF.md round-4 matrix). Route by
        # token count at trace time; VITAD_SWIN_XLA_MAX_N=0 forces
        # all-Pallas, higher values widen the XLA band.
        max_n = int(os.environ.get("VITAD_SWIN_XLA_MAX_N", "49"))
        if max_n:
            def routed(qkv3, bias_table, num_heads, window, mask):
                if qkv3.shape[1] <= max_n:
                    return _xla_attention_windows(
                        qkv3, bias_table, num_heads, window, mask
                    )
                return core(qkv3, bias_table, num_heads, window, mask)

            return routed
        return core
    return _xla_attention_windows



def _block_apply(
    x: Array,
    p: Dict[str, Array],
    num_heads: int,
    window: int,
    shift: int,
    mask,
    compute_dtype,
    accum_dtype,
    core,
    gelu_approx: bool = False,
) -> Array:
    """One Swin block on the [B, H, W, C] feature MAP, functional params
    (unstacked leaves).

    The block is map-native end to end: LN, GEMMs, MLP, and residuals all
    run on the 4D map, and the only token reshapes are the window
    partition/reverse transposes around the attention kernel. The previous
    shape ([B, L, C] carry with per-block [B,L,C]↔[B,H,W,C] reshapes) made
    XLA's layout assignment oscillate between {0,2,1} (LN/reduce) and the
    Pallas calls' default layouts — the resulting minor-dim layout copies
    ran at ~30 GB/s and cost 23 ms (40%) of the EsViT batch-128 forward."""
    b, h, w, c = x.shape
    shortcut = x
    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    # VITAD_SWIN_LN_FOLD=1: skip materializing the LN outputs — partition
    # RAW x and fold norm1 into the qkv GEMM (and norm2 into fc1) via
    # _ln_fold_gemm. Gated off when the stage pads (fold changes pad-token
    # values; see _ln_fold_gemm docstring) — never the case at 224px.
    ln_fold = (os.environ.get("VITAD_SWIN_LN_FOLD") == "1"
               and not (pad_b or pad_r))
    if ln_fold:
        y = x.astype(compute_dtype)
    else:
        y = _layer_norm(x, p["norm1_scale"], p["norm1_bias"]).astype(
            compute_dtype
        )
        if pad_b or pad_r:
            y = jnp.pad(y, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp_, wp_ = h + pad_b, w + pad_r

    # VITAD_SWIN_PARTITION=gather: one static token-permutation gather per
    # direction replaces the 6-D partition/reverse transposes AND the two
    # rolls of shifted blocks (the shift folds into the indices —
    # ops/window_attention.partition_perm). A/B lever for the 3.44 ms
    # (13.7%) copy/transpose bucket of the EsViT r4 trace.
    gather_mode = os.environ.get("VITAD_SWIN_PARTITION") == "gather"
    if gather_mode:
        perm, inv = wa.partition_perm(hp_, wp_, window, shift)
        n_tok = hp_ * wp_
        windows = jnp.take(
            y.reshape(b, n_tok, c), jnp.asarray(perm), axis=1
        ).reshape(-1, window * window, c)
    else:
        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
        windows = wa.window_partition(y, window)  # [B_, N, C]
    if ln_fold:
        # windows hold RAW tokens (partition is a permutation — per-token
        # LN stats are layout-invariant); norm1 rides the qkv GEMM
        qkv = _ln_fold_gemm(
            windows, p["norm1_scale"], p["norm1_bias"],
            p["qkv_kernel"], p["qkv_bias"], compute_dtype,
        )
    else:
        qkv = (
            jnp.einsum(
                "bnc,cd->bnd", windows, p["qkv_kernel"].astype(compute_dtype)
            )
            + p["qkv_bias"].astype(compute_dtype)
        )  # [B_, N, 3C], packed [3][H][hd]
    attn_out = core(
        qkv, p["bias_table"].astype(jnp.float32), num_heads, window, mask
    )  # [B_, N, C]
    if gather_mode:
        y = jnp.take(
            attn_out.reshape(b, hp_ * wp_, c), jnp.asarray(inv), axis=1
        ).reshape(b, hp_, wp_, c)
    else:
        y = wa.window_reverse(attn_out, window, hp_, wp_)
        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
    if pad_b or pad_r:
        y = y[:, :h, :w, :]
    y = (
        jnp.einsum("bhwc,cd->bhwd", y.astype(compute_dtype),
                   p["proj_kernel"].astype(compute_dtype))
        + p["proj_bias"].astype(compute_dtype)
    )
    x = shortcut + y

    if ln_fold:
        hdn = _ln_fold_gemm(
            x, p["norm2_scale"], p["norm2_bias"],
            p["fc1_kernel"], p["fc1_bias"], compute_dtype,
        )
        hdn = nn.gelu(hdn, approximate=gelu_approx)
    else:
        y = _layer_norm(x, p["norm2_scale"], p["norm2_bias"]).astype(
            compute_dtype
        )
        hdn = jnp.einsum(
            "bhwc,cd->bhwd", y, p["fc1_kernel"].astype(compute_dtype)
        )
        # policy GELU (layers.resolve_gelu_approx): tanh bf16, erf f32
        hdn = nn.gelu(
            hdn + p["fc1_bias"].astype(compute_dtype), approximate=gelu_approx
        )
    hdn = (
        jnp.einsum("bhwd,dc->bhwc", hdn, p["fc2_kernel"].astype(compute_dtype))
        + p["fc2_bias"].astype(compute_dtype)
    )
    return x + hdn


class SwinStage(nn.Module):
    """depth blocks as scan-stacked (unshifted, shifted) pairs."""

    dim: int
    num_heads: int
    depth: int
    window: int
    input_resolution: Tuple[int, int]
    mlp_ratio: float = 4.0
    dtypes: DtypePolicy = DtypePolicy()

    def _pair_params(self, n_pairs: int, window: int) -> Dict[str, Array]:
        c = self.dim
        hidden = int(c * self.mlp_ratio)
        t = (2 * window - 1) ** 2
        pdt = self.dtypes.param_dtype
        xavier = nn.initializers.xavier_uniform()
        trunc = nn.initializers.truncated_normal(0.02)
        ones, zeros = nn.initializers.ones, nn.initializers.zeros

        def stacked(init):
            def f(key, shape, dtype):
                keys = jax.random.split(key, shape[0])
                return jnp.stack([init(k, shape[1:], dtype) for k in keys])
            return f

        out = {}
        for tag in ("a", "b"):
            out.update({
                f"{tag}_norm1_scale": self.param(f"{tag}_norm1_scale", ones, (n_pairs, c), pdt),
                f"{tag}_norm1_bias": self.param(f"{tag}_norm1_bias", zeros, (n_pairs, c), pdt),
                f"{tag}_qkv_kernel": self.param(f"{tag}_qkv_kernel", stacked(xavier), (n_pairs, c, 3 * c), pdt),
                f"{tag}_qkv_bias": self.param(f"{tag}_qkv_bias", zeros, (n_pairs, 3 * c), pdt),
                f"{tag}_bias_table": self.param(f"{tag}_bias_table", stacked(trunc), (n_pairs, t, self.num_heads), pdt),
                f"{tag}_proj_kernel": self.param(f"{tag}_proj_kernel", stacked(xavier), (n_pairs, c, c), pdt),
                f"{tag}_proj_bias": self.param(f"{tag}_proj_bias", zeros, (n_pairs, c), pdt),
                f"{tag}_norm2_scale": self.param(f"{tag}_norm2_scale", ones, (n_pairs, c), pdt),
                f"{tag}_norm2_bias": self.param(f"{tag}_norm2_bias", zeros, (n_pairs, c), pdt),
                f"{tag}_fc1_kernel": self.param(f"{tag}_fc1_kernel", stacked(xavier), (n_pairs, c, hidden), pdt),
                f"{tag}_fc1_bias": self.param(f"{tag}_fc1_bias", zeros, (n_pairs, hidden), pdt),
                f"{tag}_fc2_kernel": self.param(f"{tag}_fc2_kernel", stacked(xavier), (n_pairs, hidden, c), pdt),
                f"{tag}_fc2_bias": self.param(f"{tag}_fc2_bias", zeros, (n_pairs, c), pdt),
            })
        return out

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.depth % 2 == 0, "Swin stages use (unshifted, shifted) pairs"
        h, w = self.input_resolution
        window, shift = self.window, self.window // 2
        if min(h, w) <= window:
            window, shift = min(h, w), 0

        n_pairs = self.depth // 2
        params = self._pair_params(n_pairs, window)
        # pre-cast the matmul weights/biases to compute dtype OUTSIDE the
        # scan (the in-body cast of each sliced leaf re-runs per iteration);
        # norm params and the relative-position bias tables stay f32 (their
        # math runs on the f32 attention logits / LN path)
        cd_pre = self.dtypes.compute_dtype
        params = {
            k: (
                v
                if ("norm" in k or "bias_table" in k)
                else v.astype(cd_pre)
            )
            for k, v in params.items()
        }
        pad_h = h + (window - h % window) % window
        pad_w = w + (window - w % window) % window
        mask_np = wa.shift_attention_mask(pad_h, pad_w, window, shift)
        mask = None if mask_np is None else jnp.asarray(mask_np)
        core = _attention_core()
        cd, acc = self.dtypes.compute_dtype, self.dtypes.accum_dtype
        heads = self.num_heads
        ga = resolve_gelu_approx(self.dtypes)

        def body(carry, pair):
            a = {k[2:]: v for k, v in pair.items() if k.startswith("a_")}
            b = {k[2:]: v for k, v in pair.items() if k.startswith("b_")}
            y = _block_apply(carry, a, heads, window, 0, None, cd, acc, core,
                             gelu_approx=ga)
            y = _block_apply(y, b, heads, window, shift, mask, cd, acc, core,
                             gelu_approx=ga)
            return y, None

        # the scan carries the 4D map — one [B,L,C]↔[B,H,W,C] reshape per
        # STAGE instead of per block keeps XLA on a single row-major layout
        # (see _block_apply docstring)
        bsz, _, c = x.shape
        xm = x.reshape(bsz, h, w, c)
        # VITAD_SWIN_UNROLL: scan unroll factor for the pair stack ("full"
        # = unroll every pair — static slice indices let XLA constant-fold
        # the per-iteration parameter-slice copies the while loop issues;
        # the deepest stage has only 3 pairs so program growth is small).
        unroll_env = os.environ.get("VITAD_SWIN_UNROLL", "1")
        unroll = n_pairs if unroll_env == "full" else max(1, int(unroll_env))
        xm, _ = jax.lax.scan(body, xm, params, unroll=min(unroll, n_pairs))
        return xm.reshape(bsz, h * w, c)


class PatchMerging(nn.Module):
    """2x2 concat + LayerNorm(4C) + Linear 4C→2C (reference :439-505)."""

    input_resolution: Tuple[int, int]
    dim: int
    dtypes: DtypePolicy = DtypePolicy()

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = self.input_resolution
        b, l, c = x.shape
        x = x.reshape(b, h, w, c)
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(b, (h // 2) * (w // 2), 4 * c)
        x = LayerNorm(dtypes=self.dtypes, eps=1e-5, name="norm")(x)
        return nn.Dense(
            2 * self.dim, use_bias=False, dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="reduction",
        )(x)


class SwinTransformer(nn.Module):
    """Swin-T trunk with dense-prediction output."""

    img_size: int = 224
    patch_size: int = 4
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: int = 14
    mlp_ratio: float = 4.0
    dtypes: DtypePolicy = DtypePolicy()

    @property
    def final_dim(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @property
    def num_patches(self) -> int:
        side = self.img_size // self.patch_size // 2 ** (len(self.depths) - 1)
        return side * side

    @nn.compact
    def __call__(self, x: Array, block_index: int = 0) -> EncoderOutput:
        b = x.shape[0]
        x = x.astype(self.dtypes.compute_dtype)
        x = nn.Conv(
            self.embed_dim, (self.patch_size,) * 2, strides=(self.patch_size,) * 2,
            padding="VALID", dtype=self.dtypes.compute_dtype,
            param_dtype=self.dtypes.param_dtype, name="patch_embed",
        )(x)
        _, h, w, _ = x.shape
        x = x.reshape(b, h * w, self.embed_dim)
        x = LayerNorm(dtypes=self.dtypes, eps=1e-5, name="patch_norm")(x)

        res = (h, w)
        dim = self.embed_dim
        for si, (depth, heads) in enumerate(zip(self.depths, self.num_heads)):
            x = SwinStage(
                dim=dim,
                num_heads=heads,
                depth=depth,
                window=self.window,
                input_resolution=res,
                mlp_ratio=self.mlp_ratio,
                dtypes=self.dtypes,
                name=f"layer{si}",
            )(x)
            if si < len(self.depths) - 1:
                x = PatchMerging(
                    input_resolution=res, dim=dim, dtypes=self.dtypes,
                    name=f"layer{si}_downsample",
                )(x)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        x_region = LayerNorm(dtypes=self.dtypes, eps=1e-5, name="norm")(x)
        latent = jnp.mean(x_region, axis=1)  # avgpool (reference :832-833)
        return EncoderOutput(patch_embedding=x_region, latent=latent)


class EsViTEncoder(nn.Module):
    """EncoderEsVit parity wrapper (reference TransformerEncoder.py:211-273):
    effective patch 32, embed 768 at the dense-prediction output."""

    img_size: int = 224
    dtypes: DtypePolicy = DtypePolicy()

    def setup(self) -> None:
        self.esvit = SwinTransformer(img_size=self.img_size, dtypes=self.dtypes)

    @property
    def embed_dim(self) -> int:
        return 768

    @property
    def num_patches(self) -> int:
        return (self.img_size // 32) ** 2

    def __call__(self, x: Array, block_index: int = 0) -> EncoderOutput:
        return self.esvit(x, block_index=block_index)


def esvit_swin_tiny(img_size: int = 224, dtypes: DtypePolicy = DtypePolicy()) -> EsViTEncoder:
    return EsViTEncoder(img_size=img_size, dtypes=dtypes)
