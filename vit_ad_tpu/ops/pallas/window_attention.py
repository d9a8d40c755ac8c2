"""Pallas TPU kernel: fused (shifted-)window attention.

The Swin/EsViT hot op (reference
src/classes/transformer/SwinTransformerModule.py:144-193). The XLA path
(ops/window_attention.window_attention_core) materializes the
[B·nW, heads, N, N] attention tensor in HBM — at 224px stage 1 that is
64·16 windows x 3 heads x 196x196 x 4B ≈ 470 MB per layer of pure
intermediate traffic. This kernel keeps one window's scores in VMEM:
QK^T + relative-position bias (+ shift mask) + softmax + PV run fused per
(window, head) grid cell; nothing but the [N, hd] output is written back.

Inputs arrive pre-projected ([B_, H, N, hd] — the qkv matmul stays in XLA
where it fuses with the LayerNorm), the bias table is pre-gathered to
[H, N, N] (tiny, static index map), and the mask is indexed per window by a
window-id vector. Same math as window_attention_core; equivalence is tested
in tests/test_pallas_window_attention.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_ad_tpu.ops.window_attention import relative_position_index

Array = jax.Array


def _target_platform() -> str:
    """Platform the current trace will run on: honors an active
    jax.default_device(...) context (default_backend() does not). The
    config value may be a Device or a platform string."""
    dev = jax.config.jax_default_device
    if dev is None:
        return jax.default_backend()
    return dev if isinstance(dev, str) else dev.platform


def _kernel(num_heads, accum_dtype, q_ref, k_ref, v_ref, bias_ref, mask_ref,
            out_ref):
    # blocks: q/k/v/out [1, N, C] (heads packed in C, sliced in VMEM);
    # bias [H, N, N]; mask [1, N, N]. One grid cell per window, heads
    # unrolled — fewer, fatter grid cells than a (window, head) grid.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    c = q.shape[-1]
    hd = c // num_heads
    scale = hd**-0.5
    mask = mask_ref[0]
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        scores = jnp.dot(
            q[:, sl] * scale, k[:, sl].T, preferred_element_type=accum_dtype
        )  # [N, N]
        scores = scores.astype(accum_dtype) + bias_ref[h] + mask
        scores = jax.nn.softmax(scores, axis=-1)
        out_ref[0, :, sl] = jnp.dot(
            scores.astype(v.dtype), v[:, sl], preferred_element_type=accum_dtype
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "n_w", "accum_dtype", "interpret")
)
def _call(q, k, v, bias, mask_windows, num_heads, n_w,
          accum_dtype=jnp.float32, interpret=False):
    """q/k/v: [B_, N, C]; mask_windows: [n_w, N, N] — indexed per grid cell
    by (window_id % n_w); windows are the minor axis of the partition, so
    window b maps to mask row b % n_w. No [B_, N, N] mask in HBM."""
    b_, n, c = q.shape
    hd = c // num_heads
    return pl.pallas_call(
        functools.partial(_kernel, num_heads, accum_dtype),
        out_shape=jax.ShapeDtypeStruct((b_, n, c), q.dtype),
        grid=(b_,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_heads, n, n), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b: (b % n_w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_ * num_heads * n * n * hd,
            bytes_accessed=(3 * b_ * n * c + b_ * n * n) * 4,
            transcendentals=b_ * num_heads * n * n,
        ),
        interpret=interpret,
    )(q, k, v, bias, mask_windows)


def window_attention_core_pallas(
    q: Array,
    k: Array,
    v: Array,
    bias_table: Array,
    num_heads: int,
    window: Tuple[int, int],
    mask: Optional[Array] = None,
    accum_dtype=jnp.float32,
    interpret: bool = False,
) -> Array:
    """Drop-in for ops.window_attention.window_attention_core.

    q/k/v: [B_, N, H, hd]; bias_table [(2Wh-1)(2Ww-1), nH];
    mask [nW, N, N] or None → returns [B_, N, H*hd]."""
    b_, n, h, hd = q.shape
    # heads stay packed in the channel dim — no transposes
    qf = q.reshape(b_, n, h * hd)
    kf = k.reshape(b_, n, h * hd)
    vf = v.reshape(b_, n, h * hd)

    idx = relative_position_index(window[0], window[1]).reshape(-1)
    bias = bias_table[idx].reshape(n, n, num_heads)
    bias = jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32)  # [H, N, N]

    # CPU target (tests, CPU-side init) can only run pallas interpreted
    if _target_platform() == "cpu":
        interpret = True

    if mask is None:
        mask_windows = jnp.zeros((1, n, n), jnp.float32)
        n_w = 1
    else:
        mask_windows = mask.astype(jnp.float32)
        n_w = mask.shape[0]

    return _call(qf, kf, vf, bias, mask_windows, num_heads, n_w,
                 accum_dtype=accum_dtype, interpret=interpret)


def _kernel_qkv(num_heads, accum_dtype, qkv_ref, out_ref):
    """Plain MHSA from a PACKED [1, N, 3C] qkv block. Specialized for the
    ViT path: no relative-position bias, no shift mask (skips the zero adds
    the generic kernel pays), and q/k/v head slices are static VMEM slices —
    the host-level [B,N,3,H,hd] split materializes three strided HBM copies
    (profiled ~0.5 ms/block at batch 128 on v5e) that this kernel avoids."""
    qkv = qkv_ref[0]
    c = qkv.shape[-1] // 3
    hd = c // num_heads
    scale = hd**-0.5
    # two-phase ordering: all QK^T+softmax first, then all PV — gives the
    # scheduler independent MXU work to overlap with each head's VPU softmax
    # (measured ~12% faster than the interleaved per-head chain on v5e)
    probs = []
    for h in range(num_heads):
        q = qkv[:, h * hd : (h + 1) * hd]
        k = qkv[:, c + h * hd : c + (h + 1) * hd]
        scores = jnp.dot(q * scale, k.T, preferred_element_type=accum_dtype)
        probs.append(jax.nn.softmax(scores.astype(accum_dtype), axis=-1))
    for h in range(num_heads):
        v = qkv[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
        out_ref[0, :, h * hd : (h + 1) * hd] = jnp.dot(
            probs[h].astype(qkv.dtype), v, preferred_element_type=accum_dtype
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "accum_dtype", "interpret")
)
def _call_qkv(qkv, num_heads, accum_dtype=jnp.float32, interpret=False):
    b, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    return pl.pallas_call(
        functools.partial(_kernel_qkv, num_heads, accum_dtype),
        out_shape=jax.ShapeDtypeStruct((b, n, c), qkv.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * num_heads * n * n * hd,
            bytes_accessed=(b * n * c3 + b * n * c) * 2,
            transcendentals=b * num_heads * n * n,
        ),
        interpret=interpret,
    )(qkv)


def _xla_packed_attention(qkv, num_heads):
    b, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // num_heads
    qkv = qkv.reshape(b, n, 3, num_heads, hd)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    return _xla_plain_attention(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def vit_attention_qkv(qkv: Array, num_heads: int) -> Array:
    """Differentiable fused MHSA from packed qkv [B, N, 3C] → [B, N, C].
    Pallas forward on TPU targets (XLA on CPU), XLA-recompute backward."""
    if _target_platform() == "cpu":
        return _xla_packed_attention(qkv, num_heads)
    return _call_qkv(qkv, num_heads)


def _vit_attention_qkv_fwd(qkv, num_heads):
    return vit_attention_qkv(qkv, num_heads), (qkv,)


def _vit_attention_qkv_bwd(num_heads, res, g):
    (qkv,) = res
    _, vjp = jax.vjp(lambda t: _xla_packed_attention(t, num_heads), qkv)
    return vjp(g)


vit_attention_qkv.defvjp(_vit_attention_qkv_fwd, _vit_attention_qkv_bwd)


def vit_attention_pallas(
    q: Array, k: Array, v: Array, accum_dtype=jnp.float32,
    interpret: bool = False,
) -> Array:
    """Fused plain MHSA for the ViT/DeiT blocks: one "window" of all tokens,
    no relative bias, no mask. q/k/v: [B, N, H, hd] → [B, N, H*hd]. Keeps the
    [H, N, N] attention probabilities in VMEM instead of HBM."""
    b, n, h, hd = q.shape
    qf = q.reshape(b, n, h * hd)
    kf = k.reshape(b, n, h * hd)
    vf = v.reshape(b, n, h * hd)
    if _target_platform() == "cpu":
        interpret = True
    zero_bias = jnp.zeros((h, n, n), jnp.float32)
    zero_mask = jnp.zeros((1, n, n), jnp.float32)
    return _call(qf, kf, vf, zero_bias, zero_mask, h, 1,
                 accum_dtype=accum_dtype, interpret=interpret)


# ---- differentiable wrappers -------------------------------------------------
#
# The Pallas kernels are forward-only; gradients recompute through the XLA
# reference core (jax.vjp of ops.window_attention.window_attention_core).
# Framework flows keep frozen encoders off the differentiated path, but
# trainable-encoder paths (e.g. recon with cache_frozen_features=False)
# differentiate through attention — the custom VJP makes that correct with
# the Pallas forward still in place.

def _xla_plain_attention(q, k, v):
    hd = q.shape[-1]
    attn = jax.nn.softmax(
        jnp.einsum("bnhd,bmhd->bhnm", q * hd**-0.5, k,
                   preferred_element_type=jnp.float32),
        axis=-1,
    ).astype(v.dtype)
    b, n, h, _ = q.shape
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, h * hd)


@jax.custom_vjp
def vit_attention(q: Array, k: Array, v: Array) -> Array:
    """Differentiable fused attention: Pallas forward on TPU targets (XLA on
    CPU), XLA-recompute backward. q/k/v: [B, N, H, hd] → [B, N, H*hd]."""
    if _target_platform() == "cpu":
        return _xla_plain_attention(q, k, v)
    return vit_attention_pallas(q, k, v)


def _vit_attention_fwd(q, k, v):
    return vit_attention(q, k, v), (q, k, v)


def _vit_attention_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_plain_attention, q, k, v)
    return vjp(g)


vit_attention.defvjp(_vit_attention_fwd, _vit_attention_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def window_attention(q, k, v, bias_table, num_heads, window, mask=None):
    """Differentiable windowed attention: Pallas forward on TPU targets (XLA
    on CPU), XLA-recompute backward (through
    ops.window_attention.window_attention_core). Differentiates q/k/v and
    the relative-position bias table; mask is constant."""
    from vit_ad_tpu.ops.window_attention import window_attention_core

    if _target_platform() == "cpu":
        return window_attention_core(q, k, v, bias_table, num_heads, window, mask)
    return window_attention_core_pallas(
        q, k, v, bias_table, num_heads, window, mask
    )


def _window_attention_fwd(q, k, v, bias_table, num_heads, window, mask=None):
    out = window_attention(q, k, v, bias_table, num_heads, window, mask)
    return out, (q, k, v, bias_table, mask)


def _window_attention_bwd(num_heads, window, res, g):
    from vit_ad_tpu.ops.window_attention import window_attention_core

    q, k, v, bias_table, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, bt_: window_attention_core(
            q_, k_, v_, bt_, num_heads, window, mask
        ),
        q, k, v, bias_table,
    )
    dq, dk, dv, dbt = vjp(g)
    return dq, dk, dv, dbt, None


window_attention.defvjp(_window_attention_fwd, _window_attention_bwd)
