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


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    # blocks: q/k/v [1, 1, N, hd]; bias [1, N, N]; mask [1, N, N]
    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    hd = q.shape[-1]
    scores = jnp.dot(
        q * (hd**-0.5), k.T, preferred_element_type=jnp.float32
    )  # [N, N]
    scores = scores + bias_ref[0] + mask_ref[0]
    scores = jax.nn.softmax(scores, axis=-1)
    out_ref[0, 0] = jnp.dot(
        scores.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_w", "interpret"))
def _call(q, k, v, bias, mask_windows, n_w, interpret=False):
    """mask_windows: [n_w, N, N] — indexed per grid cell by (window_id %
    n_w); windows are the minor axis of the partition, so window b maps to
    mask row b % n_w. Avoids materializing a [B_, N, N] mask in HBM."""
    b_, h, n, hd = q.shape
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b_, h, n, hd), q.dtype),
        grid=(b_, h),
        in_specs=[
            pl.BlockSpec((1, 1, n, hd), lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, hd), lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, hd), lambda b, hh: (b, hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b, hh: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda b, hh: (b % n_w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, n, hd), lambda b, hh: (b, hh, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_ * h * n * n * hd,
            bytes_accessed=(3 * b_ * h * n * hd + b_ * n * n) * 4,
            transcendentals=b_ * h * n * n,
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
    # [B_, H, N, hd] layout for per-(window, head) blocks
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))

    idx = relative_position_index(window[0], window[1]).reshape(-1)
    bias = bias_table[idx].reshape(n, n, num_heads)
    bias = jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32)  # [H, N, N]

    # CPU backend (tests, CPU-side init) can only run pallas interpreted
    if jax.default_backend() == "cpu":
        interpret = True

    if mask is None:
        mask_windows = jnp.zeros((1, n, n), jnp.float32)
        n_w = 1
    else:
        mask_windows = mask.astype(jnp.float32)
        n_w = mask.shape[0]

    out = _call(qt, kt, vt, bias, mask_windows, n_w, interpret=interpret)
    return jnp.transpose(out, (0, 2, 1, 3)).reshape(b_, n, h * hd)
