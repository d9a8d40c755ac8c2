"""(Shifted-)window multi-head self-attention.

The compute core of the Swin/EsViT backbone (reference
src/classes/transformer/SwinTransformerModule.py:84-193 WindowAttention,
:349-416 block shift/pad logic). This module provides:

  * window_partition / window_reverse as pure reshapes/transposes
    (reference :50-78)
  * relative_position_index construction (reference :118-137)
  * shifted-window attention masks, computed statically in NumPy at trace
    time (reference builds them lazily with tensor ops, :316-347)
  * window_attention — the batched attention over [B*nW, N, C] with
    per-head relative position bias and optional shift mask.

The XLA path below batches every window into one [B*nW, heads, N, N]
attention — the MXU sees a few large matmuls. A fused Pallas kernel for
this op lives in ops/pallas/window_attention.py (keyed off the same
signature) once shapes warrant it.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def window_partition(x: Array, window: int) -> Array:
    """[B, H, W, C] → [B*nW, window*window, C] (reference :50-64)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(windows: Array, window: int, h: int, w: int) -> Array:
    """[B*nW, window*window, C] → [B, H, W, C] (reference :67-78)."""
    c = windows.shape[-1]
    b = windows.shape[0] // (h * w // window // window)
    x = windows.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@lru_cache(maxsize=None)
def partition_perm(
    hp: int, wp: int, window: int, shift: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(perm, inv): static token permutations implementing the cyclic shift
    + window partition (and its inverse) as ONE gather each.

    The reshape/transpose pair in `window_partition` materializes a 6-D
    transpose copy ([B, H/w, w, W/w, w, C] — the %copy ops that cost 3.44 ms
    (13.7%) of the EsViT r4 trace), and the shifted blocks pay a separate
    `jnp.roll` on top (reference torch.roll, SwinTransformerModule.py:
    367-369). Flattening tokens to [B, H*W, C] and indexing with `perm`
    yields the identical windows layout with the roll FOLDED IN:
    windows-slot j of the (rolled, partitioned) map reads map token
    perm[j] = flat((h_j + shift) % H, (w_j + shift) % W). `inv` restores
    map layout from windows layout (window_reverse + un-roll). Requires
    hp/wp divisible by window (at 224px no Swin stage ever pads, so the
    gather path covers every production geometry)."""
    assert hp % window == 0 and wp % window == 0, (hp, wp, window)
    n_h, n_w = hp // window, wp // window
    # windows-slot coordinates in plain-partition order
    wi, wj, r, c = np.meshgrid(
        np.arange(n_h), np.arange(n_w), np.arange(window), np.arange(window),
        indexing="ij",
    )
    h = (wi * window + r + shift) % hp
    w = (wj * window + c + shift) % wp
    perm = (h * wp + w).reshape(-1)
    inv = np.argsort(perm)
    return perm, inv


@lru_cache(maxsize=None)
def relative_position_index(window_h: int, window_w: int) -> np.ndarray:
    """[N, N] indices into the (2Wh-1)(2Ww-1) bias table (reference :118-137)."""
    coords = np.stack(
        np.meshgrid(np.arange(window_h), np.arange(window_w), indexing="ij")
    )  # [2, Wh, Ww]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += window_h - 1
    rel[:, :, 1] += window_w - 1
    rel[:, :, 0] *= 2 * window_w - 1
    return rel.sum(-1)


@lru_cache(maxsize=None)
def shift_attention_mask(
    hp: int, wp: int, window: int, shift: int
) -> Optional[np.ndarray]:
    """[nW, N, N] additive mask (0 / -100) for shifted windows, or None when
    shift == 0 (reference :316-347, mask value -100.0)."""
    if shift == 0:
        return None
    img_mask = np.zeros((1, hp, wp, 1), dtype=np.float32)
    cnt = 0
    for h_sl in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for w_sl in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[:, h_sl, w_sl, :] = cnt
            cnt += 1
    m = img_mask.reshape(1, hp // window, window, wp // window, window, 1)
    m = m.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_attention_core(
    q: Array,
    k: Array,
    v: Array,
    bias_table: Array,
    num_heads: int,
    window: Tuple[int, int],
    mask: Optional[Array] = None,
    accum_dtype=jnp.float32,
) -> Array:
    """Batched W-MSA core over projected windows (reference :144-193).

    q/k/v: [B_, N, H, hd]; bias_table: [(2Wh-1)(2Ww-1), nH];
    mask: [nW, N, N] or None. Returns [B_, N, C]. The Pallas kernel in
    ops/pallas/window_attention.py implements this same signature."""
    b_, n, h, hd = q.shape
    scale = hd**-0.5
    attn = jnp.einsum(
        "bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=accum_dtype
    )

    idx = relative_position_index(window[0], window[1]).reshape(-1)
    rel_bias = bias_table[idx].reshape(n, n, num_heads)
    attn = attn + rel_bias.transpose(2, 0, 1)[None].astype(attn.dtype)

    if mask is not None:
        n_w = mask.shape[0]
        attn = attn.reshape(b_ // n_w, n_w, num_heads, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(b_, num_heads, n, n)

    attn = jax.nn.softmax(attn.astype(accum_dtype), axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b_, n, h * hd)
