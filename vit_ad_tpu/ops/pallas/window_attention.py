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
import os
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


def _kernel(num_heads, accum_dtype, w_blk, has_mask, q_ref, k_ref, v_ref,
            bias_ref, mask_ref, out_ref):
    # blocks: q/k/v/out [W_BLK, N, C] (heads packed in C, sliced in VMEM);
    # bias [H, N, N]; mask [W_BLK, N, N] (absent when has_mask=False).
    # W_BLK windows per grid cell amortize the per-cell DMA + grid overhead
    # (the 1-window grid measured 5.6 ms for EsViT stage 0 — ~3% of MXU
    # peak; the dots are inherently small [N, hd] so the win is in
    # amortization and MXU/VPU overlap, not dot shape). Per window, all
    # QK^T+softmax run before any PV (two-phase: the scheduler overlaps
    # each head's VPU softmax with the next head's MXU matmul).
    c = q_ref.shape[-1]
    hd = c // num_heads
    scale = hd**-0.5
    for w in range(w_blk):
        q = q_ref[w]
        k = k_ref[w]
        v = v_ref[w]
        probs = []
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            scores = jnp.dot(
                q[:, sl] * scale, k[:, sl].T,
                preferred_element_type=accum_dtype,
            )  # [N, N]
            scores = scores.astype(accum_dtype) + bias_ref[h]
            if has_mask:
                scores = scores + mask_ref[w]
            probs.append(jax.nn.softmax(scores, axis=-1))
        for h in range(num_heads):
            sl = slice(h * hd, (h + 1) * hd)
            out_ref[w, :, sl] = jnp.dot(
                probs[h].astype(v.dtype), v[:, sl],
                preferred_element_type=accum_dtype,
            ).astype(out_ref.dtype)


def _choose_wblk(b_, n, c, num_heads, n_w, masked) -> int:
    """Windows per grid cell. Default 1 — MEASURED, not a VMEM heuristic:
    the round-3 heuristic maximized the block under a ~10 MB VMEM budget
    (16 unmasked / 8 masked), but the per-cell body python-unrolls
    (windows × heads × 2 phases) dots — up to 96 serial dots per cell —
    while Mosaic pipelines DMAs/compute across CELLS. One window per cell
    measured EsViT 3802 → 4967 img/s (+31%) with W_BLK the only change
    (W_BLK 8: flat; 4: +5%; 2: +15%; full matrix in PERF.md round-4 EsViT
    section); NesT is flat at any value. VITAD_SWIN_WBLK overrides (must
    divide the mask period when masked / the window count otherwise)."""
    forced = os.environ.get("VITAD_SWIN_WBLK")
    if forced:
        w = int(forced)
        if (n_w % w == 0) if masked else (b_ % w == 0):
            return w
        # an A/B that silently fell back to 1 would measure the default
        # while claiming the forced block — surface the violation loudly.
        # (Not an exception: a whole-model run traces several geometries
        # and a block that fits stage 0 legitimately can't fit stage 2's
        # mask period of 1 — per-call fallback with a warning keeps the
        # model runnable while making the fallback visible.)
        import warnings

        warnings.warn(
            f"VITAD_SWIN_WBLK={w} does not divide "
            f"{('mask period ' + str(n_w)) if masked else ('window batch ' + str(b_))}"
            f" for this geometry — falling back to W_BLK=1 for this call",
            stacklevel=3,
        )
    return 1


@functools.partial(
    jax.jit, static_argnames=("num_heads", "n_w", "accum_dtype", "interpret")
)
def _call(q, k, v, bias, mask_windows, num_heads, n_w,
          accum_dtype=jnp.float32, interpret=False):
    """q/k/v: [B_, N, C]; mask_windows: [n_w, N, N] or None — windows are
    the minor axis of the partition, so window b's mask row is b % n_w and a
    W_BLK-aligned block of windows maps to a contiguous mask block. No
    [B_, N, N] mask in HBM."""
    b_, n, c = q.shape
    hd = c // num_heads
    masked = mask_windows is not None
    w_blk = _choose_wblk(b_, n, c, num_heads, n_w, masked)

    qkv_spec = lambda: pl.BlockSpec(  # noqa: E731
        (w_blk, n, c), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        qkv_spec(), qkv_spec(), qkv_spec(),
        pl.BlockSpec((num_heads, n, n), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v, bias]
    if masked:
        if n_w < w_blk:  # unreachable via _choose_wblk, kept for safety
            mask_windows = jnp.tile(mask_windows, (w_blk // n_w, 1, 1))
            n_w = mask_windows.shape[0]
        in_specs.append(
            pl.BlockSpec((w_blk, n, n),
                         lambda b: (b % (n_w // w_blk), 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask_windows)
    def body(*refs):
        if masked:
            q_r, k_r, v_r, b_r, m_r, o_r = refs
            _kernel(num_heads, accum_dtype, w_blk, True,
                    q_r, k_r, v_r, b_r, m_r, o_r)
        else:
            q_r, k_r, v_r, b_r, o_r = refs
            _kernel(num_heads, accum_dtype, w_blk, False,
                    q_r, k_r, v_r, b_r, None, o_r)

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((b_, n, c), q.dtype),
        grid=(b_ // w_blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((w_blk, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_ * num_heads * n * n * hd,
            bytes_accessed=(3 * b_ * n * c + b_ * n * n) * 4,
            transcendentals=b_ * num_heads * n * n,
        ),
        interpret=interpret,
    )(*args)


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
        mask_windows, n_w = None, 1
    else:
        mask_windows = mask.astype(jnp.float32)
        n_w = mask.shape[0]

    return _call(qf, kf, vf, bias, mask_windows, num_heads, n_w,
                 accum_dtype=accum_dtype, interpret=interpret)


def _kernel_win(num_heads, accum_dtype, w_blk, has_mask, qkv_ref, bias_ref,
                mask_ref, out_ref):
    """Windowed attention from PACKED qkv blocks.

    Blocks: qkv [W_BLK, N, 3C] (channel packing [3][H][hd] — the raw qkv
    GEMM output, no host-side q/k/v split), bias [H, N, N],
    mask [W_BLK, N, N], out [W_BLK, N, C]. All head slices are static
    lane slices in VMEM. Two-phase per window (all QK^T+exp first, then
    all PV) so each head's VPU softmax overlaps the next head's MXU
    matmul. Softmax division is deferred past PV: PV runs on the
    unnormalized exp scores and the [N, 1] reciprocal scales the output —
    one [N, hd] multiply replaces an [N, N] divide per (window, head).

    A map-level variant (windows read straight out of the padded
    [B,Hp,Wp,3C] map via index maps) was built and measured at 2318 img/s
    end-to-end EsViT vs 2735 for this layout — win=14 rows are not
    sublane-tile aligned, so every in-kernel window slice and store pays a
    Mosaic relayout. Windows-layout blocks keep all loads/stores aligned
    and whole-block."""
    c3 = qkv_ref.shape[-1]
    c = c3 // 3
    hd = c // num_heads
    scale = hd**-0.5
    for w in range(w_blk):
        qkv = qkv_ref[w]  # [N, 3C]
        exps, recips = [], []
        for h in range(num_heads):
            q = qkv[:, h * hd : (h + 1) * hd]
            k = qkv[:, c + h * hd : c + (h + 1) * hd]
            scores = jnp.dot(
                q * scale, k.T, preferred_element_type=accum_dtype
            ).astype(accum_dtype) + bias_ref[h]
            if has_mask:
                scores = scores + mask_ref[w]
            m = jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores - m)
            recips.append(1.0 / jnp.sum(e, axis=-1, keepdims=True))
            exps.append(e.astype(qkv.dtype))
        for h in range(num_heads):
            v = qkv[:, 2 * c + h * hd : 2 * c + (h + 1) * hd]
            pv = jnp.dot(exps[h], v, preferred_element_type=accum_dtype)
            out_ref[w, :, h * hd : (h + 1) * hd] = (
                pv * recips[h]
            ).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "n_w", "accum_dtype", "interpret")
)
def _call_win(qkv3, bias, mask_windows, num_heads, n_w,
              accum_dtype=jnp.float32, interpret=False):
    """qkv3: [B_, N, 3C] packed; bias [H, N, N]; mask_windows [n_w, N, N] or
    None (windows are the minor axis of the partition, so window b's mask
    row is b % n_w) → [B_, N, C]."""
    b_, n, c3 = qkv3.shape
    c = c3 // 3
    hd = c // num_heads
    masked = mask_windows is not None
    w_blk = _choose_wblk(b_, n, c, num_heads, n_w, masked)

    in_specs = [
        pl.BlockSpec((w_blk, n, c3), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((num_heads, n, n), lambda b: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qkv3, bias]
    if masked:
        if n_w < w_blk:  # unreachable via _choose_wblk, kept for safety
            mask_windows = jnp.tile(mask_windows, (w_blk // n_w, 1, 1))
            n_w = mask_windows.shape[0]
        in_specs.append(
            pl.BlockSpec((w_blk, n, n),
                         lambda b: (b % (n_w // w_blk), 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(mask_windows)

    def body(*refs):
        if masked:
            q_r, b_r, m_r, o_r = refs
            _kernel_win(num_heads, accum_dtype, w_blk, True,
                        q_r, b_r, m_r, o_r)
        else:
            q_r, b_r, o_r = refs
            _kernel_win(num_heads, accum_dtype, w_blk, False,
                        q_r, b_r, None, o_r)

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((b_, n, c), qkv3.dtype),
        grid=(b_ // w_blk,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((w_blk, n, c), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_ * num_heads * n * n * hd,
            bytes_accessed=(b_ * n * (c3 + c)) * 2,
            transcendentals=b_ * num_heads * n * n,
        ),
        interpret=interpret,
    )(*args)


def _xla_attention_windows(qkv3, bias_table, num_heads, window, mask,
                           accum_dtype=jnp.float32):
    """Reference/backward path for the packed windows attention: unpack
    [B_, N, 3C] ([3][H][hd] channel order) and run window_attention_core.
    Same math as the Pallas kernel; equivalence tested in
    tests/test_pallas_window_attention.py."""
    from vit_ad_tpu.ops.window_attention import window_attention_core

    b_, n, c3 = qkv3.shape
    c = c3 // 3
    hd = c // num_heads
    qkv = qkv3.reshape(b_, n, 3, num_heads, hd)
    return window_attention_core(
        qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], bias_table, num_heads,
        (window, window), mask, accum_dtype=accum_dtype,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def swin_attention_windows(qkv3, bias_table, num_heads, window, mask=None):
    """Differentiable fused window attention from packed qkv windows:
    Pallas forward on TPU targets (XLA on CPU), XLA-recompute backward.
    qkv3: [B_, N, 3C] packed [3][H][hd]; → [B_, N, C]."""
    if _target_platform() == "cpu":
        return _xla_attention_windows(qkv3, bias_table, num_heads, window,
                                      mask)
    n = window * window
    idx = relative_position_index(window, window).reshape(-1)
    bias = bias_table[idx].reshape(n, n, num_heads)
    bias = jnp.transpose(bias, (2, 0, 1)).astype(jnp.float32)
    if mask is None:
        m, n_w = None, 1
    else:
        m = mask.astype(jnp.float32)
        n_w = mask.shape[0]
    return _call_win(qkv3, bias, m, num_heads, n_w)


def _swin_attention_windows_fwd(qkv3, bias_table, num_heads, window,
                                mask=None):
    return swin_attention_windows(qkv3, bias_table, num_heads, window,
                                  mask), (qkv3, bias_table, mask)


def _swin_attention_windows_bwd(num_heads, window, res, g):
    qkv3, bias_table, mask = res
    _, vjp = jax.vjp(
        lambda q_, b_: _xla_attention_windows(q_, b_, num_heads, window,
                                              mask),
        qkv3, bias_table,
    )
    dq, db = vjp(g)
    return dq, db, None


swin_attention_windows.defvjp(_swin_attention_windows_fwd,
                              _swin_attention_windows_bwd)


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
    return _call(qf, kf, vf, zero_bias, None, h, 1,
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
