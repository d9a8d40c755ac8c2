"""Pallas TPU kernel: fused LayerNorm over the feature (minor) dim.

Motivation (round-3 traces): LayerNorm is the largest non-matmul term in
the hierarchical backbones — 6.65 ms of NesT-tiny's 25.65 ms step (25.9%,
`tools/trace_nest.txt`) and ~4.0 ms of EsViT's 33.4 ms — because the XLA
lowering makes ≥3 HBM passes over the map (a stats-reduce read, a
normalize read, plus f32 intermediates flax's `_normalize` materializes:
`y = x - mean` promotes the whole map to f32 before the final cast, and
dots cannot absorb elementwise producers, so the f32 normalize output is
written back before each qkv/fc matmul consumes it). This kernel makes
exactly one read and one write per element: a [T, D] row tile is loaded
once into VMEM, stats are computed in f32, and the normalized map is
written back in the storage dtype.

Numerics: identical math to the f32 reference expression (centered
variance, f32 normalize, cast on store) — there is NO precision tradeoff
vs the exact path, unlike the tanh-GELU policy. The only deviation from
flax's `nn.LayerNorm(dtype=f32)` is centered vs fast variance (≤1 ulp in
f32); outputs are bit-identical after the bf16 cast in practice and
tolerance-tested in tests/test_pallas_layer_norm.py.

Forward-only kernel; the differentiable wrapper recomputes the backward
through the XLA reference expression (same pattern as
ops/pallas/window_attention.py / mlp.py). The encoders using it are
frozen (reference freezes every backbone,
src/classes/transformer/TransformerEncoder.py:63-64,142-143), so the
backward only exists for safety.

VERDICT (v5e hardware three-way A/B, tools/ln_ab.jsonl): **loses to
stock flax LN** — enc_nest 3440 vs 4919 img/s (−30%), enc_esvit 3564 vs
3756, enc_eff_former 11773 vs 12248; a bf16-normalize XLA control also
lost (−0.5…−4.9%). Per-grid-step dispatch overhead across NesT's ~25 LN
sites × ~400 steps each swamps the saved HBM passes — the same failure
mode as ops/pallas/mlp.py at these shapes. Kept OPT-IN
(VITAD_PALLAS_LN=1) as the decision record; see PERF.md.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_ROW_TILES = (1024, 512, 256, 128, 64, 32, 16, 8)


def _kernel(eps, x_ref, s_ref, b_ref, out_ref):
    xf = x_ref[:].astype(jnp.float32)  # [T, D]
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    out_ref[:] = (y * s_ref[:] + b_ref[:]).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("eps", "row_tile", "interpret"))
def layer_norm_pallas(
    x: Array,        # [..., D] (any storage dtype)
    scale: Array,    # [D]
    bias: Array,     # [D]
    eps: float = 1e-6,
    row_tile: int = 0,
    interpret: bool = False,
) -> Array:
    """One-pass fused LayerNorm; returns x's dtype. Rows (= prod of the
    leading dims) must be divisible by some power-of-two tile ≥ 8 — use
    `pallas_ln_viable` before calling (no padding copy is ever made; a pad
    would cost the very HBM pass the kernel exists to remove)."""
    d = x.shape[-1]
    rows = x.size // d
    xr = x.reshape(rows, d)
    if not row_tile:
        row_tile = next(
            (t for t in _ROW_TILES if rows % t == 0), None
        )
        if row_tile is None:
            raise ValueError(
                f"rows={rows} is not divisible by any tile in {_ROW_TILES};"
                " gate calls with pallas_ln_viable"
            )
    if rows % row_tile:
        # grid floor-division would silently leave the tail rows of the
        # output buffer unwritten
        raise ValueError(f"row_tile={row_tile} does not divide rows={rows}")

    out = pl.pallas_call(
        functools.partial(_kernel, eps),
        out_shape=jax.ShapeDtypeStruct((rows, d), x.dtype),
        grid=(rows // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * d,
            bytes_accessed=2 * rows * d * x.dtype.itemsize,
            transcendentals=rows,
        ),
        interpret=interpret,
    )(
        xr,
        scale.astype(jnp.float32)[None, :],
        bias.astype(jnp.float32)[None, :],
    )
    return out.reshape(x.shape)


def _xla_layer_norm(x, scale, bias, eps):
    """f32 reference expression (matches models/vit.py _layer_norm): used on
    CPU, as the recompute backward, and as the numerics baseline in tests."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        x.dtype
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm(x, scale, bias, eps=1e-6):
    """Differentiable fused LayerNorm: Pallas forward on TPU targets, XLA
    expression elsewhere; XLA-recompute backward."""
    from vit_ad_tpu.ops.pallas.window_attention import _target_platform

    if _target_platform() == "cpu":
        return _xla_layer_norm(x, scale, bias, eps)
    return layer_norm_pallas(x, scale, bias, eps=eps)


def _layer_norm_fwd(x, scale, bias, eps):
    return layer_norm(x, scale, bias, eps), (x, scale, bias)


def _layer_norm_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(lambda *a: _xla_layer_norm(*a, eps), x, scale, bias)
    return vjp(g)


layer_norm.defvjp(_layer_norm_fwd, _layer_norm_bwd)


def pallas_ln_viable(shape, dtypes) -> bool:
    """Kernel selection for models/layers.LayerNorm: TPU target, bf16
    storage (under f32 policy the XLA path is already single-dtype and the
    torch bit-parity suites pin exact flax semantics), rows tile-divisible,
    and a [tile, D] f32 block within a conservative VMEM budget.
    VITAD_PALLAS_LN=1 opts in; the default stays OFF — the hardware A/B
    measured the kernel LOSING end-to-end on every LN-heavy backbone
    (module docstring / PERF.md kernel-decision table)."""
    if os.environ.get("VITAD_PALLAS_LN") != "1":
        return False
    from vit_ad_tpu.ops.pallas.window_attention import _target_platform

    if _target_platform() != "tpu":
        return False
    if dtypes.compute_dtype != jnp.bfloat16:
        return False
    d = shape[-1]
    rows = 1
    for s in shape[:-1]:
        rows *= s
    if rows % _ROW_TILES[-1]:
        return False
    row_tile = next(t for t in _ROW_TILES if rows % t == 0)
    # x tile f32 + bf16 in/out blocks (double-buffered), 14 MB budget
    est = row_tile * max(d, 128) * (
        4 + 4 * jnp.dtype(dtypes.compute_dtype).itemsize
    )
    return est <= 14 * 1024 * 1024
