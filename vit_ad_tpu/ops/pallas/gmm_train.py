"""Pallas TPU kernels: differentiable fused GMM log-likelihood (training).

The MDN *training* step was the framework's slowest hot loop: the XLA
K-chunk scan (ops/gmm.fused_log_likelihood) keeps peak memory bounded but
its backward re-materializes [B, P, D, Kc] f32 sigma/mu/density temps per
chunk (jax.checkpoint), so every step moves ~10x the arithmetically
necessary HBM bytes — measured 416 img/s at B=32 and a compile-time
RESOURCE_EXHAUSTED at B=128 (PERF.md round 3).

This module gives the fused likelihood a custom VJP whose backward is two
Pallas kernels in which mu/sigma/density for one mixture component never
leave VMEM:

  * forward: the existing scoring kernel (ops/pallas/gmm.py) — residuals
    are just (x, log_pi, weights, ll), no per-component temps saved;
  * `_bwd_params_kernel` — grid (K, row_tiles), row-sweep innermost:
    d(weights)/d(biases)/d(log_pi) accumulate into VMEM-resident output
    blocks across the row sweep of each component (the out block index only
    changes with K, so revisits are consecutive — the Pallas accumulation
    pattern);
  * `_bwd_x_kernel` — grid (row_tiles, K), component-sweep innermost:
    d(x) accumulates per row tile across components. Emitted separately so
    XLA's DCE deletes it whenever the caller does not differentiate w.r.t.
    the features — the product trainers train the head on frozen-trunk
    cached features (pipeline/train.py train_mdn), where dx is dead.

Gradient math (per row r, feature d, component k; q := dL/d(dens)):
  ll        = logsumexp_k( log_pi[r,k] + dens[r,d,k] )
  p[r,d,k]  = exp(log_pi + dens - ll)        (softmax weights; ll >= t, so
                                              the exp is always <= 1: stable)
  q         = g * p                           (g = dL/d(ll))
  d log_pi  = sum_d q
  d mu      = q * z / sigma                   (z = (x - mu) / sigma)
  d pre     = q * (z^2 - 1) / sigma * elu'(pre)
  d W       = x^T @ d(mu|pre)   d b = sum_r   d x = dmu @ Wm^T + dpre @ Ws^T - dmu

Reference semantics being differentiated: reference
src/classes/MixtureDensityNetwork.py:35-102 (the reference materializes
[B, P, D, K] and lets autograd store it — its documented memory hot spot,
src/pipeline/LearnerMDN.py:147-169).

Mesh composition: under `--mesh` training GSPMD treats the pallas_call as
an opaque custom call and gathers its operands to replicated — numerically
correct (tests/test_mesh_training.py passes with the kernel forced on) but
it forfeits the mixture-parallel K-sharding of the [D, D, K] weights; a
sharded deployment that is HBM-limited on the MDN heads should set
VITAD_PALLAS_GMM_TRAIN=0 and keep the sharded XLA scan.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vit_ad_tpu.ops.pallas.gmm import gmm_log_likelihood_pallas, use_pallas_gmm

Array = jax.Array

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_NEG_BIG = -1e30


def _component_terms(xm, xd, g, ll, lp, ws_blk, bs_vec, wm_blk, bm_vec):
    """Shared recompute for both backward kernels. The GMM density is fully
    elementwise in the output-feature dim, so the weight blocks may be any
    lane-slice [D, Dt] of the full heads; `xm` is the (full-width) matmul
    input, `xd`/`g`/`ll` the matching [T, Dt] slices. Returns (q, dmu,
    dpre), all [T, Dt]."""
    mu = jnp.dot(xm, wm_blk, preferred_element_type=jnp.float32) + bm_vec
    pre = jnp.dot(xm, ws_blk, preferred_element_type=jnp.float32) + bs_vec
    sigma = jnp.where(pre > 0, pre + 1.0, jnp.exp(pre)) + 1e-15  # elu+1+eps
    z = (xd - mu) / sigma
    dens = -jnp.log(sigma) - _HALF_LOG_2PI - 0.5 * z * z
    # ll >= every t (the online logsumexp guarantees s >= 1), so exp <= 1.
    q = g * jnp.exp(dens + lp[:, None] - ll)  # [T, Dt]
    dmu = q * z / sigma
    dpre = q * ((z * z - 1.0) / sigma) * jnp.where(pre > 0, 1.0, jnp.exp(pre))
    return q, dmu, dpre


def _bwd_params_kernel(x_ref, xd_ref, g_ref, ll_ref, lp_ref, ws_ref, bs_ref,
                       wm_ref, bm_ref, dlp_ref, dws_ref, dbs_ref, dwm_ref,
                       dbm_ref):
    """Grid (K, d_tiles, rows): the row sweep is innermost so the [D, Dt]
    gradient accumulator blocks stay VMEM-resident across it. d(log_pi)
    needs the sum over ALL d, which conflicts with that residency order —
    it is emitted as per-d-tile partials summed by XLA (a [d_tiles, K, rows]
    f32 array, ~40 MB HBM at the production shapes — cheap next to the
    [B,P,D,K] the kernel exists to avoid)."""
    i = pl.program_id(2)  # row tile (innermost)
    md = wm_ref.dtype
    xm = x_ref[:].astype(md)  # [T, D] — full-width matmul input
    q, dmu, dpre = _component_terms(
        xm, xd_ref[:], g_ref[:], ll_ref[:], lp_ref[0, 0],
        ws_ref[0], bs_ref[0, 0], wm_ref[0], bm_ref[0, 0],
    )
    dlp_ref[0, 0, 0] = jnp.sum(q, axis=1)  # [T] — this d-tile's partial

    # weight grads: [D, T] @ [T, Dt] on the MXU (contract the row dim); bf16
    # operands + f32 accumulation — the same arithmetic XLA's default TPU
    # matmul precision applies to the einsum gradients.
    contract_rows = (((0,), (0,)), ((), ()))
    pwm = lax.dot_general(xm, dmu.astype(md), contract_rows,
                          preferred_element_type=jnp.float32)
    pws = lax.dot_general(xm, dpre.astype(md), contract_rows,
                          preferred_element_type=jnp.float32)
    pbm = jnp.sum(dmu, axis=0)   # [Dt]
    pbs = jnp.sum(dpre, axis=0)

    # out blocks are indexed by (K, d-tile) only → VMEM-resident across the
    # row sweep; init at the first row tile, accumulate afterwards.
    @pl.when(i == 0)
    def _():
        dwm_ref[0] = pwm
        dws_ref[0] = pws
        dbm_ref[0, 0] = pbm
        dbs_ref[0, 0] = pbs

    @pl.when(i != 0)
    def _():
        dwm_ref[0] += pwm
        dws_ref[0] += pws
        dbm_ref[0, 0] += pbm
        dbs_ref[0, 0] += pbs


def _bwd_x_dtiled_kernel(x_ref, xd_ref, g_ref, ll_ref, lp_ref, ws_ref,
                         bs_ref, wm_ref, bm_ref, dx_ref, dmu_sum_ref):
    """Wide-head (D > 1024) d(x): grid (row_tiles, d_tiles, K), K
    innermost. The matmul contributions dmu @ Wm^T + dpre @ Ws^T contract
    over the output-feature dim, so d-tiles partition the contraction and
    the full-width dx block accumulates across both inner sweeps. The
    elementwise direct term (-dmu at d == e) lives on this d-tile's
    columns only — it is emitted as a second accumulated output and
    subtracted in XLA (a lane-masked in-kernel update would need a
    dynamic lane scatter, which Mosaic rejects)."""
    j = pl.program_id(1)
    k = pl.program_id(2)
    md = wm_ref.dtype
    xm = x_ref[:].astype(md)
    _, dmu, dpre = _component_terms(
        xm, xd_ref[:], g_ref[:], ll_ref[:], lp_ref[0, 0],
        ws_ref[0], bs_ref[0, 0], wm_ref[0], bm_ref[0, 0],
    )
    contract_out = (((1,), (1,)), ((), ()))
    px = lax.dot_general(dmu.astype(md), wm_ref[0], contract_out,
                         preferred_element_type=jnp.float32)
    px += lax.dot_general(dpre.astype(md), ws_ref[0], contract_out,
                          preferred_element_type=jnp.float32)

    @pl.when((k == 0) & (j == 0))
    def _():
        dx_ref[:] = px

    @pl.when((k != 0) | (j != 0))
    def _():
        dx_ref[:] += px

    @pl.when(k == 0)
    def _():
        dmu_sum_ref[:] = dmu

    @pl.when(k != 0)
    def _():
        dmu_sum_ref[:] += dmu


def _bwd_x_kernel(x_ref, g_ref, ll_ref, lp_ref, ws_ref, bs_ref, wm_ref,
                  bm_ref, dx_ref):
    k = pl.program_id(1)  # component (innermost)
    md = wm_ref.dtype
    x = x_ref[:]
    _, dmu, dpre = _component_terms(
        x.astype(md), x, g_ref[:], ll_ref[:], lp_ref[0, 0],
        ws_ref[0], bs_ref[0, 0], wm_ref[0], bm_ref[0, 0],
    )
    # dx = dmu @ Wm^T + dpre @ Ws^T - dmu   (last term: d dens/dx at d == e)
    contract_out = (((1,), (1,)), ((), ()))
    px = lax.dot_general(dmu.astype(md), wm_ref[0], contract_out,
                         preferred_element_type=jnp.float32)
    px += lax.dot_general(dpre.astype(md), ws_ref[0], contract_out,
                          preferred_element_type=jnp.float32)
    px -= dmu

    @pl.when(k == 0)
    def _():
        dx_ref[:] = px

    @pl.when(k != 0)
    def _():
        dx_ref[:] += px


def _pad_args(x, log_pi, w_sigma, b_sigma, w_mu, b_mu, g, row_tile):
    """Shared K/row padding + component-major reshuffle for the backward
    kernels. Mirrors the forward's padding exactly (ops/pallas/gmm.py)."""
    b, p, d = x.shape
    k = log_pi.shape[-1]
    rows = b * p
    xr = x.reshape(rows, d).astype(jnp.float32)
    lpr = log_pi.reshape(rows, k).astype(jnp.float32)
    gr = g.reshape(rows, d).astype(jnp.float32)

    pad_k = (-k) % 8  # K is a major dim in every block — see ops/pallas/gmm.py
    if pad_k:
        lpr = jnp.pad(lpr, ((0, 0), (0, pad_k)), constant_values=_NEG_BIG)
        w_sigma = jnp.pad(w_sigma, ((0, pad_k), (0, 0), (0, 0)))
        b_sigma = jnp.pad(b_sigma, ((0, pad_k), (0, 0)))
        w_mu = jnp.pad(w_mu, ((0, pad_k), (0, 0), (0, 0)))
        b_mu = jnp.pad(b_mu, ((0, pad_k), (0, 0)))
    kp = k + pad_k

    row_tile = min(row_tile, ((rows + 7) // 8) * 8)
    row_tile = max(8, (row_tile // 8) * 8)
    pad_rows = (-rows) % row_tile
    if pad_rows:
        xr = jnp.pad(xr, ((0, pad_rows), (0, 0)))
        lpr = jnp.pad(lpr, ((0, pad_rows), (0, 0)))
        gr = jnp.pad(gr, ((0, pad_rows), (0, 0)))  # zero cotangent → zero q
    n_tiles = (rows + pad_rows) // row_tile
    return (xr, lpr, gr, w_sigma, b_sigma, w_mu, b_mu, rows, pad_rows, kp,
            pad_k, n_tiles, row_tile)


@functools.partial(
    jax.jit, static_argnames=("row_tile", "interpret", "matmul_dtype")
)
def _gmm_bwd_params(x, log_pi, w_sigma, b_sigma, w_mu, b_mu, ll, g,
                    row_tile=256, interpret=False,
                    matmul_dtype=jnp.float32):
    """d(log_pi), d(w_sigma), d(b_sigma), d(w_mu), d(b_mu). Kernel-facing
    layouts: weights [K, D, D], biases [K, D]; returns grads in the same.

    The output-feature dim is tiled (d_tile=256): two untiled f32 [D, D]
    gradient accumulators + double-buffered weight blocks alone exceed the
    v5e 16 MB scoped-VMEM limit at D=768 (measured compile reject at both
    row_tile 256 and 128); [D, 256] blocks bring the whole kernel to
    ~9 MB. x is passed twice — full-width for the head matmuls, d-tiled
    for the elementwise density terms."""
    b, p, d = x.shape
    k0 = log_pi.shape[-1]
    (xr, lpr, gr, ws, bs, wm, bm, rows, pad_rows, kp, pad_k, n_tiles,
     row_tile) = _pad_args(x, log_pi, w_sigma, b_sigma, w_mu, b_mu, g,
                           row_tile)
    llr = ll.reshape(rows, d).astype(jnp.float32)
    if pad_rows:
        llr = jnp.pad(llr, ((0, pad_rows), (0, 0)))
    ws_m = ws.astype(matmul_dtype)
    wm_m = wm.astype(matmul_dtype)
    # 256 fits the 16 MB scoped-VMEM budget up to D=1024; wide heads
    # (ResNet stage-3 D=2048) halve the tile again (measured-at-768 note:
    # the [D, Dt]-class blocks dominate the budget, so Dt is the lever).
    if d > 1024:
        d_tile = 128  # gate guarantees d % 128 == 0
    elif d % 256 == 0:
        d_tile = 256
    else:
        d_tile = d
    n_dt = d // d_tile

    comp_block = lambda kk, j, i: (kk, 0, 0)
    outs = pl.pallas_call(
        _bwd_params_kernel,
        out_shape=[
            jax.ShapeDtypeStruct((n_dt, kp, 1, rows + pad_rows), jnp.float32),
            jax.ShapeDtypeStruct((kp, d, d), jnp.float32),
            jax.ShapeDtypeStruct((kp, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((kp, d, d), jnp.float32),
            jax.ShapeDtypeStruct((kp, 1, d), jnp.float32),
        ],
        # row sweep innermost: the (K, d-tile) gradient blocks stay resident
        grid=(kp, n_dt, n_tiles),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda kk, j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, d_tile), lambda kk, j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, d_tile), lambda kk, j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, d_tile), lambda kk, j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, row_tile), lambda kk, j, i: (kk, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d_tile), lambda kk, j, i: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_tile), lambda kk, j, i: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d_tile), lambda kk, j, i: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_tile), lambda kk, j, i: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 1, row_tile), lambda kk, j, i: (j, kk, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d_tile), lambda kk, j, i: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_tile), lambda kk, j, i: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d_tile), lambda kk, j, i: (kk, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_tile), lambda kk, j, i: (kk, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * (rows + pad_rows) * d * d * kp,
            bytes_accessed=(kp * 4 * d * d + kp * n_tiles * 3 * row_tile * d)
            * 4,
            transcendentals=(rows + pad_rows) * d * kp * 2,
        ),
        interpret=interpret,
    )(xr, xr, gr, llr, lpr.T[:, None, :], ws_m, bs[:, None, :], wm_m,
      bm[:, None, :])
    dlp_t, dws, dbs, dwm, dbm = outs
    dlp_sum = jnp.sum(dlp_t, axis=0)  # over d-tiles
    dlp = dlp_sum[:, 0, :rows].T.reshape(b, p, kp)[..., :k0]
    return (dlp, dws[:k0], dbs[:k0, 0], dwm[:k0], dbm[:k0, 0])


@functools.partial(
    jax.jit, static_argnames=("row_tile", "interpret", "matmul_dtype")
)
def _gmm_bwd_x(x, log_pi, w_sigma, b_sigma, w_mu, b_mu, ll, g,
               row_tile=256, interpret=False, matmul_dtype=jnp.float32):
    """d(x) [B, P, D] — separate pallas_call so it is DCE'd when unused."""
    b, p, d = x.shape
    # VMEM fit for the full-width path: 4 row-major [rt, D] f32 blocks
    # (x, g, ll, dx) + 2 [1, D, D] weight blocks, everything double-buffered,
    # against a 14 MB budget (the 16 MB scoped limit minus Mosaic stack —
    # hardware-calibrated: D=1024 bf16 at rt=256 compiles to 18.06 MB and is
    # rejected; the reduced tile fits). When no rt >= 128 fits (lane
    # alignment floor), route to the d-tiled kernel instead of failing.
    wbytes = 2 if matmul_dtype == jnp.bfloat16 else 4
    half_budget = 14 * 1024 * 1024 // 2
    fw_rt = (half_budget - 2 * d * d * wbytes) // (4 * d * 4)
    use_dtiled = d % 128 == 0 and (d > 1024 or fw_rt < 128)
    if not use_dtiled:
        row_tile = min(row_tile, max(128, (fw_rt // 128) * 128))
    (xr, lpr, gr, ws, bs, wm, bm, rows, pad_rows, kp, pad_k, n_tiles,
     row_tile) = _pad_args(x, log_pi, w_sigma, b_sigma, w_mu, b_mu, g,
                           row_tile)
    llr = ll.reshape(rows, d).astype(jnp.float32)
    if pad_rows:
        llr = jnp.pad(llr, ((0, pad_rows), (0, 0)))
    ws_m = ws.astype(matmul_dtype)
    wm_m = wm.astype(matmul_dtype)

    if use_dtiled:
        d_tile = 128  # gate guarantees d % 128 == 0
        n_dt = d // d_tile
        dx, dmu_sum = pl.pallas_call(
            _bwd_x_dtiled_kernel,
            out_shape=[
                jax.ShapeDtypeStruct((rows + pad_rows, d), jnp.float32),
                jax.ShapeDtypeStruct((rows + pad_rows, d), jnp.float32),
            ],
            grid=(n_tiles, n_dt, kp),  # K innermost (see kernel docstring)
            in_specs=[
                pl.BlockSpec((row_tile, d), lambda i, j, kk: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_tile, d_tile), lambda i, j, kk: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_tile, d_tile), lambda i, j, kk: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_tile, d_tile), lambda i, j, kk: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, row_tile), lambda i, j, kk: (kk, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, d_tile), lambda i, j, kk: (kk, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d_tile), lambda i, j, kk: (kk, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d, d_tile), lambda i, j, kk: (kk, 0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, d_tile), lambda i, j, kk: (kk, 0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((row_tile, d), lambda i, j, kk: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((row_tile, d_tile), lambda i, j, kk: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            cost_estimate=pl.CostEstimate(
                flops=4 * 2 * (rows + pad_rows) * d * d * kp,
                bytes_accessed=(kp * 2 * d * d
                                + n_tiles * 4 * row_tile * d) * 4,
                transcendentals=(rows + pad_rows) * d * kp * 2,
            ),
            interpret=interpret,
        )(xr, xr, gr, llr, lpr.T[:, None, :], ws_m, bs[:, None, :], wm_m,
          bm[:, None, :])
        dx = dx - dmu_sum  # the elementwise direct term, full-width in XLA
        return dx[:rows].reshape(b, p, d)

    comp_block = lambda i, kk: (kk, 0, 0)
    dx = pl.pallas_call(
        _bwd_x_kernel,
        out_shape=jax.ShapeDtypeStruct((rows + pad_rows, d), jnp.float32),
        grid=(n_tiles, kp),  # K sweep innermost: dx tile stays resident
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, d), lambda i, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_tile, d), lambda i, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, row_tile), lambda i, kk: (kk, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), comp_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), comp_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), comp_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), comp_block, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, d), lambda i, kk: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * (rows + pad_rows) * d * d * kp,
            bytes_accessed=(kp * 2 * d * d + n_tiles * 4 * row_tile * d) * 4,
            transcendentals=(rows + pad_rows) * d * kp * 2,
        ),
        interpret=interpret,
    )(xr, gr, llr, lpr.T[:, None, :], ws_m, bs[:, None, :], wm_m,
      bm[:, None, :])
    return dx[:rows].reshape(b, p, d)


# ---------------------------------------------------------------------------
# custom-VJP wrapper (param layout: w [D, D, K], b [D, K], log_pi [B, P, K])
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _gmm_ll_train(row_tile, interpret, matmul_dtype, x, log_pi, w_sigma,
                  b_sigma, w_mu, b_mu):
    ll, _ = _gmm_ll_train_fwd(
        row_tile, interpret, matmul_dtype, x, log_pi, w_sigma, b_sigma,
        w_mu, b_mu,
    )
    return ll


def _gmm_ll_train_fwd(row_tile, interpret, matmul_dtype, x, log_pi, w_sigma,
                      b_sigma, w_mu, b_mu):
    ll = gmm_log_likelihood_pallas(
        x, log_pi,
        jnp.moveaxis(w_sigma, -1, 0), jnp.moveaxis(b_sigma, -1, 0),
        jnp.moveaxis(w_mu, -1, 0), jnp.moveaxis(b_mu, -1, 0),
        row_tile=row_tile, interpret=interpret, matmul_dtype=matmul_dtype,
    )
    return ll, (x, log_pi, w_sigma, b_sigma, w_mu, b_mu, ll)


def _gmm_ll_train_bwd(row_tile, interpret, matmul_dtype, res, g):
    x, log_pi, w_sigma, b_sigma, w_mu, b_mu, ll = res
    ws_k = jnp.moveaxis(w_sigma, -1, 0)
    bs_k = jnp.moveaxis(b_sigma, -1, 0)
    wm_k = jnp.moveaxis(w_mu, -1, 0)
    bm_k = jnp.moveaxis(b_mu, -1, 0)
    dlp, dws, dbs, dwm, dbm = _gmm_bwd_params(
        x, log_pi, ws_k, bs_k, wm_k, bm_k, ll, g,
        row_tile=row_tile, interpret=interpret, matmul_dtype=matmul_dtype,
    )
    # separate pallas_call: dead (and deleted by XLA) when the caller does
    # not request feature gradients — the frozen-trunk trainers.
    dx = _gmm_bwd_x(
        x, log_pi, ws_k, bs_k, wm_k, bm_k, ll, g,
        row_tile=row_tile, interpret=interpret, matmul_dtype=matmul_dtype,
    )
    return (
        dx.astype(x.dtype),
        dlp.astype(log_pi.dtype),
        jnp.moveaxis(dws, 0, -1).astype(w_sigma.dtype),
        jnp.moveaxis(dbs, 0, -1).astype(b_sigma.dtype),
        jnp.moveaxis(dwm, 0, -1).astype(w_mu.dtype),
        jnp.moveaxis(dbm, 0, -1).astype(b_mu.dtype),
    )


_gmm_ll_train.defvjp(_gmm_ll_train_fwd, _gmm_ll_train_bwd)


def gmm_log_likelihood_train(
    x: Array,          # [B, P, D] f32
    log_pi: Array,     # [B, P, K] (log mixture weights, differentiable)
    w_sigma: Array,    # [D, D, K] (GaussianMDN param layout)
    b_sigma: Array,    # [D, K]
    w_mu: Array,       # [D, D, K]
    b_mu: Array,       # [D, K]
    row_tile: int = 256,
    interpret: bool = False,
    matmul_dtype=jnp.float32,
) -> Array:
    """Differentiable fused per-feature log-likelihood [B, P, D].

    Same math as ops/gmm.fused_log_likelihood (after its pi head), with a
    Pallas forward + Pallas backward in which no [.., K]-extent temp ever
    reaches HBM. matmul_dtype=bf16 matches JAX's default TPU matmul
    precision (f32 operands are rounded to bf16 on the MXU either way)."""
    return _gmm_ll_train(
        row_tile, interpret, matmul_dtype,
        x.astype(jnp.float32), log_pi.astype(jnp.float32),
        w_sigma.astype(jnp.float32), b_sigma.astype(jnp.float32),
        w_mu.astype(jnp.float32), b_mu.astype(jnp.float32),
    )


def use_pallas_gmm_train(d: int) -> bool:
    """Pallas GMM *training* path: default follows the scoring default
    (on for TPU targets) for lane-aligned head widths that fit the backward
    kernels' VMEM budget; VITAD_PALLAS_GMM_TRAIN=0/1 overrides."""
    flag = os.environ.get("VITAD_PALLAS_GMM_TRAIN")
    if flag is not None:
        return flag == "1"
    # Every lane-aligned width up to the D=2048 ResNet stage-3 envelope is
    # a measured train-step winner on hardware (tools/bench_train.py,
    # B=32, live feature grads): D=768 cached-MDN +82-114%, D=1024 stage-2
    # 581 vs 418 img/s (+39%), D=2048 stage-3 389.9 vs 371.7 (+5%) — the
    # wide widths run the output-feature-tiled kernel variants. (Scoring
    # at D=2048 is a different story: the d-tiled forward LOSES to the XLA
    # scan at eval shapes, so pipeline/eval.py gates it off there.)
    if d % 128 != 0 or d > 2048:
        return False
    return use_pallas_gmm()
