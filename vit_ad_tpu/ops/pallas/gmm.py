"""Pallas TPU kernel: fused GMM per-feature log-likelihood.

The MDN head's memory hot spot is the [B, P, D, K] mu/sigma tensor the
reference materializes in HBM (reference src/pipeline/LearnerMDN.py:147-169,
src/classes/MixtureDensityNetwork.py:151-171). The XLA path in ops/gmm.py
already streams K in chunks; this kernel goes further — mu/sigma for one
mixture component live only in VMEM, consumed by an online logsumexp the
moment they are produced. HBM traffic is x (once per component sweep), the
weight slices (once per row tile), and the [rows, D] accumulator output.

Layout: weights arrive [K, D, D] (component-major) so each grid step DMAs a
contiguous [1, D, D] slice; mixture log-weights arrive precomputed [rows, K]
(softmax over K is trivial XLA work). Grid = (row_tiles, K), K innermost:
the VMEM accumulators persist across the K sweep of one row tile and reset
at k == 0.

Used on the inference/scoring path; training uses the custom-VJP wrapper in
ops/pallas/gmm_train.py (same forward kernel, Pallas backward) on TPU and
the differentiable XLA scan (ops/gmm.fused_log_likelihood) elsewhere.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
_NEG_BIG = -1e30


def _kernel(x_ref, log_pi_ref, w_sigma_ref, b_sigma_ref, w_mu_ref, b_mu_ref,
            out_ref, m_scratch, s_scratch):
    # log_pi arrives component-major ([K, 1, rows] blocks): indexing a VMEM
    # column by the grid id would be a dynamic lane gather, which the Mosaic
    # compiler rejects.
    k = pl.program_id(1)
    num_k = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_BIG)
        s_scratch[:] = jnp.zeros_like(s_scratch)

    x = x_ref[:]  # [T, D] f32
    # component-k affine heads: [T, D] @ [D, D] on the MXU. When the weights
    # arrive bf16 (matmul_dtype=bf16) the MXU runs at full rate with f32
    # accumulation; all elementwise math stays f32.
    xm = x.astype(w_mu_ref.dtype)
    mu = jnp.dot(xm, w_mu_ref[0], preferred_element_type=jnp.float32) + b_mu_ref[0, 0]
    pre = jnp.dot(xm, w_sigma_ref[0], preferred_element_type=jnp.float32) + b_sigma_ref[0, 0]
    sigma = jnp.where(pre > 0, pre + 1.0, jnp.exp(pre)) + 1e-15  # elu+1+eps

    dens = (
        -jnp.log(sigma)
        - _HALF_LOG_2PI
        - 0.5 * jnp.square((x - mu) / sigma)
    )
    t = dens + log_pi_ref[0, 0][:, None]  # [T, D]

    m_old = m_scratch[:]
    m_new = jnp.maximum(m_old, t)
    s_scratch[:] = s_scratch[:] * jnp.exp(m_old - m_new) + jnp.exp(t - m_new)
    m_scratch[:] = m_new

    @pl.when(k == num_k - 1)
    def _():
        out_ref[:] = m_scratch[:] + jnp.log(s_scratch[:])


def _kernel_dtiled(x_ref, xd_ref, log_pi_ref, w_sigma_ref, b_sigma_ref,
                   w_mu_ref, b_mu_ref, out_ref, m_scratch, s_scratch):
    """Output-feature-tiled variant for wide heads (D > 1024): a full
    [1, D, D] weight block would exceed the 16 MB scoped-VMEM limit, but
    the GMM density is elementwise in the output feature, so weight blocks
    are [1, D, Dt] lane-slices and only the matmul input x needs full
    width (passed twice: full for the dots, d-sliced for the density).
    Grid (row_tiles, d_tiles, K), K innermost — the online-logsumexp
    scratch belongs to one (row, d-tile) block and resets at k == 0."""
    k = pl.program_id(2)
    num_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        m_scratch[:] = jnp.full_like(m_scratch, _NEG_BIG)
        s_scratch[:] = jnp.zeros_like(s_scratch)

    xm = x_ref[:].astype(w_mu_ref.dtype)  # [T, D]
    xd = xd_ref[:]                        # [T, Dt] f32
    mu = jnp.dot(xm, w_mu_ref[0], preferred_element_type=jnp.float32) + b_mu_ref[0, 0]
    pre = jnp.dot(xm, w_sigma_ref[0], preferred_element_type=jnp.float32) + b_sigma_ref[0, 0]
    sigma = jnp.where(pre > 0, pre + 1.0, jnp.exp(pre)) + 1e-15  # elu+1+eps

    dens = -jnp.log(sigma) - _HALF_LOG_2PI - 0.5 * jnp.square((xd - mu) / sigma)
    t = dens + log_pi_ref[0, 0][:, None]  # [T, Dt]

    m_old = m_scratch[:]
    m_new = jnp.maximum(m_old, t)
    s_scratch[:] = s_scratch[:] * jnp.exp(m_old - m_new) + jnp.exp(t - m_new)
    m_scratch[:] = m_new

    @pl.when(k == num_k - 1)
    def _():
        out_ref[:] = m_scratch[:] + jnp.log(s_scratch[:])


@functools.partial(
    jax.jit,
    static_argnames=("row_tile", "interpret", "matmul_dtype", "wide_d_tile"),
)
def gmm_log_likelihood_pallas(
    x: Array,          # [B, P, D] f32
    log_pi: Array,     # [B, P, K] f32 (log mixture weights, pre-softmaxed)
    w_sigma: Array,    # [K, D, D] f32
    b_sigma: Array,    # [K, D]
    w_mu: Array,       # [K, D, D]
    b_mu: Array,       # [K, D]
    row_tile: int = 256,
    interpret: bool = False,
    matmul_dtype=jnp.float32,
    wide_d_tile: int = 128,
) -> Array:
    """Returns per-feature log-likelihood [B, P, D].

    matmul_dtype=bfloat16 runs the two [T,D]@[D,D] head matmuls on the MXU in
    bf16 with f32 accumulation (scoring is rank-based, so the small mu/sigma
    rounding does not move AUROC); density math stays f32 either way."""
    b, p, d = x.shape
    k = log_pi.shape[-1]
    rows = b * p
    xr = x.reshape(rows, d).astype(jnp.float32)
    lpr = log_pi.reshape(rows, k).astype(jnp.float32)
    w_sigma = w_sigma.astype(matmul_dtype)
    w_mu = w_mu.astype(matmul_dtype)

    # K is only ever a major array dim here (log_pi travels pre-transposed
    # [K, 1, rows]; weights [K, D, D]) — no block minor dim depends on it,
    # so a sublane-multiple pad suffices. Round 2 padded K to 128 out of
    # lane-constraint caution, which made K=100 run 128 grid steps and
    # K=150 run 256: measured dead-component cost 54.0→47.5 ms at K=100
    # (-12%) and 102→65.2 ms at K=150 (-36%) on v5e, scores bitwise
    # identical. Padded components carry -inf mixture weight (their
    # exp contribution is exactly 0 in the online logsumexp; sigma =
    # elu(0)+1 = 1 keeps dens finite).
    pad_k = (-k) % 8
    if pad_k:
        lpr = jnp.pad(lpr, ((0, 0), (0, pad_k)), constant_values=_NEG_BIG)
        w_sigma = jnp.pad(w_sigma, ((0, pad_k), (0, 0), (0, 0)))
        b_sigma = jnp.pad(b_sigma, ((0, pad_k), (0, 0)))
        w_mu = jnp.pad(w_mu, ((0, pad_k), (0, 0), (0, 0)))
        b_mu = jnp.pad(b_mu, ((0, pad_k), (0, 0)))
        k = k + pad_k

    # sublane constraint: the row tile itself must be a multiple of 8
    row_tile = min(row_tile, ((rows + 7) // 8) * 8)
    row_tile = max(8, (row_tile // 8) * 8)
    pad_rows = (-rows) % row_tile
    if pad_rows:
        xr = jnp.pad(xr, ((0, pad_rows), (0, 0)))
        lpr = jnp.pad(lpr, ((0, pad_rows), (0, 0)))
    n_tiles = (rows + pad_rows) // row_tile

    if d > 1024:
        # wide heads (ResNet stage-3 D=2048): full [1, D, D] weight blocks
        # exceed the 16 MB scoped-VMEM limit — use the output-feature-tiled
        # kernel. Requires D % 128 == 0. For EVAL scoring this variant
        # loses to the XLA scan at stage-3 shapes (B=32, P=49 → 1568 rows;
        # PERF.md round 3), so pipeline/eval.py gates it off there
        # (VITAD_PALLAS_GMM=1 forces). It still serves as the forward of
        # the custom-VJP TRAIN kernel, where the full step is a measured
        # winner (gmm_train.use_pallas_gmm_train).
        d_tile = wide_d_tile if d % wide_d_tile == 0 else 128
        n_dt = d // d_tile
        out = pl.pallas_call(
            _kernel_dtiled,
            out_shape=jax.ShapeDtypeStruct((rows + pad_rows, d), jnp.float32),
            grid=(n_tiles, n_dt, k),
            in_specs=[
                pl.BlockSpec((row_tile, d), lambda i, j, kk: (i, 0),
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
            out_specs=pl.BlockSpec((row_tile, d_tile),
                                   lambda i, j, kk: (i, j),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((row_tile, d_tile), jnp.float32),
                pltpu.VMEM((row_tile, d_tile), jnp.float32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * 2 * rows * d * d * k,
                bytes_accessed=(n_tiles * k * 2 * d * d + 2 * rows * d) * 4,
                transcendentals=rows * d * k * 2,
            ),
            interpret=interpret,
        )(xr, xr, lpr.T[:, None, :], w_sigma, b_sigma[:, None, :], w_mu,
          b_mu[:, None, :])
        return out[:rows].reshape(b, p, d)

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rows + pad_rows, d), jnp.float32),
        grid=(n_tiles, k),
        in_specs=[
            pl.BlockSpec((row_tile, d), lambda i, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, row_tile), lambda i, kk: (kk, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda i, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            # biases as [K, 1, D]: a (1, 1, D) block satisfies the TPU
            # sublane rule (block dim == array dim on the middle axis)
            pl.BlockSpec((1, 1, d), lambda i, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, d), lambda i, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i, kk: (kk, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, d), lambda i, kk: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((row_tile, d), jnp.float32),
            pltpu.VMEM((row_tile, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * rows * d * d * k,
            bytes_accessed=(n_tiles * k * 2 * d * d + 2 * rows * d) * 4,
            transcendentals=rows * d * k * 2,
        ),
        interpret=interpret,
    )(xr, lpr.T[:, None, :], w_sigma, b_sigma[:, None, :], w_mu, b_mu[:, None, :])
    return out[:rows].reshape(b, p, d)


def mdn_log_likelihood_pallas(
    x: Array,
    w_pi: Array, b_pi: Array,        # [D, K], [K]
    w_sigma: Array, b_sigma: Array,  # [D, D, K], [D, K] (param layout)
    w_mu: Array, b_mu: Array,
    interpret: bool = False,
    matmul_dtype=jnp.float32,
) -> Array:
    """Convenience wrapper taking GaussianMDN's param layout (deterministic
    softmax mixture weights — the eval path).

    matmul_dtype=bf16 is the right TPU setting: JAX's default matmul
    precision on TPU already rounds f32 matmul operands to bf16, so bf16
    weight blocks are bitwise-identical in output (verified on hardware)
    while halving the per-tile weight DMA — measured 95→54 ms (K=100) and
    136→102 ms (K=150) vs the XLA scan at batch 128, D=768."""
    xf = x.astype(jnp.float32)
    logits = jnp.einsum("bpd,dk->bpk", xf, w_pi.astype(jnp.float32)) + b_pi
    log_pi = jnp.log(jax.nn.softmax(logits, axis=-1) + 1e-15)
    return gmm_log_likelihood_pallas(
        xf,
        log_pi,
        jnp.moveaxis(w_sigma, -1, 0).astype(jnp.float32),
        jnp.moveaxis(b_sigma, -1, 0).astype(jnp.float32),
        jnp.moveaxis(w_mu, -1, 0).astype(jnp.float32),
        jnp.moveaxis(b_mu, -1, 0).astype(jnp.float32),
        interpret=interpret,
        matmul_dtype=matmul_dtype,
    )


def use_pallas_gmm() -> bool:
    """Pallas GMM scoring is the default on TPU targets; VITAD_PALLAS_GMM=0
    forces the XLA scan, =1 forces the kernel (interpret mode on CPU)."""
    import os

    flag = os.environ.get("VITAD_PALLAS_GMM")
    if flag is not None:
        return flag == "1"
    from vit_ad_tpu.ops.pallas.window_attention import _target_platform

    return _target_platform() == "tpu"
