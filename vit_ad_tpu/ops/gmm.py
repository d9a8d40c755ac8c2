"""Gaussian-mixture density math for the MDN anomaly head.

Reference semantics (reference src/classes/MixtureDensityNetwork.py:35-102):

  log N(x; mu, sigma)      = -log(sigma) - 0.5*log(2*pi) - 0.5*((x-mu)/sigma)^2
  log_likelihood[b,p,d]    = logsumexp_k( log(pi~[b,p,k] + 1e-15)
                                          + log N(x[b,p,d]; mu[b,p,d,k], sigma[b,p,d,k]) )
      where pi~ = gumbel_softmax(pi_logits, tau=1)  (stochastic, also at eval)
  mdn_loss                 = -mean(log_likelihood)
  probability_map[b,p]     = exp(mean_d ll[b,p,d] - max over the whole batch)

i.e. an independent 1-D mixture per feature dimension, sharing per-patch
mixture weights.

TPU-first design: the reference materializes mu/sigma as [B, P, D, K] tensors
(its memory hot spot, reference src/pipeline/LearnerMDN.py:147-169). Here the
fused path streams over K in chunks with an online (running max / running sum)
logsumexp, so peak memory is [B, P, D, Kc] for a small chunk Kc while the
matmuls stay large enough to saturate the MXU. Each chunk is rematerialized in
the backward pass via jax.checkpoint instead of being stored.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
# Large-but-finite stand-in for -inf; exp(_NEG_BIG - anything_reasonable) == 0
# exactly in f32 while every intermediate stays finite (NaN-safe gradients).
_NEG_BIG = -1e30


def log_gaussian_density(sigma: Array, mu: Array, x: Array) -> Array:
    """Elementwise log of the univariate normal density (parity with
    reference MixtureDensityNetwork.py:35-46)."""
    return -jnp.log(sigma) - _HALF_LOG_2PI - 0.5 * jnp.square((x - mu) / sigma)


def mixture_log_weights(
    pi_logits: Array, rng: Optional[jax.Array] = None, tau: float = 1.0
) -> Array:
    """log(softmax-or-gumbel-softmax(pi) + 1e-15).

    With `rng` given this matches the reference's gumbel_softmax(tau=1)
    (reference MixtureDensityNetwork.py:62); with rng=None it is the
    deterministic softmax limit — used at eval where the reference's
    eval-time sampling noise is a documented quirk we do not replicate
    (SURVEY.md §7 hard part (d))."""
    logits = pi_logits.astype(jnp.float32)
    if rng is not None:
        u = jax.random.uniform(
            rng, logits.shape, dtype=logits.dtype, minval=1e-20, maxval=1.0
        )
        gumbel = -jnp.log(-jnp.log(u))
        logits = (logits + gumbel) / tau
    return jnp.log(jax.nn.softmax(logits, axis=-1) + 1e-15)


def log_likelihood_dense(
    x: Array, pi_logits: Array, sigma: Array, mu: Array,
    rng: Optional[jax.Array] = None, tau: float = 1.0,
) -> Array:
    """Materialized-form log-likelihood — the reference's formulation
    (MixtureDensityNetwork.py:49-72). Shapes: x [B,P,D], pi [B,P,K],
    sigma/mu [B,P,D,K] → returns [B,P,D]. Used for tests and tiny models."""
    log_pi = mixture_log_weights(pi_logits, rng, tau)  # [B,P,K]
    dens = log_gaussian_density(sigma, mu, x[..., None])  # [B,P,D,K]
    return jax.nn.logsumexp(log_pi[:, :, None, :] + dens, axis=-1)


def fused_log_likelihood(
    x: Array,
    w_pi: Array, b_pi: Array,
    w_sigma: Array, b_sigma: Array,
    w_mu: Array, b_mu: Array,
    rng: Optional[jax.Array] = None,
    tau: float = 1.0,
    k_chunk: int = 8,
) -> Array:
    """Fused MDN head + mixture log-likelihood, streaming over K.

    x:        [B, P, D] patch features
    w_pi:     [D, K]    b_pi:    [K]
    w_sigma:  [D, D, K] b_sigma: [D, K]   (sigma = elu(..)+1+1e-15)
    w_mu:     [D, D, K] b_mu:    [D, K]
    returns   [B, P, D] per-feature log-likelihood.

    Never materializes [B,P,D,K]; peak temp is [B,P,D,k_chunk].
    """
    b, p, d = x.shape
    k = w_pi.shape[-1]
    k_chunk = min(k_chunk, k)
    # Pad K to a multiple of k_chunk with -inf mixture weights.
    n_chunks = -(-k // k_chunk)
    k_pad = n_chunks * k_chunk

    xf = x.astype(jnp.float32)
    pi_logits = jnp.einsum("bpd,dk->bpk", xf, w_pi.astype(jnp.float32)) + b_pi
    log_pi = mixture_log_weights(pi_logits, rng, tau)  # [B,P,K]
    if k_pad != k:
        # Large-finite sentinel instead of -inf: keeps every exp() argument
        # finite so no NaNs can leak through scan gradients.
        log_pi = jnp.pad(log_pi, ((0, 0), (0, 0), (0, k_pad - k)),
                         constant_values=_NEG_BIG)
        w_sigma = jnp.pad(w_sigma, ((0, 0), (0, 0), (0, k_pad - k)))
        b_sigma = jnp.pad(b_sigma, ((0, 0), (0, k_pad - k)))
        w_mu = jnp.pad(w_mu, ((0, 0), (0, 0), (0, k_pad - k)))
        b_mu = jnp.pad(b_mu, ((0, 0), (0, k_pad - k)))

    # [n_chunks, ...] chunk-major layouts for scan.
    log_pi_c = jnp.moveaxis(log_pi.reshape(b, p, n_chunks, k_chunk), 2, 0)
    w_sigma_c = jnp.moveaxis(w_sigma.reshape(d, d, n_chunks, k_chunk), 2, 0)
    b_sigma_c = jnp.moveaxis(b_sigma.reshape(d, n_chunks, k_chunk), 1, 0)
    w_mu_c = jnp.moveaxis(w_mu.reshape(d, d, n_chunks, k_chunk), 2, 0)
    b_mu_c = jnp.moveaxis(b_mu.reshape(d, n_chunks, k_chunk), 1, 0)

    @jax.checkpoint
    def chunk_terms(xf, lp, ws, bs, wm, bm):
        # sigma/mu for this chunk: [B,P,D,Kc]
        sigma = jax.nn.elu(jnp.einsum("bpd,dek->bpek", xf, ws) + bs) + 1.0 + 1e-15
        mu = jnp.einsum("bpd,dek->bpek", xf, wm) + bm
        dens = log_gaussian_density(sigma, mu, xf[..., None])
        return lp[:, :, None, :] + dens  # [B,P,D,Kc]

    def step(carry, chunk):
        m, s = carry  # running max [B,P,D], running sum of exp [B,P,D]
        lp, ws, bs, wm, bm = chunk
        t = chunk_terms(xf, lp, ws, bs, wm, bm)
        cm = jnp.max(t, axis=-1)
        new_m = jnp.maximum(m, cm)
        s = s * jnp.exp(m - new_m) + jnp.sum(jnp.exp(t - new_m[..., None]), axis=-1)
        return (new_m, s), None

    init = (
        jnp.full((b, p, d), _NEG_BIG, dtype=jnp.float32),
        jnp.zeros((b, p, d), dtype=jnp.float32),
    )
    (m, s), _ = jax.lax.scan(
        step, init, (log_pi_c, w_sigma_c, b_sigma_c, w_mu_c, b_mu_c)
    )
    return m + jnp.log(s)


def mdn_loss_from_log_likelihood(ll: Array) -> Array:
    """NLL loss (reference MixtureDensityNetwork.py:100-102)."""
    return -jnp.mean(ll)


def probability_map(ll: Array) -> Array:
    """Per-patch probability map, normalized by the global (batch) max
    (reference MixtureDensityNetwork.py:75-97, incl. its per-batch
    normalization quirk — preserved because the downstream image score is a
    min over patches and AUROC is rank-based, so the shared shift cancels
    within a batch)."""
    per_patch = jnp.mean(ll, axis=2)  # [B,P]
    return jnp.exp(per_patch - jnp.max(per_patch))
