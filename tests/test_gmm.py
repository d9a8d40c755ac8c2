"""GMM/MDN math: closed-form golden values, fused-vs-dense equivalence,
gradient health. Mirrors reference semantics from
src/classes/MixtureDensityNetwork.py:35-102."""

import math

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.models.mdn import GaussianMDN
from vit_ad_tpu.ops import gmm


def _numpy_log_likelihood(x, pi_logits, sigma, mu):
    """Independent NumPy implementation of the reference formula (softmax
    limit, no gumbel noise)."""
    e = np.exp(pi_logits - pi_logits.max(-1, keepdims=True))
    softmax_pi = e / e.sum(-1, keepdims=True)
    log_pi = np.log(softmax_pi + 1e-15)  # [B,P,K]
    xk = x[..., None]
    dens = (
        -np.log(sigma)
        - 0.5 * math.log(2 * math.pi)
        - 0.5 * ((xk - mu) / sigma) ** 2
    )  # [B,P,D,K]
    t = log_pi[:, :, None, :] + dens
    m = t.max(-1, keepdims=True)
    return (m + np.log(np.exp(t - m).sum(-1, keepdims=True)))[..., 0]


def test_dense_log_likelihood_matches_numpy(rng):
    b, p, d, k = 2, 5, 7, 11
    x = rng.normal(size=(b, p, d)).astype(np.float32)
    pi = rng.normal(size=(b, p, k)).astype(np.float32)
    sigma = (rng.uniform(0.5, 2.0, size=(b, p, d, k))).astype(np.float32)
    mu = rng.normal(size=(b, p, d, k)).astype(np.float32)

    got = gmm.log_likelihood_dense(
        jnp.asarray(x), jnp.asarray(pi), jnp.asarray(sigma), jnp.asarray(mu)
    )
    want = _numpy_log_likelihood(x, pi, sigma, mu)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_single_gaussian_closed_form():
    # K=1: log-likelihood reduces to a plain normal log-density
    # (log(pi~ + eps) with pi~=1 adds log(1+1e-15) ~ 0).
    x = jnp.asarray([[[0.5]]])
    pi = jnp.zeros((1, 1, 1))
    sigma = jnp.full((1, 1, 1, 1), 2.0)
    mu = jnp.full((1, 1, 1, 1), -0.5)
    got = float(gmm.log_likelihood_dense(x, pi, sigma, mu)[0, 0, 0])
    want = -math.log(2.0) - 0.5 * math.log(2 * math.pi) - 0.5 * (1.0 / 2.0) ** 2
    assert got == pytest.approx(want, rel=1e-6)


@pytest.mark.parametrize("k,k_chunk", [(11, 4), (8, 8), (3, 8), (16, 5)])
def test_fused_matches_dense_through_module(rng, k, k_chunk):
    b, p, d = 2, 6, 16
    model = GaussianMDN(features=d, num_gaussians=k, k_chunk=k_chunk)
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    params = model.init(jax.random.key(0), x)

    out = model.apply(params, x)  # materialized pi/sigma/mu
    dense = gmm.log_likelihood_dense(x, out.pi, out.sigma, out.mu)
    fused = model.apply(params, x, method=GaussianMDN.log_likelihood)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(dense), rtol=1e-4, atol=1e-4
    )


def test_fused_gradients_finite_and_match_dense(rng):
    b, p, d, k = 2, 4, 8, 10
    model = GaussianMDN(features=d, num_gaussians=k, k_chunk=3)
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    params = model.init(jax.random.key(1), x)

    def loss_fused(pr):
        return model.apply(pr, x, method=GaussianMDN.loss)

    def loss_dense(pr):
        out = model.apply(pr, x)
        ll = gmm.log_likelihood_dense(x, out.pi, out.sigma, out.mu)
        return gmm.mdn_loss_from_log_likelihood(ll)

    g_fused = jax.grad(loss_fused)(params)
    g_dense = jax.grad(loss_dense)(params)
    flat_f, _ = jax.flatten_util.ravel_pytree(g_fused)
    flat_d, _ = jax.flatten_util.ravel_pytree(g_dense)
    assert np.all(np.isfinite(np.asarray(flat_f)))
    np.testing.assert_allclose(
        np.asarray(flat_f), np.asarray(flat_d), rtol=2e-3, atol=2e-4
    )


def test_gumbel_path_is_stochastic_but_finite(rng):
    b, p, d, k = 1, 3, 4, 6
    model = GaussianMDN(features=d, num_gaussians=k)
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    params = model.init(jax.random.key(2), x)
    ll1 = model.apply(params, x, rng=jax.random.key(3),
                      method=GaussianMDN.log_likelihood)
    ll2 = model.apply(params, x, rng=jax.random.key(4),
                      method=GaussianMDN.log_likelihood)
    assert np.all(np.isfinite(np.asarray(ll1)))
    assert not np.allclose(np.asarray(ll1), np.asarray(ll2))


def test_probability_map_range(rng):
    ll = jnp.asarray(rng.normal(size=(3, 5, 7)).astype(np.float32))
    pm = gmm.probability_map(ll)
    pm = np.asarray(pm)
    assert pm.shape == (3, 5)
    assert pm.max() == pytest.approx(1.0, abs=1e-6)
    assert pm.min() >= 0.0


def test_eval_fallback_bypasses_train_kernel_dispatch(rng, monkeypatch):
    """pipeline/eval._mdn_loglik's non-Pallas branch must call the XLA scan
    DIRECTLY: GaussianMDN.log_likelihood dispatches wide heads to the Pallas
    TRAIN forward (a measured train-step winner but 4x slower than the scan
    for scoring-only at stage-3 eval shapes — PERF.md round 3), so eval
    routing through it would silently regress D=2048 scoring."""
    from vit_ad_tpu.config import HyperParams
    from vit_ad_tpu.pipeline.eval import _mdn_loglik

    b, p, d, k = 1, 4, 8, 3
    model = GaussianMDN(features=d, num_gaussians=k)
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    params = model.init(jax.random.key(0), x)
    want = np.asarray(model.apply(params, x,
                                  method=GaussianMDN.log_likelihood))

    def boom(*a, **kw):
        raise AssertionError("eval fallback must not route through "
                             "GaussianMDN.log_likelihood")

    monkeypatch.setattr(GaussianMDN, "log_likelihood", boom)
    got = np.asarray(_mdn_loglik(model, params, x, HyperParams()))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
