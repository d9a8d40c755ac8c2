"""Differentiable Pallas GMM (training kernel) vs the XLA reference path.

All kernel runs use interpret mode (CPU backend). Gradient parity is
checked against jax.grad of the dense/materialized formulation — the same
oracle the XLA K-chunk scan is tested against in test_gmm.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.models.mdn import GaussianMDN
from vit_ad_tpu.ops import gmm
from vit_ad_tpu.ops.pallas.gmm_train import (
    gmm_log_likelihood_train,
    use_pallas_gmm_train,
)


def _rand_args(rng, b, p, d, k):
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    logits = jnp.asarray(rng.normal(size=(b, p, k)).astype(np.float32))
    log_pi = jnp.log(jax.nn.softmax(logits, -1) + 1e-15)
    w_s = jnp.asarray(rng.normal(size=(d, d, k)).astype(np.float32) * 0.2)
    b_s = jnp.asarray(rng.normal(size=(d, k)).astype(np.float32) * 0.1)
    w_m = jnp.asarray(rng.normal(size=(d, d, k)).astype(np.float32) * 0.2)
    b_m = jnp.asarray(rng.normal(size=(d, k)).astype(np.float32) * 0.1)
    return x, log_pi, w_s, b_s, w_m, b_m


def _dense_ll(x, log_pi, w_s, b_s, w_m, b_m):
    sigma = jax.nn.elu(jnp.einsum("bpd,dek->bpek", x, w_s) + b_s) + 1 + 1e-15
    mu = jnp.einsum("bpd,dek->bpek", x, w_m) + b_m
    dens = gmm.log_gaussian_density(sigma, mu, x[..., None])
    return jax.nn.logsumexp(log_pi[:, :, None, :] + dens, axis=-1)


@pytest.mark.parametrize("b,p,d,k", [(2, 6, 16, 5), (1, 4, 8, 3)])
def test_train_forward_matches_dense(rng, b, p, d, k):
    args = _rand_args(rng, b, p, d, k)
    got = gmm_log_likelihood_train(*args, interpret=True)
    want = _dense_ll(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("row_tile", [256, 2])
def test_train_gradients_match_dense(rng, row_tile):
    """All six cotangents (x, log_pi, both weight/bias pairs) vs autodiff of
    the dense formulation; row_tile=2 exercises row-tile accumulation."""
    b, p, d, k = 2, 5, 16, 3
    args = _rand_args(rng, b, p, d, k)

    def loss_pallas(*a):
        return -jnp.mean(
            gmm_log_likelihood_train(*a, row_tile=row_tile, interpret=True)
        )

    def loss_dense(*a):
        return -jnp.mean(_dense_ll(*a))

    got = jax.grad(loss_pallas, argnums=tuple(range(6)))(*args)
    want = jax.grad(loss_dense, argnums=tuple(range(6)))(*args)
    names = ["x", "log_pi", "w_sigma", "b_sigma", "w_mu", "b_mu"]
    for name, g_got, g_want in zip(names, got, want):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), rtol=2e-3, atol=2e-4,
            err_msg=name,
        )


def test_train_gradients_multi_d_tile(rng):
    """d=512 drives the params-backward kernel through n_dt=2 output-feature
    tiles (the VMEM-fitting path used at the production D=768)."""
    b, p, d, k = 1, 8, 512, 2
    args = _rand_args(rng, b, p, d, k)
    scale = 1.0 / np.sqrt(d)  # keep sigma in a sane range at wide D
    args = (args[0], args[1], args[2] * scale, args[3], args[4] * scale,
            args[5])

    def loss_pallas(*a):
        return -jnp.mean(gmm_log_likelihood_train(*a, interpret=True))

    def loss_dense(*a):
        return -jnp.mean(_dense_ll(*a))

    got = jax.grad(loss_pallas, argnums=(1, 2, 3))(*args)
    want = jax.grad(loss_dense, argnums=(1, 2, 3))(*args)
    for g_got, g_want in zip(got, want):
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=2e-3, atol=3e-4)


def test_mdn_dispatch_parity(rng, monkeypatch):
    """VITAD_PALLAS_GMM_TRAIN=1 routes GaussianMDN.log_likelihood through
    the kernel (interpret on CPU); value AND parameter gradients must match
    the XLA scan path, including the gumbel-rng training branch."""
    b, p, d, k = 2, 4, 16, 3
    mdn = GaussianMDN(features=d, num_gaussians=k)
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    variables = mdn.init(jax.random.key(0), x)
    key = jax.random.key(7)

    def loss(v, use_rng):
        ll = mdn.apply(v, x, rng=key if use_rng else None,
                       method=GaussianMDN.log_likelihood)
        return -jnp.mean(ll)

    for use_rng in (False, True):
        monkeypatch.delenv("VITAD_PALLAS_GMM_TRAIN", raising=False)
        want_l, want_g = jax.value_and_grad(loss)(variables, use_rng)
        monkeypatch.setenv("VITAD_PALLAS_GMM_TRAIN", "1")
        got_l, got_g = jax.value_and_grad(loss)(variables, use_rng)
        np.testing.assert_allclose(got_l, want_l, rtol=1e-4, atol=1e-5)
        for path, g_got in jax.tree_util.tree_leaves_with_path(got_g):
            g_want = want_g["params"][path[1].key]
            np.testing.assert_allclose(
                np.asarray(g_got), np.asarray(g_want), rtol=2e-3, atol=3e-4,
                err_msg=str(path),
            )


def test_use_pallas_gmm_train_gates(monkeypatch):
    monkeypatch.delenv("VITAD_PALLAS_GMM_TRAIN", raising=False)
    monkeypatch.delenv("VITAD_PALLAS_GMM", raising=False)
    assert use_pallas_gmm_train(768) is False  # CPU backend → off by default
    monkeypatch.setenv("VITAD_PALLAS_GMM", "1")  # scoring default forced on
    assert use_pallas_gmm_train(768) is True
    assert use_pallas_gmm_train(2048) is True   # ResNet s3 (d-tiled bwd)
    assert use_pallas_gmm_train(4096) is False  # beyond measured envelope
    assert use_pallas_gmm_train(100) is False   # lane-misaligned D
    monkeypatch.setenv("VITAD_PALLAS_GMM_TRAIN", "0")
    assert use_pallas_gmm_train(768) is False
    monkeypatch.setenv("VITAD_PALLAS_GMM_TRAIN", "1")
    assert use_pallas_gmm_train(768) is True


def test_wide_head_dtiled_paths(rng):
    """d=1152 (> 1024, 9 lane-tiles) drives the wide-head branches: the
    d-tiled scoring forward, the 128-wide params backward, and the d-tiled
    d(x) kernel with its XLA-side direct-term subtraction."""
    b, p, d, k = 1, 8, 1152, 2
    args = _rand_args(rng, b, p, d, k)
    scale = 1.0 / np.sqrt(d)
    args = (args[0], args[1], args[2] * scale, args[3], args[4] * scale,
            args[5])

    got_ll = gmm_log_likelihood_train(*args, interpret=True)
    want_ll = _dense_ll(*args)
    np.testing.assert_allclose(np.asarray(got_ll), np.asarray(want_ll),
                               rtol=2e-4, atol=2e-4)

    def loss_pallas(*a):
        return -jnp.mean(gmm_log_likelihood_train(*a, interpret=True))

    def loss_dense(*a):
        return -jnp.mean(_dense_ll(*a))

    got = jax.grad(loss_pallas, argnums=(0, 2, 5))(*args)  # x, w_sigma, b_mu
    want = jax.grad(loss_dense, argnums=(0, 2, 5))(*args)
    for name, g_got, g_want in zip(["x", "w_sigma", "b_mu"], got, want):
        np.testing.assert_allclose(
            np.asarray(g_got), np.asarray(g_want), rtol=2e-3, atol=3e-4,
            err_msg=name,
        )
