"""Pallas GMM kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_ad_tpu.models.mdn import GaussianMDN
from vit_ad_tpu.ops import gmm
from vit_ad_tpu.ops.pallas.gmm import mdn_log_likelihood_pallas


@pytest.mark.parametrize("b,p,d,k", [(2, 6, 16, 5), (1, 4, 8, 3)])
def test_pallas_matches_xla(rng, b, p, d, k):
    model = GaussianMDN(features=d, num_gaussians=k)
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    variables = model.init(jax.random.key(0), x)
    pr = variables["params"]

    want = model.apply(variables, x, method=GaussianMDN.log_likelihood)
    got = mdn_log_likelihood_pallas(
        x,
        pr["w_pi"], pr["b_pi"],
        pr["w_sigma"], pr["b_sigma"],
        pr["w_mu"], pr["b_mu"],
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_pallas_row_padding(rng):
    """rows not a multiple of the tile must be padded and trimmed correctly."""
    from vit_ad_tpu.ops.pallas.gmm import gmm_log_likelihood_pallas

    b, p, d, k = 1, 3, 8, 2  # rows=3 < default tile
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    log_pi = jnp.log(jax.nn.softmax(
        jnp.asarray(rng.normal(size=(b, p, k)).astype(np.float32)), -1) + 1e-15)
    w_s = jnp.asarray(rng.uniform(0.1, 0.5, size=(k, d, d)).astype(np.float32))
    b_s = jnp.zeros((k, d))
    w_m = jnp.asarray(rng.normal(size=(k, d, d)).astype(np.float32) * 0.1)
    b_m = jnp.zeros((k, d))
    out = gmm_log_likelihood_pallas(
        x, log_pi, w_s, b_s, w_m, b_m, row_tile=2, interpret=True
    )
    # dense check
    sigma = jax.nn.elu(jnp.einsum("bpd,kde->bpek", x, w_s)) + 1 + 1e-15
    mu = jnp.einsum("bpd,kde->bpek", x, w_m)
    dens = gmm.log_gaussian_density(sigma, mu, x[..., None])
    want = jax.nn.logsumexp(log_pi[:, :, None, :] + dens, axis=-1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_use_pallas_gmm_default(monkeypatch):
    """Default: on for TPU targets, off on CPU; env flag overrides both."""
    from vit_ad_tpu.ops.pallas import gmm as pg

    monkeypatch.delenv("VITAD_PALLAS_GMM", raising=False)
    assert pg.use_pallas_gmm() is False  # test backend is CPU
    monkeypatch.setenv("VITAD_PALLAS_GMM", "1")
    assert pg.use_pallas_gmm() is True
    monkeypatch.setenv("VITAD_PALLAS_GMM", "0")
    assert pg.use_pallas_gmm() is False


def test_pallas_matmul_dtype_forwarded(rng):
    """bf16 matmul_dtype must reach the kernel (wrapper forwards it): in
    interpret mode on CPU the bf16 result visibly differs from f32 while
    staying close."""
    b, p, d, k = 2, 8, 16, 3
    model = GaussianMDN(features=d, num_gaussians=k)
    x = jnp.asarray(rng.normal(size=(b, p, d)).astype(np.float32))
    pr = model.init(jax.random.key(0), x)["params"]
    args = (x, pr["w_pi"], pr["b_pi"], pr["w_sigma"], pr["b_sigma"],
            pr["w_mu"], pr["b_mu"])
    f32 = np.asarray(mdn_log_likelihood_pallas(*args, interpret=True))
    bf16 = np.asarray(mdn_log_likelihood_pallas(
        *args, interpret=True, matmul_dtype=jnp.bfloat16))
    assert not np.array_equal(f32, bf16)
    np.testing.assert_allclose(f32, bf16, rtol=0.1, atol=0.1)


def test_evaluate_mdn_pallas_flag_parity(rng, tmp_path, monkeypatch):
    """VITAD_PALLAS_GMM=1 must produce the same metrics as the XLA path."""
    from vit_ad_tpu.config import DtypePolicy, HyperParams
    from vit_ad_tpu.data.loader import DataPipeline
    from vit_ad_tpu.data.synthetic import make_mvtec_category
    from vit_ad_tpu.models.vit import ViTEncoder
    from vit_ad_tpu.pipeline.eval import evaluate_mdn

    root = str(tmp_path)
    make_mvtec_category(root, "cat", img_size=32, n_train=8,
                        n_test_good=3, n_test_defect=3)
    hp = HyperParams(batch_size=4, img_size=32, num_gaussians=3,
                     dtypes=DtypePolicy.f32())
    test = DataPipeline(batch_size=4, base_path=f"{root}/cat",
                        data_path="test", img_size=32, validation_mode=True)
    enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=16, depth=1,
                     num_heads=2, num_prefix_tokens=2, dtypes=DtypePolicy.f32())
    ep = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    mdn = GaussianMDN(features=16, num_gaussians=3)
    mp = mdn.init(jax.random.key(1), jnp.zeros((1, 1, 16)))

    monkeypatch.delenv("VITAD_PALLAS_GMM", raising=False)
    m_xla = evaluate_mdn(enc, ep, mdn, mp, test, hp)
    monkeypatch.setenv("VITAD_PALLAS_GMM", "1")
    m_pl = evaluate_mdn(enc, ep, mdn, mp, test, hp)
    for key in ("image_auroc_score", "pixel_auroc_score"):
        assert abs(m_xla[key] - m_pl[key]) < 1e-6, key
