"""KMeans MDN mu-bias seeding (reference init_cluster_centers,
src/util/TrainingsHelper.py:18-81)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_ad_tpu.models.mdn import GaussianMDN
from vit_ad_tpu.pipeline.cluster_init import (
    kmeans_cluster_centers,
    seed_mdn_mu_bias,
)


def test_kmeans_recovers_modes(rng):
    # three well-separated blobs
    centers = np.array([[0, 0], [10, 10], [-10, 5]], np.float32)
    pts = np.concatenate(
        [c + rng.normal(0, 0.3, size=(50, 2)) for c in centers]
    ).astype(np.float32)
    got = kmeans_cluster_centers(pts.reshape(1, -1, 2), 3)
    # each true center has a recovered center nearby
    d = np.linalg.norm(got[:, None, :] - centers[None], axis=-1)
    assert (d.min(axis=0) < 1.0).all()


def test_seed_mdn_mu_bias(rng):
    d, k = 6, 3
    mdn = GaussianMDN(features=d, num_gaussians=k)
    params = mdn.init(jax.random.key(0), jnp.zeros((1, 1, d)))
    centers = rng.normal(size=(k, d)).astype(np.float32)
    seeded = seed_mdn_mu_bias(params, centers)
    np.testing.assert_allclose(
        np.asarray(seeded["params"]["b_mu"]), centers.T, rtol=1e-6
    )
    # other params untouched
    np.testing.assert_array_equal(
        np.asarray(seeded["params"]["w_mu"]), np.asarray(params["params"]["w_mu"])
    )
