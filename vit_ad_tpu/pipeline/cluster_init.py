"""KMeans cluster-center initialization for the MDN mu bias.

Parity with reference init_cluster_centers (reference
src/util/TrainingsHelper.py:18-81, seed 42 — present but commented out at its
call site, LearnerMDN.py:262-266): run KMeans over the frozen encoder's patch
embeddings of the train set and seed the MDN's mu bias with the centers, so
each mixture component starts near a real feature mode.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np

KMEANS_SEED = 42  # reference TrainingsHelper.py:65


def kmeans_cluster_centers(
    features: np.ndarray, num_clusters: int, max_samples: int = 100_000
) -> np.ndarray:
    """[N, P, D] (or [M, D]) features → [num_clusters, D] centers."""
    flat = np.asarray(features, dtype=np.float32).reshape(-1, features.shape[-1])
    if flat.shape[0] > max_samples:
        idx = np.random.default_rng(KMEANS_SEED).choice(
            flat.shape[0], max_samples, replace=False
        )
        flat = flat[idx]
    try:
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=num_clusters, random_state=KMEANS_SEED, n_init=10)
        km.fit(flat)
        return km.cluster_centers_.astype(np.float32)
    except ImportError:
        # Lloyd's algorithm fallback (numpy only)
        rng = np.random.default_rng(KMEANS_SEED)
        centers = flat[rng.choice(flat.shape[0], num_clusters, replace=False)]
        for _ in range(25):
            d = ((flat[:, None, :] - centers[None]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(num_clusters):
                pts = flat[assign == c]
                if len(pts):
                    centers[c] = pts.mean(0)
        return centers.astype(np.float32)


def seed_mdn_mu_bias(mdn_params: Any, centers: np.ndarray) -> Any:
    """Set the MDN b_mu [D, K] to the transposed cluster centers [K, D]
    (the reference writes centers into the torch mu bias,
    MixtureDensityNetwork.py:139-146)."""
    params = dict(mdn_params["params"])
    b_mu = jnp.asarray(centers.T, dtype=params["b_mu"].dtype)
    assert b_mu.shape == params["b_mu"].shape, (
        f"centers {b_mu.shape} vs b_mu {params['b_mu'].shape}"
    )
    params["b_mu"] = b_mu
    return {**mdn_params, "params": params}
