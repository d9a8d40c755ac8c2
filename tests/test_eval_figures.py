"""Eval figure artifacts (reference ValidationHelper emits heatmap /
ground-truth / overlay / recon grids and ROC+PR displays,
src/util/ValidationHelper.py:149-153,193-209)."""

import os

import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    root = tmp_path_factory.mktemp("figdata")
    make_mvtec_category(str(root), "widget", img_size=32, n_train=12)
    return str(root)


def _hp(**kw):
    return HyperParams(
        epochs=1, patience=1, batch_size=4, img_size=32,
        dtypes=DtypePolicy.f32(), **kw,
    )


def test_recon_eval_writes_figures(category, tmp_path):
    from vit_ad_tpu.models.autoencoder import VanillaAutoEncoder
    from vit_ad_tpu.pipeline.eval import evaluate_recon
    import jax

    hp = _hp()
    model = VanillaAutoEncoder(img_size=32, dtypes=DtypePolicy.f32())
    import jax.numpy as jnp

    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32), train=False
    )
    test = DataPipeline(
        batch_size=4, base_path=f"{category}/widget", data_path="test",
        img_size=32, validation_mode=True,
    )
    figdir = str(tmp_path / "figures")
    metrics = evaluate_recon(model, variables, test, hp, figures_dir=figdir)
    assert "image_auroc_score" in metrics
    expected = ["heatmaps.png", "ground_truth.png", "overlay.png",
                "recons.png", "roc_curve.png", "pr_curve.png"]
    for name in expected:
        path = os.path.join(figdir, name)
        assert os.path.exists(path), f"missing {name}"
        assert os.path.getsize(path) > 1000  # a real rendered PNG


def test_mdn_eval_writes_figures(category, tmp_path):
    import jax
    import jax.numpy as jnp

    from vit_ad_tpu.models.mdn import GaussianMDN
    from vit_ad_tpu.models.vit import ViTEncoder
    from vit_ad_tpu.pipeline.eval import evaluate_mdn

    hp = _hp(num_gaussians=2)
    enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=16, depth=1,
                     num_heads=2, num_prefix_tokens=2,
                     dtypes=DtypePolicy.f32())
    ep = enc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3), jnp.float32))
    mdn = GaussianMDN(features=16, num_gaussians=2)
    mp = mdn.init(jax.random.key(1), jnp.zeros((1, 1, 16)))
    test = DataPipeline(
        batch_size=4, base_path=f"{category}/widget", data_path="test",
        img_size=32, validation_mode=True,
    )
    figdir = str(tmp_path / "figures")
    evaluate_mdn(enc, ep, mdn, mp, test, hp, figures_dir=figdir)
    for name in ["heatmaps.png", "ground_truth.png", "overlay.png",
                 "roc_curve.png", "pr_curve.png"]:
        assert os.path.exists(os.path.join(figdir, name)), f"missing {name}"
    # no reconstruction head → no recon grid
    assert not os.path.exists(os.path.join(figdir, "recons.png"))


def test_show_image_destandardizes():
    """Single-image display reverses channel-wise standardization
    (reference ImageHelper.show_image, src/util/ImageHelper.py:45-64)."""
    import matplotlib.pyplot as plt

    from vit_ad_tpu.utils.images import show_image

    mean = np.array([0.485, 0.456, 0.406])
    std = np.array([0.229, 0.224, 0.225])
    raw = np.random.default_rng(0).uniform(0.2, 0.8, size=(8, 8, 3))
    standardized = (raw - mean) / std
    fig = show_image(standardized, mean=mean, std=std)
    try:
        shown = fig.axes[0].images[0].get_array()
        np.testing.assert_allclose(np.asarray(shown), raw, atol=1e-6)
    finally:
        plt.close(fig)
