"""End-to-end recon slice: synthetic data → vanilla CNN auto-encoder →
MSE training → metrics. Mirrors startTraining_recon.main →
LearnerRecon.learn_ae_with_MSE_only → ValidatorRecon
(reference startTraining_recon.py:26, src/pipeline/LearnerRecon.py:390)."""

import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.models.autoencoder import VanillaAutoEncoder
from vit_ad_tpu.pipeline.train import train_recon


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvtec_recon")
    make_mvtec_category(
        str(root), "cat", img_size=32, n_train=20, n_test_good=4, n_test_defect=4
    )
    return str(root)


@pytest.mark.parametrize("use_ssim", [False, True])
def test_recon_end_to_end(category, use_ssim):
    hp = HyperParams(
        architecture="reconstruction",
        epochs=6,
        patience=4,
        learning_rate=1e-3,
        weight_decay=1e-4,
        batch_size=8,
        img_size=32,
        dtypes=DtypePolicy.f32(),
    )
    model = VanillaAutoEncoder(img_size=32, dtypes=DtypePolicy.f32())
    data = DataPipeline(
        batch_size=8, base_path=category, data_path="train/good", img_size=32
    )
    test_data = DataPipeline(
        batch_size=8, base_path=f"{category}/cat", data_path="test",
        img_size=32, validation_mode=True,
    )
    result = train_recon(hp, data, test_data, model=model, use_ssim=use_ssim)

    assert result.history["train_loss"][-1] < result.history["train_loss"][0]
    m = result.metrics
    for k in ("image_auroc_score", "pixel_auroc_score", "image_prauc_score"):
        assert np.isfinite(m[k]), m
