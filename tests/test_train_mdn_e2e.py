"""End-to-end slice: synthetic MVTec category → tiny ViT encoder → MDN head
→ train with early stopping → AUROC metrics. Mirrors the reference flow
startTraining_mdn.main → LearnerMDN.learn_mdn_transformer → ValidatorMdn
(reference startTraining_mdn.py:25, src/pipeline/LearnerMDN.py:97-240)."""

import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.models.vit import ViTEncoder
from vit_ad_tpu.pipeline.train import train_mdn


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvtec_e2e")
    make_mvtec_category(
        str(root), "cat", img_size=32, n_train=24, n_test_good=6, n_test_defect=6
    )
    return str(root)


def _tiny_encoder():
    return ViTEncoder(
        img_size=32,
        patch_size=8,
        embed_dim=32,
        depth=2,
        num_heads=4,
        num_prefix_tokens=2,
        dtypes=DtypePolicy.f32(),
    )


def test_mdn_end_to_end(category):
    hp = HyperParams(
        model_name="enc_deit",
        architecture="mdn",
        epochs=30,
        patience=8,
        learning_rate=3e-3,
        weight_decay=1e-5,
        batch_size=8,
        img_size=32,
        num_gaussians=4,
        seed=24,
        dtypes=DtypePolicy.f32(),
    )
    data = DataPipeline(
        batch_size=hp.batch_size,
        base_path=category,
        data_path="train/good",
        img_size=hp.img_size,
    )
    test_data = DataPipeline(
        batch_size=hp.batch_size,
        base_path=f"{category}/cat",
        data_path="test",
        img_size=hp.img_size,
        validation_mode=True,
    )
    result = train_mdn(hp, data, test_data, encoder=_tiny_encoder())

    # training actually learned something
    assert result.epochs_ran >= 2
    assert result.history["train_loss"][-1] < result.history["train_loss"][0]
    assert np.isfinite(result.best_valid_loss)

    # metric suite present, sane, and anomaly detection better than chance
    m = result.metrics
    assert set(m) >= {
        "image_auroc_score",
        "pixel_auroc_score",
        "image_prauc_score",
        "pro_score_0.3fp",
    }
    for k, v in m.items():
        assert np.isfinite(v), k
    assert 0.0 <= m["image_auroc_score"] <= 1.0
    assert m["image_auroc_score"] > 0.5, m


def test_early_stopping_triggers(category):
    hp = HyperParams(
        epochs=100,
        patience=2,
        learning_rate=0.0,  # no progress → must stop after patience+1 epochs
        batch_size=8,
        img_size=32,
        num_gaussians=2,
        dtypes=DtypePolicy.f32(),
    )
    data = DataPipeline(
        batch_size=8, base_path=category, data_path="train/good", img_size=32
    )
    result = train_mdn(hp, data, encoder=_tiny_encoder())
    assert result.epochs_ran <= 5
