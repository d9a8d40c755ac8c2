"""End-to-end NF slice: synthetic data → tiny ViT → normalizing flow →
metrics. Mirrors startTraining_NF.main → LearnerNF.train_with_transformer →
ValidatorNF (reference startTraining_NF.py:25, src/pipeline/LearnerNF.py:91)."""

import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.models.vit import ViTEncoder
from vit_ad_tpu.pipeline.train import train_nf


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvtec_nf")
    make_mvtec_category(
        str(root), "cat", img_size=32, n_train=24, n_test_good=6, n_test_defect=6
    )
    return str(root)


def test_nf_end_to_end(category):
    hp = HyperParams(
        architecture="nf",
        epochs=25,
        patience=8,
        learning_rate=1e-3,
        weight_decay=1e-5,
        batch_size=8,
        img_size=32,
        hidden_ratio=1.0,
        flow_steps=4,
        seed=24,
        dtypes=DtypePolicy.f32(),
    )
    encoder = ViTEncoder(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_prefix_tokens=2, dtypes=DtypePolicy.f32(),
    )
    data = DataPipeline(
        batch_size=8, base_path=category, data_path="train/good", img_size=32
    )
    test_data = DataPipeline(
        batch_size=8, base_path=f"{category}/cat", data_path="test",
        img_size=32, validation_mode=True,
    )
    result = train_nf(hp, data, test_data, encoder=encoder)

    assert result.history["train_loss"][-1] < result.history["train_loss"][0]
    m = result.metrics
    for k in ("image_auroc_score", "pixel_auroc_score", "image_prauc_score"):
        assert np.isfinite(m[k]), m
    assert m["image_auroc_score"] > 0.5, m


def test_nf_btad_layout(tmp_path):
    """BTAD directory contract (train/ok, test/ko, bmp images) end-to-end."""
    from vit_ad_tpu.data.synthetic import make_btad_category

    root = str(tmp_path)
    make_btad_category(root, "01", img_size=32, n_train=12)
    hp = HyperParams(
        architecture="nf", epochs=2, patience=2, learning_rate=1e-3,
        batch_size=6, img_size=32, hidden_ratio=1.0, flow_steps=2,
        dtypes=DtypePolicy.f32(),
    )
    encoder = ViTEncoder(
        img_size=32, patch_size=8, embed_dim=16, depth=1, num_heads=2,
        num_prefix_tokens=2, dtypes=DtypePolicy.f32(),
    )
    data = DataPipeline(batch_size=6, base_path=root, data_path="train/ok",
                        img_size=32)
    test_data = DataPipeline(batch_size=6, base_path=f"{root}/01",
                             data_path="test", img_size=32,
                             validation_mode=True)
    result = train_nf(hp, data, test_data, encoder=encoder)
    assert np.isfinite(result.metrics["image_auroc_score"])
