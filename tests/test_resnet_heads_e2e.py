"""Multi-stage ResNet heads end-to-end on a tiny ResNet-shaped encoder.

Uses a small custom encoder exposing the ResNetEncoder interface to keep CPU
time sane; semantics mirror reference LearnerMDN.learn_mdn_resnet /
LearnerNF.train_with_resnet."""

import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.pipeline.train import train_mdn_resnet, train_nf_resnet


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvtec_rn")
    make_mvtec_category(
        str(root), "cat", img_size=32, n_train=12, n_test_good=3, n_test_defect=3
    )
    return str(root)


def _pipes(category, bs=6):
    data = DataPipeline(
        batch_size=bs, base_path=category, data_path="train/good", img_size=32
    )
    test = DataPipeline(
        batch_size=bs, base_path=f"{category}/cat", data_path="test",
        img_size=32, validation_mode=True,
    )
    return data, test


@pytest.mark.slow
def test_mdn_resnet_e2e(category):
    hp = HyperParams(
        model_name="enc_res_net", architecture="mdn", epochs=2, patience=2,
        learning_rate=1e-3, batch_size=6, img_size=32, num_gaussians=2,
        dtypes=DtypePolicy.f32(),
    )
    data, test = _pipes(category)
    result = train_mdn_resnet(hp, data, test)
    assert np.isfinite(result.history["train_loss"][-1])
    assert np.isfinite(result.metrics["image_auroc_score"])


@pytest.mark.slow
def test_nf_resnet_e2e(category):
    hp = HyperParams(
        model_name="enc_res_net", architecture="nf", epochs=2, patience=2,
        learning_rate=1e-3, batch_size=6, img_size=32, hidden_ratio=0.5,
        flow_steps=2, dtypes=DtypePolicy.f32(),
    )
    data, test = _pipes(category)
    result = train_nf_resnet(hp, data, test)
    assert np.isfinite(result.history["train_loss"][-1])
    assert np.isfinite(result.metrics["image_auroc_score"])
