"""Scan-of-batches training epochs (pipeline/features.stage_feature_epoch +
the train_mdn/train_nf scan paths): one lax.scan dispatch per epoch must
reproduce the per-step loop's history exactly — same batches, same rng-split
sequence, same f64 host aggregation."""

import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams, MeshConfig
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.models.vit import ViTEncoder
from vit_ad_tpu.pipeline.train import train_mdn, train_nf

F32 = DtypePolicy.f32()


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvtec_scan")
    make_mvtec_category(
        str(root), "cat", img_size=32, n_train=20,  # 20 → padded last batch
        n_test_good=4, n_test_defect=4,
    )
    return str(root)


def _tiny_encoder():
    return ViTEncoder(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_prefix_tokens=2, dtypes=F32,
    )


def _hp(arch, **kw):
    return HyperParams(
        model_name="enc_deit", architecture=arch, epochs=4, patience=4,
        learning_rate=3e-3, weight_decay=1e-5, batch_size=8, img_size=32,
        num_gaussians=3, flow_steps=2, hidden_ratio=1.0, seed=24,
        dtypes=F32, **kw,
    )


def _pipelines(category, hp):
    data = DataPipeline(batch_size=hp.batch_size, base_path=category,
                        data_path="train/good", img_size=hp.img_size)
    test = DataPipeline(batch_size=hp.batch_size, base_path=f"{category}/cat",
                        data_path="test", img_size=hp.img_size,
                        validation_mode=True)
    return data, test


@pytest.mark.parametrize("trainer,arch", [(train_mdn, "mdn"), (train_nf, "nf")])
def test_scan_epoch_matches_loop(category, monkeypatch, trainer, arch):
    hp = _hp(arch)
    results = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("VITAD_SCAN_EPOCH", mode)
        data, test = _pipelines(category, hp)
        results[mode] = trainer(hp, data, test, encoder=_tiny_encoder())
    loop, scan = results["0"], results["1"]
    assert loop.epochs_ran == scan.epochs_ran
    np.testing.assert_allclose(
        loop.history["train_loss"], scan.history["train_loss"],
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        loop.history["valid_loss"], scan.history["valid_loss"],
        rtol=1e-6, atol=1e-7,
    )
    for k in loop.metrics:
        np.testing.assert_allclose(
            loop.metrics[k], scan.metrics[k], rtol=1e-6, atol=1e-7, err_msg=k
        )


def test_scan_epoch_on_mesh_matches_single(category, monkeypatch):
    """4x2 mesh scan epochs ≡ single-device scan epochs (DP/TP shardings
    change the schedule, not the math)."""
    monkeypatch.setenv("VITAD_SCAN_EPOCH", "1")
    hp = _hp("nf")
    data, test = _pipelines(category, hp)
    single = train_nf(hp, data, test, encoder=_tiny_encoder())

    hp_mesh = _hp("nf", mesh=MeshConfig(data=4, model=2))
    data, test = _pipelines(category, hp_mesh)
    meshed = train_nf(hp_mesh, data, test, encoder=_tiny_encoder())

    np.testing.assert_allclose(
        single.history["train_loss"], meshed.history["train_loss"],
        rtol=5e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        single.metrics["image_auroc_score"],
        meshed.metrics["image_auroc_score"], rtol=1e-5, atol=1e-6,
    )


def test_stack_budget_falls_back(category, monkeypatch):
    """Over-budget stacks return None and the trainer silently keeps the
    per-step loop (same results)."""
    from vit_ad_tpu.pipeline.features import stage_feature_epoch

    feats = np.zeros((10, 4, 8), np.float32)
    assert stage_feature_epoch(feats, 4, max_bytes=1) is None
    stack = stage_feature_epoch(feats, 4)
    assert stack is not None and stack.steps == 3
    # padded tail: 2 padded rows in the last batch
    np.testing.assert_array_equal(stack.weights, [4.0, 4.0, 2.0])

    monkeypatch.setenv("VITAD_DEVICE_CACHE_MB", "0")
    monkeypatch.setenv("VITAD_SCAN_EPOCH", "1")
    hp = _hp("nf")
    data, test = _pipelines(category, hp)
    res = train_nf(hp, data, test, encoder=_tiny_encoder())
    assert np.isfinite(res.history["train_loss"]).all()
