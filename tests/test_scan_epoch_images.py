"""Scan-of-batches epochs for the IMAGE-batch trainers
(features.stage_image_epoch + the train_recon/train_vae/train_mdn_resnet/
train_nf_resnet scan paths): one lax.scan dispatch per epoch consumes the
same staged uint8 batches, the same rng-split sequence, and threads
batch_stats identically to the per-step loop.

Tolerance note: unlike the matmul-only feature-head trainers
(test_scan_epoch.py, bit-identical under highest matmul precision), the
conv trainers are NOT bit-exact across the two compilations — XLA fuses the
conv backward differently inside a scan body than in a standalone step
(measured: identical loss, ~3e-8 grad divergence on the first step), and
Adam amplifies that reassociation noise over an epoch to ~1e-4 relative.
The histories are compared at equivalence tolerance (rtol 2e-3) and the
metric agreement at rank-stability tolerance."""

import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams
from vit_ad_tpu.data.loader import DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.pipeline.train import (
    train_mdn_resnet,
    train_nf_resnet,
    train_recon,
    train_vae,
)

F32 = DtypePolicy.f32()


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvtec_scan_img")
    make_mvtec_category(
        str(root), "cat", img_size=32,
        n_train=22,  # 80/20 split → 18 train → a padded final batch at bs 8
        n_test_good=3, n_test_defect=3,
    )
    return str(root)


def _pipelines(category, bs):
    data = DataPipeline(batch_size=bs, base_path=category,
                        data_path="train/good", img_size=32)
    test = DataPipeline(batch_size=bs, base_path=f"{category}/cat",
                        data_path="test", img_size=32, validation_mode=True)
    return data, test


def _compare(loop, scan, rtol=2e-3):
    assert loop.epochs_ran == scan.epochs_ran
    np.testing.assert_allclose(
        loop.history["train_loss"], scan.history["train_loss"],
        rtol=rtol, atol=1e-6,
    )
    np.testing.assert_allclose(
        loop.history["valid_loss"], scan.history["valid_loss"],
        rtol=rtol, atol=1e-6,
    )
    for k in loop.metrics:
        if k == "fp_thres":
            assert loop.metrics[k] == scan.metrics[k]
            continue
        # scores differ by the trained-weight drift (~1e-4); a single rank
        # flip among the 6 test images moves AUROC by ~0.11 — assert the
        # models agree to within less than one flip
        np.testing.assert_allclose(
            loop.metrics[k], scan.metrics[k], atol=0.10, err_msg=k
        )


def _run_both(trainer, category, hp, monkeypatch, **kw):
    results = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("VITAD_SCAN_EPOCH", mode)
        data, test = _pipelines(category, hp.batch_size)
        results[mode] = trainer(hp, data, test, **kw)
    return results["0"], results["1"]


def test_recon_vanilla_scan_matches_loop(category, monkeypatch):
    """End-to-end CNN AE (BN stats threaded through the scan carry)."""
    from vit_ad_tpu.models.autoencoder import VanillaAutoEncoder

    hp = HyperParams(
        architecture="reconstruction", epochs=3, patience=3,
        learning_rate=1e-3, weight_decay=1e-4, batch_size=8, img_size=32,
        dtypes=F32,
    )
    loop, scan = _run_both(
        train_recon, category, hp, monkeypatch,
        model=VanillaAutoEncoder(img_size=32, dtypes=F32),
    )
    _compare(loop, scan)


def test_recon_latent_cached_scan_matches_loop(category, monkeypatch):
    """Transformer AE: frozen encoder, latent cache becomes a stacked
    [S, B, ...] device array consumed by the scan."""
    from vit_ad_tpu.models.autoencoder import TransformerAutoEncoder
    from vit_ad_tpu.models.vit import ViTEncoder

    enc = ViTEncoder(img_size=32, patch_size=8, embed_dim=32, depth=2,
                     num_heads=4, num_prefix_tokens=2, dtypes=F32)
    model = TransformerAutoEncoder(
        encoder=enc, decoder_kind="cnn", img_size=32, dtypes=F32,
    )
    hp = HyperParams(
        architecture="reconstruction", epochs=3, patience=3,
        learning_rate=1e-3, weight_decay=1e-4, batch_size=8, img_size=32,
        dtypes=F32,
    )
    loop, scan = _run_both(train_recon, category, hp, monkeypatch, model=model)
    _compare(loop, scan)


def test_vae_scan_matches_loop(category, monkeypatch):
    """VAE: reparameterization rng consumed in BOTH train and valid epochs —
    the scan must advance the shared key stream identically."""
    hp = HyperParams(
        architecture="reconstruction", epochs=3, patience=3,
        learning_rate=1e-3, weight_decay=1e-4, batch_size=8, img_size=32,
        dtypes=F32,
    )
    loop, scan = _run_both(train_vae, category, hp, monkeypatch)
    # the reparameterized KL (exp(log_var)) amplifies the conv-bwd
    # reassociation noise fastest of all trainers: epochs 1-2 agree to
    # 1e-6, epoch 3 to ~2e-3 (measured) — wider rtol, same mechanism
    _compare(loop, scan, rtol=2e-2)


@pytest.mark.slow
def test_mdn_resnet_scan_matches_loop(category, monkeypatch):
    hp = HyperParams(
        model_name="enc_res_net", architecture="mdn", epochs=2, patience=2,
        learning_rate=1e-3, batch_size=8, img_size=32, num_gaussians=2,
        dtypes=F32,
    )
    loop, scan = _run_both(train_mdn_resnet, category, hp, monkeypatch)
    _compare(loop, scan)


@pytest.mark.slow
def test_nf_resnet_scan_matches_loop(category, monkeypatch):
    hp = HyperParams(
        model_name="enc_res_net", architecture="nf", epochs=2, patience=2,
        learning_rate=1e-3, batch_size=8, img_size=32, hidden_ratio=0.5,
        flow_steps=2, dtypes=F32,
    )
    loop, scan = _run_both(train_nf_resnet, category, hp, monkeypatch)
    _compare(loop, scan)


def test_image_stack_budget_falls_back(category, monkeypatch):
    """Over-budget image sets return None (trainers keep the loop), and the
    stack reproduces the padded per-batch stream exactly."""
    from vit_ad_tpu.pipeline.features import stage_image_epoch

    data, _ = _pipelines(category, 8)
    assert stage_image_epoch(lambda: data.train_batches(0), max_bytes=1) is None

    stack = stage_image_epoch(lambda: data.train_batches(0))
    assert stack is not None and stack.steps == 3  # 18 train images, bs 8
    np.testing.assert_array_equal(stack.weights, [8.0, 8.0, 2.0])
    ims = np.stack([np.asarray(b.images) for b in data.train_batches(0)])
    np.testing.assert_array_equal(np.asarray(stack.feats), ims)

    monkeypatch.setenv("VITAD_DEVICE_CACHE_MB", "0")
    monkeypatch.setenv("VITAD_SCAN_EPOCH", "1")
    hp = HyperParams(
        architecture="reconstruction", epochs=2, patience=2,
        learning_rate=1e-3, batch_size=8, img_size=32, dtypes=F32,
    )
    data, test = _pipelines(category, 8)
    res = train_recon(hp, data, test)
    assert np.isfinite(res.history["train_loss"]).all()
