"""Eval scan-of-batches protocol + mesh-sharded scoring.

The validators score `VITAD_EVAL_CHUNK` batches per device dispatch with all
dispatches queued before the first fetch (pipeline/eval._collect_scan) — the
bench-proven streaming pattern that removes the axon tunnel's per-batch
turnaround from real validation runs. These tests lock (a) bitwise score
parity between the scan and per-batch protocols including short final
batches and chunk padding, (b) tuple (multi-stage) payloads, and (c) DP
scoring over an hp.mesh (batches sharded over the data axis)."""

import numpy as np
import pytest

from vit_ad_tpu.config import DtypePolicy, HyperParams, MeshConfig
from vit_ad_tpu.data.loader import Batch, DataPipeline
from vit_ad_tpu.data.synthetic import make_mvtec_category
from vit_ad_tpu.models.flow import NormalizingFlow
from vit_ad_tpu.models.vit import ViTEncoder
from vit_ad_tpu.pipeline.eval import _collect, evaluate_nf


@pytest.fixture(scope="module")
def category(tmp_path_factory):
    root = tmp_path_factory.mktemp("mvtec_eval_scan")
    # 6 good + 7 defect = 13 test images: at batch 4 that is 4 batches with
    # a 1-valid final batch; at chunk 3 the scan pads 4 → 6 scan steps
    make_mvtec_category(
        str(root), "cat", img_size=32, n_train=8, n_test_good=6,
        n_test_defect=7,
    )
    return str(root)


def _batches(n_batches=4, batch=4, last_valid=1, tuple_payload=False):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n_batches):
        n = last_valid if i == n_batches - 1 else batch
        valid = np.arange(batch) < n
        out.append(Batch(
            images=rng.integers(0, 255, (batch, 8, 8, 3), dtype=np.uint8),
            valid=valid,
            masks=rng.integers(0, 2, (batch, 8, 8)).astype(np.uint8),
            labels=rng.integers(0, 2, (batch,)).astype(np.int32),
        ))
    return out


def _score(images):
    x = images.astype(np.float32)
    return x.mean(axis=(1, 2, 3))


def _score_tuple(images):
    x = images.astype(np.float32)
    return x.mean(axis=(1, 2, 3)), x.max(axis=(1, 2, 3))


@pytest.mark.parametrize("tuple_payload", [False, True])
def test_collect_scan_matches_per_batch(monkeypatch, tuple_payload):
    import jax.numpy as jnp

    batches = _batches()
    fn = _score_tuple if tuple_payload else _score

    def per_batch(im):
        return fn(jnp.asarray(im))

    def scan_score(ims):
        import jax

        return jax.lax.scan(lambda _, im: (None, fn(im)), None, ims)[1]

    monkeypatch.setenv("VITAD_EVAL_CHUNK", "0")
    ref = _collect(list(batches), per_batch, keep_origs=5)
    monkeypatch.setenv("VITAD_EVAL_CHUNK", "3")
    got = _collect(list(batches), per_batch, keep_origs=5,
                   scan_score=scan_score)

    for r, g in zip(ref, got):
        if r is None:
            assert g is None
        elif isinstance(r, tuple):
            for ri, gi in zip(r, g):
                np.testing.assert_array_equal(ri, gi)
        else:
            np.testing.assert_array_equal(r, g)
    # 13 valid rows out of 16 padded
    payload = got[0][0] if tuple_payload else got[0]
    assert payload.shape[0] == 13
    assert got[3].shape[0] == 5  # keep_origs


def _nf_setup(category, mesh=None):
    import jax
    import jax.numpy as jnp

    hp = HyperParams(
        architecture="nf", batch_size=8, img_size=32, hidden_ratio=1.0,
        flow_steps=2, seed=24, dtypes=DtypePolicy.f32(),
    )
    if mesh is not None:
        hp.mesh = mesh
    encoder = ViTEncoder(
        img_size=32, patch_size=8, embed_dim=32, depth=2, num_heads=4,
        num_prefix_tokens=2, dtypes=DtypePolicy.f32(),
    )
    flow = NormalizingFlow(
        num_channels=32, img_size=32, num_patches=16, hidden_ratio=1.0,
        flow_steps=2, dtypes=DtypePolicy.f32(),
    )
    k1, k2 = jax.random.split(jax.random.key(0))
    ep = encoder.init(k1, jnp.zeros((1, 32, 32, 3), jnp.float32))
    fp = flow.init(k2, jnp.zeros((1, 4, 4, 32), jnp.float32))
    test = DataPipeline(
        batch_size=8, base_path=f"{category}/cat", data_path="test",
        img_size=32, validation_mode=True,
    )
    return hp, encoder, ep, flow, fp, test


def test_evaluate_nf_scan_protocol_parity(category, monkeypatch):
    hp, encoder, ep, flow, fp, test = _nf_setup(category)
    monkeypatch.setenv("VITAD_EVAL_CHUNK", "0")
    ref = evaluate_nf(encoder, ep, flow, fp, test, hp)
    monkeypatch.setenv("VITAD_EVAL_CHUNK", "3")
    got = evaluate_nf(encoder, ep, flow, fp, test, hp)
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-6, atol=1e-7)


def test_evaluate_nf_mesh_scoring(category, monkeypatch):
    """hp.mesh shards eval batches over the data axis (DP scoring) in both
    protocols; metrics match the single-device run."""
    ref = evaluate_nf(*_nf_setup(category)[1:], _nf_setup(category)[0])

    mesh = MeshConfig(data=4, model=2)
    hp, encoder, ep, flow, fp, test = _nf_setup(category, mesh=mesh)
    for chunk in ("0", "2"):
        monkeypatch.setenv("VITAD_EVAL_CHUNK", chunk)
        got = evaluate_nf(encoder, ep, flow, fp, test, hp)
        for k in ref:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6)


def test_mesh_batch_divisibility_checked(category):
    mesh = MeshConfig(data=4, model=2)
    hp, encoder, ep, flow, fp, _ = _nf_setup(category, mesh=mesh)
    test = DataPipeline(
        batch_size=6,  # 6 % 4 != 0 → the eval mesh check must reject it
        base_path=f"{category}/cat", data_path="test",
        img_size=32, validation_mode=True,
    )
    with pytest.raises(ValueError, match="not divisible"):
        evaluate_nf(encoder, ep, flow, fp, test, hp)
