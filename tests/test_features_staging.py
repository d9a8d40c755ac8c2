"""Device-resident feature staging (pipeline/features.stage_feature_batches):
bitwise parity with the host iterator, precomputed weights, the max_bytes
fallback, and mesh sharding of staged batches."""

import numpy as np

from vit_ad_tpu.pipeline.features import feature_batches, stage_feature_batches


def _features(n=11, p=4, d=8):
    rng = np.random.default_rng(3)
    return rng.normal(size=(n, p, d)).astype(np.float32)


def test_staged_matches_host_iterator():
    feats = _features()
    ref = list(feature_batches(feats, 4))
    it = stage_feature_batches(feats, 4)
    for twice in range(2):  # must be re-iterable across epochs
        got = list(it())
        assert len(got) == len(ref)
        for (rf, rv), (gf, gv, w) in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(gf), rf)
            np.testing.assert_array_equal(np.asarray(gv), rv)
            assert w == float(rv.sum())


def test_fallback_when_over_budget():
    feats = _features()
    it = stage_feature_batches(feats, 4, max_bytes=1)  # force lazy path
    ref = list(feature_batches(feats, 4))
    got = list(it())
    assert len(got) == len(ref)
    for (rf, rv), (gf, gv, w) in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(gf), rf)
        assert w == float(rv.sum())
    # lazy path must also be re-iterable
    assert len(list(it())) == len(ref)


def test_staged_shards_over_mesh():
    from vit_ad_tpu.config import MeshConfig
    from vit_ad_tpu.parallel.context import MeshContext

    class HP:
        mesh = MeshConfig(data=4, model=2)

    mc = MeshContext.from_hp(HP)
    feats = _features(n=16)
    for f, v, w in stage_feature_batches(feats, 8, mc=mc)():
        assert f.sharding.spec == mc.batch_sharding.spec
        assert v.sharding.spec == mc.batch_sharding.spec
