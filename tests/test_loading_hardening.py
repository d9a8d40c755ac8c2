"""Hardening behaviors of the run-loading / multihost layers (round-3 late
review findings): checkpoint selection, BN-stat round-trips, snapshot
addressability, and CLI error quality."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_find_checkpoint_skips_tmp_and_prefers_committed(tmp_path):
    """A crash mid-save leaves an orbax tmp dir; a prior failure can leave a
    .msgpack fallback. find_checkpoint must never pick the tmp artifact and
    must prefer the committed orbax dir."""
    from vit_ad_tpu.pipeline.loading import find_checkpoint

    run = tmp_path / "run"
    run.mkdir()
    (run / "best_params.orbax-checkpoint-tmp-123456").mkdir()
    with pytest.raises(FileNotFoundError):
        find_checkpoint(str(run))  # only a tmp dir → no usable checkpoint

    (run / "best_params.msgpack").write_bytes(b"x")
    assert find_checkpoint(str(run)).endswith("best_params.msgpack")

    (run / "best_params").mkdir()
    assert find_checkpoint(str(run)).endswith("best_params")


def test_resnet_joint_restore_roundtrips_batch_stats(tmp_path):
    """New resnet checkpoints carry enc_batch_stats; restore returns the
    SAVED stats (a pretrained trunk's real running stats), not fresh init.
    Old-layout checkpoints (no key) fall back to the init stats."""
    from vit_ad_tpu.pipeline.loading import _restore_resnet_joint
    from vit_ad_tpu.utils.checkpoint import save_params

    heads = [{"params": {"w": jnp.zeros((2, 2))}}]
    enc_variables = {
        "params": {"k": jnp.ones((3,))},
        "batch_stats": {"bn": {"mean": jnp.zeros((4,)),
                               "var": jnp.ones((4,))}},
    }
    trained_stats = {"bn": {"mean": jnp.full((4,), 0.25),
                            "var": jnp.full((4,), 9.0)}}

    new_ckpt = save_params(str(tmp_path / "new"), "best_params", {
        "heads": heads, "encoder": enc_variables["params"],
        "enc_batch_stats": trained_stats,
    })
    best, enc_stats = _restore_resnet_joint(new_ckpt, heads, enc_variables)
    np.testing.assert_array_equal(
        enc_stats["batch_stats"]["bn"]["mean"], np.full((4,), 0.25)
    )
    np.testing.assert_array_equal(
        enc_stats["batch_stats"]["bn"]["var"], np.full((4,), 9.0)
    )

    old_ckpt = save_params(str(tmp_path / "old"), "best_params", {
        "heads": heads, "encoder": enc_variables["params"],
    })
    best, enc_stats = _restore_resnet_joint(old_ckpt, heads, enc_variables)
    np.testing.assert_array_equal(
        enc_stats["batch_stats"]["bn"]["mean"], np.zeros((4,))
    )


def test_host_snapshot_leaves_fully_addressable_leaves_alone(monkeypatch):
    """In multihost mode, fully-addressable leaves (replicated params, or a
    multihost run without --mesh) must NOT be process_allgather'd — tiled
    gathering would concatenate each process's identical copy along axis 0
    and corrupt the best-weights snapshot."""
    from vit_ad_tpu.parallel import multihost

    monkeypatch.setattr(multihost, "is_multihost", lambda: True)
    called = []

    class FakeMU:
        @staticmethod
        def process_allgather(x, tiled=False):
            called.append(x)
            return x

    import jax.experimental.multihost_utils  # noqa: F401 — ensure importable
    monkeypatch.setitem(
        __import__("sys").modules, "jax.experimental.multihost_utils", FakeMU
    )
    tree = {"w": jnp.arange(6.0).reshape(2, 3)}  # single-device: addressable
    out = multihost.host_snapshot(tree)
    assert not called, "fully-addressable leaf was gathered"
    np.testing.assert_array_equal(out["w"], np.arange(6.0).reshape(2, 3))


def test_parse_pth_filename_rejects_missing_gaussian_count():
    from vit_ad_tpu.pipeline.loading import parse_pth_filename

    with pytest.raises(SystemExit, match="gaussian count"):
        parse_pth_filename("mdn_bottle.pth", "mdn")
    k, dc = parse_pth_filename("100_gaussians_bottle.pth", "mdn")
    assert (k, dc) == (100, "bottle")


def test_coordinator_env_requires_companions(monkeypatch):
    from vit_ad_tpu.parallel.multihost import maybe_initialize_distributed

    monkeypatch.setenv("VITAD_COORDINATOR", "localhost:1234")
    monkeypatch.delenv("VITAD_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("VITAD_PROCESS_ID", raising=False)
    with pytest.raises(SystemExit, match="VITAD_NUM_PROCESSES"):
        maybe_initialize_distributed()


def test_early_stopping_never_retains_nan_best():
    """A NaN validation epoch (divergence) must not become best_loss: every
    later finite loss compares False against NaN, so the divergence-epoch
    weights would be kept forever."""
    from vit_ad_tpu.pipeline.early_stopping import EarlyStopping

    es = EarlyStopping(patience=3)
    assert not es.update(float("nan"), {"w": 1}, 0)
    assert es.best_loss is None and es.best_params is None
    assert not es.update(0.5, {"w": 2}, 1)
    assert es.best_loss == 0.5 and es.best_params == {"w": 2}
    assert not es.update(float("nan"), {"w": 3}, 2)
    assert es.best_loss == 0.5 and es.best_epoch == 1
    # and NaN epochs still count toward patience
    es2 = EarlyStopping(patience=2)
    assert not es2.update(float("nan"), {}, 0)
    assert es2.update(float("nan"), {}, 1)


def test_retain_snapshot_is_device_side_and_independent(monkeypatch):
    """Best-weights retention keeps a DEVICE copy by default (the per-
    improving-epoch device_get of a 472 MB MDN head cost ~10 s over the
    remote tunnel — tools/epoch_bench.json), and the copy must be
    independent of the live buffers (trainers donate them)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vit_ad_tpu.pipeline.early_stopping import EarlyStopping, retain_snapshot

    live = {"w": jnp.arange(4.0), "k": 7}
    es = EarlyStopping(patience=2)
    es.update(1.0, live, 0)
    assert isinstance(es.best_params["w"], jax.Array)  # not host numpy
    assert es.best_params["k"] == 7  # non-array leaves pass through
    # the copy survives the ORIGINAL buffer being deleted (the real
    # donation proxy — rebinding the dict key would pass even for an
    # aliasing retain_snapshot, since the snapshot would still reference
    # the old live buffer)
    live["w"].delete()
    np.testing.assert_array_equal(np.asarray(es.best_params["w"]),
                                  np.arange(4.0))

    # explicit host opt-out
    monkeypatch.setenv("VITAD_SNAPSHOT_HOST", "1")
    out = retain_snapshot({"w": jnp.arange(4.0)})
    assert isinstance(out["w"], np.ndarray)
    monkeypatch.delenv("VITAD_SNAPSHOT_HOST")

    # oversized trees spill to host (threshold in MB)
    monkeypatch.setenv("VITAD_SNAPSHOT_DEVICE_MAX_MB", "0.00001")
    out = retain_snapshot({"w": jnp.arange(64.0)})
    assert isinstance(out["w"], np.ndarray)


def test_prefetch_releases_worker_when_consumer_abandons():
    """Abandoning the prefetch generator mid-iteration (an exception in the
    consuming loop, a dropped iterator) must release the worker thread —
    it used to block forever on the full queue, pinning the thread and its
    staged batches for process lifetime."""
    import itertools
    import threading
    import time

    from vit_ad_tpu.data.loader import Batch, prefetch_to_device

    base = threading.active_count()

    def gen():
        for _ in itertools.count():  # infinite: worker can never finish
            yield Batch(
                images=np.zeros((1, 4, 4, 3), np.uint8),
                valid=np.ones(1, np.float32),
            )

    it = prefetch_to_device(gen(), size=1, host=True)
    next(it)
    it.close()  # abandon mid-iteration
    deadline = time.time() + 5.0
    while time.time() < deadline and threading.active_count() > base:
        time.sleep(0.05)
    assert threading.active_count() == base, "prefetch worker leaked"
