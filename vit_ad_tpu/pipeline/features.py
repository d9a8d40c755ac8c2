"""Frozen-encoder feature extraction with caching.

The reference recomputes frozen-encoder features for the full train set every
epoch (reference src/pipeline/LearnerMDN.py:151, LearnerNF.py:137-139) — pure
waste since the encoder never changes. Here features are extracted once per
run (`extract_features`) and the head trains on the cached [N, P, D] array;
`cache_frozen_features=False` restores reference behavior for benchmarking.
"""

from __future__ import annotations

import os
from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vit_ad_tpu.data.loader import Batch, preprocess


def make_feature_extractor(
    encoder: nn.Module,
    enc_params,
    block_index: int = 0,
    mean: Optional[np.ndarray] = None,
    std: Optional[np.ndarray] = None,
) -> Callable[[jax.Array], jax.Array]:
    """jit-compiled uint8-images → patch-embedding function. `block_index`
    and norm stats are compile-time constants, fused into one graph."""
    mean_j = None if mean is None else jnp.asarray(mean)
    std_j = None if std is None else jnp.asarray(std)

    # Params are explicit jit arguments, not closure captures: the axon
    # remote-compile endpoint serializes captured arrays into the compile
    # payload and rejects oversized requests (HTTP 413).
    @jax.jit
    def fn(params, images_u8: jax.Array) -> jax.Array:
        x = preprocess(images_u8, mean_j, std_j)
        out = encoder.apply(params, x, block_index=block_index)
        return out.patch_embedding

    return lambda images_u8: fn(enc_params, images_u8)


def extract_features(
    extractor: Callable[[jax.Array], jax.Array],
    batches: Iterator[Batch],
) -> np.ndarray:
    """Run the extractor over a batch stream, dropping padded rows.
    Returns features [N, P, D] on host.

    Dispatch-all-then-drain (the evaluators' protocol, pipeline/eval.py):
    every batch is dispatched before any result is fetched, so device
    compute overlaps host decode and nothing pays a per-batch fetch
    roundtrip (~65 ms effective per dispatch turnaround on the tunnel-
    attached chip). `batch.valid` is host-computable, so the valid count
    never touches the device."""
    from vit_ad_tpu.parallel.multihost import fetch_global

    pending = []
    for batch in batches:
        pending.append((extractor(batch.images), batch.valid))
    chunks = []
    for feats, valid in pending:  # ONE draining pass after all dispatches
        n_valid = int(np.asarray(valid).sum())
        # fetch_global = np.asarray single-host; with TP-sharded encoder
        # params on a multi-host mesh the output spans hosts → allgather
        chunks.append(fetch_global(feats)[:n_valid])
    return np.concatenate(chunks, axis=0)


def feature_batches(
    features: np.ndarray, batch_size: int
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Re-batch cached features with padding + validity mask (static shapes
    → one compiled step executable)."""
    n = features.shape[0]
    for start in range(0, n, batch_size):
        end = min(start + batch_size, n)
        feats = features[start:end]
        valid = np.ones(end - start, dtype=np.float32)
        if end - start < batch_size:
            short = batch_size - (end - start)
            feats = np.concatenate([feats, np.repeat(feats[-1:], short, 0)])
            valid = np.concatenate([valid, np.zeros(short, dtype=np.float32)])
        yield feats, valid


def stage_feature_batches(
    features: np.ndarray,
    batch_size: int,
    mc=None,
    max_bytes: Optional[int] = None,
) -> Callable[[], Iterator[Tuple[jax.Array, jax.Array, float]]]:
    """Device-resident epoch batches for cached features.

    The head trainers iterate the SAME cached features every epoch; feeding
    the jit step host arrays re-transfers each batch host→device on every
    step of every epoch (a [32, 196, 768] f32 batch is ~19 MB — over
    hundreds of MDN/NF epochs the transfers dwarf the step math, and on the
    axon tunnel they serialize with dispatch). Stage the padded batches on
    the device ONCE (sharded over the mesh data axis when a MeshContext is
    given) and hand trainers a re-iterable of (feats, valid, weight) with
    the valid-row weight precomputed on host so the epoch loop fetches
    nothing.

    Falls back to the lazy host iterator when the cache exceeds `max_bytes`
    (default VITAD_DEVICE_CACHE_MB=2048 MB) — correctness is identical, the
    staging is purely a transfer-scheduling choice.
    """
    if max_bytes is None:
        max_bytes = int(os.environ.get("VITAD_DEVICE_CACHE_MB", 2048)) * 2**20

    def _shard(feats, valid):
        if mc is not None:
            return mc.shard_batch(feats, valid)
        return jax.device_put(feats), jax.device_put(valid)

    # padded size: ceil(n / batch) full batches
    n = features.shape[0]
    n_padded = -(-n // batch_size) * batch_size
    per_row = features.nbytes // max(n, 1)
    if n_padded * per_row > max_bytes:
        def lazy() -> Iterator[Tuple[jax.Array, jax.Array, float]]:
            for feats, valid in feature_batches(features, batch_size):
                w = float(valid.sum())
                f, v = _shard(feats, valid)
                yield f, v, w

        return lazy

    staged = []
    for feats, valid in feature_batches(features, batch_size):
        w = float(valid.sum())
        f, v = _shard(feats, valid)
        staged.append((f, v, w))
    return lambda: iter(staged)


class EpochStack:
    """Whole staged epoch as stacked device arrays for `lax.scan` epochs:
    feats [S, B, ...] (cached features, or uint8 images for the image-batch
    trainers), valid [S, B] f32, host weights [S]. Built by
    `stage_feature_epoch` / `stage_image_epoch`; rows/padding are
    bit-identical to the per-batch streams."""

    def __init__(self, feats, valid, weights) -> None:
        self.feats = feats
        self.valid = valid
        self.weights = weights  # np [S], valid rows per batch

    @property
    def steps(self) -> int:
        return int(self.feats.shape[0])


def stage_feature_epoch(
    features: np.ndarray,
    batch_size: int,
    mc=None,
    max_bytes: Optional[int] = None,
) -> Optional[EpochStack]:
    """Stack the padded epoch batches into single device arrays so trainers
    can run the WHOLE epoch as one `lax.scan` dispatch (the train-side
    analog of eval's scan-of-batches protocol): per-step dispatch turnaround
    — a full tunnel roundtrip per batch on remote-attached TPUs — disappears,
    and the epoch costs one dispatch + one scalar-vector fetch.

    Padding duplicates the final row exactly like `feature_batches`, so scan
    epochs consume bit-identical batches to the per-step loop. Sharded
    [None, "data", ...] over a mesh (batch axis stays the data axis under
    the scan's leading-axis slicing). Returns None when the stacked epoch
    exceeds `max_bytes` (VITAD_DEVICE_CACHE_MB) — callers keep the loop."""
    if max_bytes is None:
        max_bytes = int(os.environ.get("VITAD_DEVICE_CACHE_MB", 2048)) * 2**20

    n = features.shape[0]
    if n == 0:
        return None
    s = -(-n // batch_size)
    n_padded = s * batch_size
    per_row = features.nbytes // n
    if n_padded * per_row > max_bytes:
        return None

    feats = features
    valid = np.ones(n, dtype=np.float32)
    if n_padded > n:
        feats = np.concatenate(
            [feats, np.repeat(feats[-1:], n_padded - n, 0)]
        )
        valid = np.concatenate(
            [valid, np.zeros(n_padded - n, dtype=np.float32)]
        )
    feats = feats.reshape(s, batch_size, *features.shape[1:])
    valid = valid.reshape(s, batch_size)
    weights = valid.sum(axis=1)
    if mc is not None:
        feats_d, valid_d = mc.shard_stacked(feats, valid)
    else:
        feats_d, valid_d = jax.device_put(feats), jax.device_put(valid)
    return EpochStack(feats_d, valid_d, weights)


def stage_image_epoch(
    make_batches: Callable[[], Iterator[Batch]],
    mc=None,
    max_bytes: Optional[int] = None,
) -> Optional[EpochStack]:
    """`stage_feature_epoch` for the image-batch trainers: stack the padded
    uint8 epoch batches into single device arrays (images [S, B, H, W, 3],
    valid [S, B]) so recon/VAE/ResNet-head trainers can run the whole epoch
    as one `lax.scan` dispatch. Batches arrive already padded to the static
    batch size (loader), so stacking reproduces the per-step stream
    bit-identically. Sharded [None, "data", ...] over a mesh — the stack is
    assembled on HOST under a mesh so device_put places each shard directly
    (a device-side jnp.stack would transiently hold the WHOLE epoch in one
    chip's HBM before resharding). Returns None (callers keep the loop)
    when the set exceeds `max_bytes` (VITAD_DEVICE_CACHE_MB) — same budget
    the per-batch staging uses."""
    if max_bytes is None:
        max_bytes = int(os.environ.get("VITAD_DEVICE_CACHE_MB", 2048)) * 2**20

    ims, valids, total = [], [], 0
    for batch in make_batches():
        total += batch.images.nbytes
        if total > max_bytes:
            return None
        # may already be a device array (prefetch_to_device) — jnp.stack
        # below consumes it without a host round-trip on the non-mesh path
        ims.append(batch.images)
        valids.append(np.asarray(batch.valid).astype(np.float32))
    if not ims:
        return None
    assert all(im.shape == ims[0].shape for im in ims), "ragged batches"
    valid = np.stack(valids)
    weights = valid.sum(axis=1)
    if mc is not None:
        images = np.stack([np.asarray(im) for im in ims])
        images, valid_d = mc.shard_stacked(images, valid)
    else:
        images = jnp.stack([jnp.asarray(im) for im in ims])
        valid_d = jax.device_put(valid)
    return EpochStack(images, valid_d, weights)


def image_epoch_staging(
    make_batches: Callable[[], Iterator[Batch]],
    mc=None,
) -> Tuple[Optional[EpochStack], Optional["EpochBatches"]]:
    """The image trainers' staging policy in one place: (stack, batches)
    where exactly one is set. Scan epochs wanted + in budget → the epoch
    stack; over budget → the LAZY per-epoch pipeline directly (the
    per-batch staging would re-decode the whole set only to hit the same
    byte budget); scan disabled → per-batch device staging."""
    if use_scan_epochs():
        stack = stage_image_epoch(make_batches, mc)
        if stack is not None:
            return stack, None
        return None, EpochBatches(None, _lazy_image_batches(make_batches, mc))
    return None, stage_image_batches(make_batches, mc)


def make_scan_epoch(body: Callable, n_carry: int) -> Callable:
    """jit + donate + `lax.scan` scaffold shared by every trainer's
    scan-of-batches train epoch: `body(carry, xs) -> (carry, loss)` with the
    trainer's step math; the first `n_carry` positional args form the scan
    carry (params/opt-state/rng/batch-stats — DONATED, the epoch's whole
    point is in-place state advance), the rest are the stacked xs leaves.
    Returns `run(*carry, *xs) -> (*carry, losses)`."""
    import functools

    @functools.partial(jax.jit, donate_argnums=tuple(range(n_carry)))
    def run(*args):
        carry, losses = jax.lax.scan(body, args[:n_carry], args[n_carry:])
        return (*carry, losses)

    return run


def make_valid_scan_epoch(eval_loss: Callable) -> Callable:
    """Validation-side sibling of `make_scan_epoch`: score every staged
    valid batch in ONE dispatch with no state carry (nothing is donated —
    params are reused by the train step). `eval_loss(params, batch, valid)
    -> loss`; returns `run(params, batches_s, valid_s) -> [steps] losses`.
    Trainers with extra xs (recon latents) or an rng carry (VAE) keep their
    own variants."""

    @jax.jit
    def run(params, batches_s, valid_s):
        def body(carry, xs):
            batch, valid = xs
            return carry, eval_loss(params, batch, valid)

        _, losses = jax.lax.scan(body, 0, (batches_s, valid_s))
        return losses

    return run


def use_scan_epochs() -> bool:
    """Scan-of-batches training epochs: default-on for accelerator backends
    (pure scheduling change, loss-stream parity locked by tests), default-off
    on CPU — XLA:CPU does not route convolutions inside `while` bodies onto
    the oneDNN fast path, making conv-trainer scan epochs ~50x slower than
    the eager loop (measured: tiny NF epoch 6 ms loop vs 353 ms scan, while
    the matmul-only MDN epoch is 1.02x — tools/epoch_bench.json). TPU
    executes convs inside scans at full speed (the NF flow itself is a scan
    of conv couplings, PERF.md). VITAD_SCAN_EPOCH=1/0 forces either way."""
    v = os.environ.get("VITAD_SCAN_EPOCH")
    if v is not None:
        return v != "0"
    return jax.default_backend() != "cpu"


def _place_batch(mc, images, valid):
    if mc is not None:
        return mc.shard_batch(images, valid)
    return jax.device_put(images), jax.device_put(valid)


def _lazy_image_batches(make_batches, mc):
    """Per-epoch lazy (decode-every-epoch) image generator fn — the
    fallback when the set exceeds the device-cache budget. Callers wrap it
    in an EpochBatches."""
    def lazy() -> Iterator[Tuple[jax.Array, jax.Array, float]]:
        for batch in make_batches():
            v = np.asarray(batch.valid).astype(np.float32)
            w = float(v.sum())
            im, vd = _place_batch(mc, batch.images, v)
            yield im, vd, w

    return lazy


class EpochBatches:
    """Re-iterable (images_u8, valid_f32, weight) epoch stream, optionally
    device-resident. Built by `stage_image_batches`."""

    def __init__(self, staged, lazy_gen) -> None:
        self._staged = staged
        self._lazy = lazy_gen

    @property
    def staged(self) -> bool:
        return self._staged is not None

    def __call__(self):
        return iter(self._staged) if self.staged else self._lazy()


def stage_image_batches(
    make_batches: Callable[[], Iterator[Batch]],
    mc=None,
    max_bytes: Optional[int] = None,
) -> EpochBatches:
    """Device-resident epoch cache for image-batch trainers.

    The recon/VAE/ResNet trainers iterate the SAME train set every epoch;
    the loader re-DECODES every image from disk and re-transfers it each
    epoch (reference behavior — its torch DataLoader does the same,
    reference src/data_loader/GeneralDataLoader.py). Anomaly train sets are
    small (MVTec ≈ 60–400 images ≈ tens of MB as 224px uint8), so decode
    once, stage the padded batches on the device (mesh data-axis sharded
    with a MeshContext), and replay them from HBM every epoch.

    Batch iteration order is deterministic (the fixed seed-24 file shuffle
    is the only shuffle — loader docstring), so replaying staged batches is
    bit-identical to re-iterating the pipeline. Falls back to the lazy
    per-epoch pipeline when the uint8 set exceeds `max_bytes`
    (VITAD_DEVICE_CACHE_MB, default 2048 MB); the partially-consumed
    staging pass's prefetch thread is abandoned (daemon, bounded queue).
    """
    if max_bytes is None:
        max_bytes = int(os.environ.get("VITAD_DEVICE_CACHE_MB", 2048)) * 2**20

    staged: Optional[list] = []
    total = 0
    for batch in make_batches():
        total += batch.images.nbytes
        if total > max_bytes:
            staged = None
            break
        # batch.images may already be a device array (prefetch_to_device);
        # _place's device_put is then a no-op rather than a host round-trip
        v = np.asarray(batch.valid).astype(np.float32)
        w = float(v.sum())
        im, vd = _place_batch(mc, batch.images, v)
        staged.append((im, vd, w))

    return EpochBatches(staged, _lazy_image_batches(make_batches, mc))
