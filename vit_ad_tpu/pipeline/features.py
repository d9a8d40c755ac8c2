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
    Returns features [N, P, D] on host."""
    chunks = []
    for batch in batches:
        feats = extractor(batch.images)
        n_valid = int(batch.valid.sum())
        chunks.append(np.asarray(feats[:n_valid]))
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
