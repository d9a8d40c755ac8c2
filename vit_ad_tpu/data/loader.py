"""Batched, device-fed data pipeline.

Replaces the reference's torch DataLoader stack (reference
src/data_loader/GeneralDataLoader.py) with a TPU-oriented design:

  * Host does decode+resize only; images travel to the device as uint8
    (4x less PCIe/ICI traffic than f32) and are scaled/normalized inside the
    jit graph (`preprocess`), fusing with the first conv.
  * Batches are padded to a static `batch_size` with a validity mask so every
    step hits the same compiled executable (no shape-polymorphic recompiles);
    the reference instead emitted a ragged final batch.
  * A background thread keeps `prefetch` batches in flight
    (`prefetch_to_device`) so decode overlaps device compute.
  * Iteration order parity: the reference sets shuffle=False in its torch
    DataLoaders (GeneralDataLoader.py:152-156) — the fixed seed-24 file
    shuffle is the only shuffle. Same here.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vit_ad_tpu.data.dataset import AnomalyDataset
from vit_ad_tpu.data.files import train_valid_split, join_to_file_list


class Batch(NamedTuple):
    """uint8 image batch + optional eval targets + padding mask."""

    images: np.ndarray            # [B, H, W, 3] uint8
    valid: np.ndarray             # [B] bool — False on padded rows
    masks: Optional[np.ndarray] = None   # [B, H, W] uint8
    labels: Optional[np.ndarray] = None  # [B] int32


def preprocess(
    images_u8: jax.Array,
    mean: Optional[jax.Array] = None,
    std: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> jax.Array:
    """uint8 [B,H,W,3] → float [0,1], optionally standardized. Call inside
    the jit'd step so XLA fuses it with the first conv."""
    x = images_u8.astype(dtype) / jnp.asarray(255.0, dtype)
    if mean is not None:
        if std is None:
            raise ValueError("preprocess: mean given without std — "
                             "standardization needs both (or neither)")
        x = (x - mean.astype(dtype)) / std.astype(dtype)
    return x


def _batches_from_dataset(
    ds: AnomalyDataset, batch_size: int, pad: bool = True
) -> Iterator[Batch]:
    n = len(ds)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        items = [ds[i] for i in idx]
        if ds.validation:
            images = np.stack([it[0] for it in items])
            masks = np.stack([it[1] for it in items])
            labels = np.asarray([it[2] for it in items], dtype=np.int32)
        else:
            images = np.stack(items)
            masks, labels = None, None
        valid = np.ones(len(idx), dtype=bool)
        if pad and len(idx) < batch_size:
            short = batch_size - len(idx)
            images = np.concatenate([images, np.repeat(images[-1:], short, 0)])
            valid = np.concatenate([valid, np.zeros(short, dtype=bool)])
            if masks is not None:
                masks = np.concatenate([masks, np.repeat(masks[-1:], short, 0)])
                labels = np.concatenate(
                    [labels, np.repeat(labels[-1:], short, 0)]
                )
        yield Batch(images=images, valid=valid, masks=masks, labels=labels)


def prefetch_to_device(
    it: Iterator[Batch], size: int = 2, device=None, host: bool = False
) -> Iterator[Batch]:
    """Background-thread prefetch: decode/stack on host while the device is
    busy, `jax.device_put` ahead of use. `host=True` keeps batches on host
    (decode-ahead only) — for consumers that stage to the device themselves
    (the eval scan protocol), where an eager device_put would cost a
    device→host fetch per batch just to re-stage."""
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()  # set when the consumer abandons the generator

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in it:
                staged = batch if host else jax.device_put(batch, device)
                if not _put(staged):
                    return  # consumer gone — stop decoding, drop the batch
        except BaseException as e:  # noqa: BLE001 — re-raised in the consumer
            # A decode/stack failure must surface in the consuming loop, not
            # silently end the iterator (which would truncate an epoch or an
            # eval set to however many batches preceded the bad image).
            _put(e)
        finally:
            _put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # consumer done or abandoned mid-iteration (an exception in the
        # consuming loop, or a dropped generator): release the worker —
        # without this it blocks forever on a full queue, pinning the
        # thread and its device-resident batches for process lifetime
        stop.set()


class DataPipeline:
    """Train/valid/test pipelines for one dataset category.

    Mirrors GeneralDataLoader's constructor contract (base_path + suffixes,
    80/20 fallback split, validation_mode) while exposing plain iterators."""

    def __init__(
        self,
        batch_size: int,
        base_path: str = "",
        data_path: str = "",
        valid_path: Optional[str] = None,
        img_size: int = 224,
        validation_mode: bool = False,
        amount_data: int = 0,
        files: Optional[List[str]] = None,
    ) -> None:
        self.batch_size = batch_size
        self.img_size = img_size
        self.validation_mode = validation_mode
        self.explicit_files = files is not None
        if files is not None:
            # explicit file list (label-free folder scoring, cli/score.py):
            # order preserved — no seed-24 shuffle, no directory-suffix walk,
            # and missing ground-truth masks read as zeros
            if not files:
                raise FileNotFoundError("empty file list")
            self.validation_mode = True
            self.test_files = list(files)
            self.train_files = []
            self.valid_files = []
        elif validation_mode:
            self.test_files = join_to_file_list(base_path, data_path)
            if amount_data > 0:
                self.test_files = self.test_files[:amount_data]
            if not self.test_files:
                raise FileNotFoundError(
                    f"No images found under {base_path!r} matching suffix "
                    f"{data_path!r} — check the dataset root and layout."
                )
            self.train_files: List[str] = []
            self.valid_files: List[str] = []
        else:
            self.train_files, self.valid_files = train_valid_split(
                base_path, data_path, valid_path, amount_data
            )
            if not self.train_files:
                raise FileNotFoundError(
                    f"No images found under {base_path!r} matching suffix "
                    f"{data_path!r} — check the dataset root and layout."
                )
        self.mean: Optional[np.ndarray] = None
        self.std: Optional[np.ndarray] = None

    # --- iterators ---------------------------------------------------------

    def train_batches(self, prefetch: int = 2) -> Iterator[Batch]:
        ds = AnomalyDataset(self.train_files, self.img_size, validation=False)
        return prefetch_to_device(
            _batches_from_dataset(ds, self.batch_size), prefetch
        )

    def valid_batches(self, prefetch: int = 2) -> Iterator[Batch]:
        ds = AnomalyDataset(self.valid_files, self.img_size, validation=False)
        return prefetch_to_device(
            _batches_from_dataset(ds, self.batch_size), prefetch
        )

    def test_batches(self, prefetch: int = 2, host: bool = False) -> Iterator[Batch]:
        ds = AnomalyDataset(self.test_files, self.img_size, validation=True,
                            missing_mask_ok=self.explicit_files)
        return prefetch_to_device(
            _batches_from_dataset(ds, self.batch_size), prefetch, host=host
        )

    def num_train_batches(self) -> int:
        return -(-len(self.train_files) // self.batch_size)

    def load_all(self) -> np.ndarray:
        """All train images as one [N, H, W, 3] uint8 array (reference
        load_all_data_at_once, GeneralDataLoader.py:175-183)."""
        ds = AnomalyDataset(self.train_files or self.test_files, self.img_size)
        return np.stack([ds[i] for i in range(len(ds))])

    # --- dataset statistics --------------------------------------------------

    def compute_mean_std(self) -> Tuple[np.ndarray, np.ndarray]:
        """Streaming per-channel mean/std over the train set on device
        (reference compute_mean_stdev, GeneralDataLoader.py:120-135; same
        biased-variance formula)."""

        @jax.jit
        def accumulate(images_u8, psum, psum_sq):
            x = preprocess(images_u8)
            return psum + jnp.sum(x, axis=(0, 1, 2)), psum_sq + jnp.sum(
                x * x, axis=(0, 1, 2)
            )

        if not self.train_files:
            raise ValueError(
                "compute_mean_std needs train files (this pipeline was "
                "built validation-only / from an explicit file list) — "
                "0/0 would silently yield NaN statistics"
            )
        psum = jnp.zeros(3)
        psum_sq = jnp.zeros(3)
        count = 0
        ds = AnomalyDataset(self.train_files, self.img_size, validation=False)
        for batch in _batches_from_dataset(ds, self.batch_size, pad=False):
            psum, psum_sq = accumulate(batch.images, psum, psum_sq)
            count += batch.images.shape[0]
        pixels = count * self.img_size * self.img_size
        mean = np.asarray(psum) / pixels
        var = np.asarray(psum_sq) / pixels - mean**2
        self.mean, self.std = mean.astype(np.float32), np.sqrt(var).astype(
            np.float32
        )
        return self.mean, self.std
