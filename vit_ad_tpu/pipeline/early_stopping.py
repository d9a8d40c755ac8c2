"""Early stopping with best-weights retention.

Parity with reference early_stopping (reference
src/util/TrainingsHelper.py:84-140): on improvement of the validation loss the
current params are snapshotted (kept in host memory and optionally written to
disk via the checkpoint module); after `patience` epochs without improvement
training stops. Unlike the reference (save-only), snapshots here are true
resume points.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Optional

import jax


def _tree_device_bytes(tree: Any) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if isinstance(x, jax.Array)
    )


def retain_snapshot(tree: Any) -> Any:
    """Best-weights retention copy for EarlyStopping.

    Single-host default: a DEVICE-side copy (fresh HBM buffers via
    jnp.copy, no host fetch). Fetching big heads through the remote
    tunnel cost ~10 s per improving epoch (tools/epoch_bench.json:
    MDN-100 trained at 15.7 img/s because its 472 MB of [D,D,K]
    w_mu/w_sigma was device_get round-tripped every epoch; ae_deit's
    ~400 MB likewise). The copy is safe against the trainers' donated
    step buffers (new buffers, old best freed by GC on overwrite), and
    downstream consumers (orbax save, final eval) take device arrays
    directly.

    Host path (`host_snapshot`) is kept for: multihost runs (the
    allgather + every-process-holds-the-snapshot contract), pytrees
    above VITAD_SNAPSHOT_DEVICE_MAX_MB (default 1500 — the D=2048 K=50
    resnet-MDN heads' extra ~2.5 GB copy would pressure a 16 GB chip
    already carrying ~10 GB of param+Adam state), and
    VITAD_SNAPSHOT_HOST=1."""
    import jax.numpy as jnp

    from vit_ad_tpu.parallel.multihost import host_snapshot, is_multihost

    max_mb = float(os.environ.get("VITAD_SNAPSHOT_DEVICE_MAX_MB", "1500"))
    if (
        is_multihost()
        or os.environ.get("VITAD_SNAPSHOT_HOST") == "1"
        or _tree_device_bytes(tree) > max_mb * 1e6
    ):
        return host_snapshot(tree)
    return jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, tree
    )


class EarlyStopping:
    def __init__(
        self,
        patience: int,
        save_fn: Optional[Callable[[Any, int, float], None]] = None,
    ) -> None:
        self.patience = patience
        self.best_loss: Optional[float] = None
        self.best_params: Any = None
        self.best_epoch: int = -1
        self.counter: int = 0
        self.save_fn = save_fn

    def update(self, loss: float, params: Any, epoch: int) -> bool:
        """Record an epoch result. Returns True when training should stop."""
        import math

        from vit_ad_tpu.parallel.multihost import is_primary

        if math.isnan(loss):
            # a NaN epoch (divergence) is never an improvement — and must
            # never become best_loss, since every later finite loss would
            # compare False against NaN and the divergence-epoch weights
            # would be retained forever
            self.counter += 1
            return self.counter >= self.patience
        if self.best_loss is None or loss < self.best_loss:
            self.best_loss = loss
            # retention copy: device-side by default (one host fetch at
            # end of training instead of per improving epoch — see
            # retain_snapshot); host RAM for multihost / oversized trees.
            # Drop the previous best BEFORE copying: otherwise old best +
            # new copy coexist and the HBM high-water mark is 2x the
            # VITAD_SNAPSHOT_DEVICE_MAX_MB gate's assumption.
            self.best_params = None
            self.best_params = retain_snapshot(params)
            self.best_epoch = epoch
            self.counter = 0
            if self.save_fn is not None and is_primary():
                # every process holds the identical snapshot; one writes it
                self.save_fn(self.best_params, epoch, loss)
        else:
            self.counter += 1
        return self.counter >= self.patience


def run_epochs(hp, train_epoch, valid_epoch, snapshot, logger=None):
    """Shared epoch driver for every trainer: per-epoch train/valid losses,
    history with epoch timing, images/sec logging, early stopping with
    best-weight snapshots.

    train_epoch(epoch) -> (train_loss, n_items)   [mutates trainer state]
    valid_epoch()      -> valid_loss
    snapshot()         -> params pytree for best-weight retention

    When the env var VITAD_TRACE=<dir> is set, the SECOND epoch (the first is
    compile-dominated) is captured as a jax.profiler device trace into <dir>.

    Returns (history, epochs_ran, stopper)."""
    import contextlib
    import os
    import time

    from vit_ad_tpu.utils.profiling import StepTimer, trace

    trace_dir = os.environ.get("VITAD_TRACE")
    timer = StepTimer()
    stopper = EarlyStopping(hp.patience)
    history = {"train_loss": [], "valid_loss": [], "epoch_time": []}
    epochs_ran = 0
    for epoch in range(hp.epochs):
        trace_this = trace_dir and epoch == min(1, hp.epochs - 1)
        ctx = trace(trace_dir) if trace_this else contextlib.nullcontext()
        t0 = time.perf_counter()
        timer.start()
        with ctx:
            train_loss, n_items = train_epoch(epoch)
        t_train = time.perf_counter() - t0  # train-only window: the logged
        # images/sec must match train_images_per_sec's (StepTimer) window,
        # not fold validation time in
        if epoch == 0:
            history["_epoch0_items"] = n_items
            history["_epoch0_train_time"] = t_train
        if epoch > 0 or hp.epochs == 1:
            # epoch 0 is jit-compile-dominated; folding it into the
            # steady-state throughput metric understates img/s (see PERF.md
            # first-measurement pollution)
            timer.tick(n_items)
        valid_loss = valid_epoch()
        epoch_time = time.perf_counter() - t0
        history["train_loss"].append(train_loss)
        history["valid_loss"].append(valid_loss)
        history["epoch_time"].append(epoch_time)
        epochs_ran = epoch + 1
        if logger is not None:
            logger.log(
                {
                    "epoch": epoch,
                    "train_loss": train_loss,
                    "valid_loss": valid_loss,
                    "images_per_sec": float(n_items) / max(t_train, 1e-9),
                }
            )
        if stopper.update(valid_loss, snapshot(), epoch):
            break
    if timer.steps == 0 and history["epoch_time"]:
        # Training ended after epoch 0 (patience 0, single early stop, …) so
        # the compile-skipping tick above never fired: fall back to the only
        # measured epoch rather than reporting 0.0. Compile time is folded
        # in — still strictly more informative than zero.
        n0 = history.get("_epoch0_items", 0.0)
        if n0:
            history["train_images_per_sec"] = n0 / max(
                history.get("_epoch0_train_time", history["epoch_time"][0]),
                1e-9,
            )
        else:
            history["train_images_per_sec"] = 0.0
    else:
        history["train_images_per_sec"] = timer.images_per_sec
    history.pop("_epoch0_items", None)
    history.pop("_epoch0_train_time", None)
    return history, epochs_ran, stopper
