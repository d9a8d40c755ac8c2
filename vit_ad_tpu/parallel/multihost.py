"""Multi-host execution (pod scale).

The reference is strictly single-device; the rebuild's mesh layer
(`parallel/context.py`) already scales one training run across the chips of
one host. This module extends the SAME mesh path across hosts the JAX way:
`jax.distributed.initialize()` connects the processes, `jax.devices()`
becomes the GLOBAL device list, and the identical NamedSharding/GSPMD
programs span hosts — cross-host collectives are XLA's problem (they ride
ICI within a pod slice and DCN across slices), not hand-written transport.

What the framework itself must add is exactly four things:

  * initialization — env-driven (`VITAD_COORDINATOR`, `VITAD_NUM_PROCESSES`,
    `VITAD_PROCESS_ID`) for explicit clusters and tests; bare
    `VITAD_MULTIHOST=1` on TPU pods, where `jax.distributed.initialize()`
    auto-detects everything from the TPU metadata.
  * host snapshots of globally-sharded params (`host_snapshot`) — early
    stopping keeps best weights in host RAM, but TP shards live on other
    hosts' chips, so snapshot = allgather + device_get.
  * host fetches of data-sharded eval payloads (`fetch_global`) — anomaly
    maps come back sharded over the data axis; metrics run on the full set.
  * primary-process gating for filesystem writes (`is_primary`) — every
    process computes identical results; one writes the checkpoint.

Contract: each process runs the SAME program over the SAME data. The data
layer is deterministic (seed-24 shuffle over sorted file lists), so every
host materializes identical batches, and `jax.device_put` against a global
sharding transfers only the shards local to that host.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def maybe_initialize_distributed() -> bool:
    """Initialize `jax.distributed` when the environment requests it.

    Must run before the backend initializes (i.e. before any
    `jax.devices()` call). Returns True when distributed mode was (or
    already is) initialized:

      * `VITAD_COORDINATOR=host:port` + `VITAD_NUM_PROCESSES` +
        `VITAD_PROCESS_ID` — explicit cluster (CPU/GPU-style, and the
        multi-process tests).
      * `VITAD_MULTIHOST=1` alone — TPU pod: `jax.distributed.initialize()`
        reads coordinator/process topology from the TPU metadata.
    """
    coord = os.environ.get("VITAD_COORDINATOR")
    if coord:
        n = os.environ.get("VITAD_NUM_PROCESSES")
        pid = os.environ.get("VITAD_PROCESS_ID")
        if n is None or pid is None:
            raise SystemExit(
                "VITAD_COORDINATOR is set but VITAD_NUM_PROCESSES / "
                "VITAD_PROCESS_ID are not — all three are required for an "
                "explicit cluster"
            )
        try:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(n),
                process_id=int(pid),
            )
        except RuntimeError:
            # already initialized (a second entry point in the same
            # process, e.g. validation after training) — that IS the
            # requested state
            pass
        return True
    if os.environ.get("VITAD_MULTIHOST") == "1":
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized
        return True
    # no cluster requested: return WITHOUT touching jax.process_count() —
    # that would initialize the backend mid-CLI-parse (before the trainer's
    # own platform/device handling, and a 25-minute stall when a remote
    # accelerator plugin is attached but unreachable)
    return False


def is_multihost() -> bool:
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should perform filesystem writes
    (checkpoints); always True single-host."""
    return jax.process_index() == 0


def host_snapshot(tree: Any) -> Any:
    """`jax.device_get` that also works for globally-sharded arrays: in
    multi-host mode, shards living on other hosts' devices are gathered
    first (`process_allgather`), so every process gets the full host-RAM
    pytree. Single-host it is exactly device_get (no extra copies).

    Only non-fully-addressable leaves are gathered: a fully-addressable
    leaf (replicated, or a multihost run without --mesh where every
    process holds the whole array) must NOT go through
    `process_allgather(tiled=True)` — that would concatenate each
    process's identical copy along axis 0 and corrupt the snapshot."""
    if not is_multihost():
        return jax.device_get(tree)
    from jax.experimental import multihost_utils

    def leaf(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return multihost_utils.process_allgather(x, tiled=True)
        return x

    return jax.device_get(jax.tree_util.tree_map(leaf, tree))


def fetch_global(x: Any) -> np.ndarray:
    """`np.asarray` for possibly non-fully-addressable arrays: data-sharded
    eval payloads allgather to the full array on every host. Single-host it
    is exactly np.asarray (the evaluators' one-fetch-per-measurement
    protocol is unchanged)."""
    if not is_multihost():
        return np.asarray(x)
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
