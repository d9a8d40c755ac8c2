"""Product-level mesh execution context for the trainers.

The reference is strictly single-device; in-run data/tensor parallelism is
the rebuild's new capability (SURVEY.md §2.8). `MeshContext` is how the six
trainers in `pipeline/train.py` consume it: when `hp.mesh` requests more
than one device the trainer shards its params with the TP rules
(`parallel/sharding.py`), shards every batch over the "data" axis, and runs
the *same* jit-compiled step — GSPMD inserts the gradient all-reduce over
"data" and the TP collectives over "model", so the math is identical to the
single-device path (verified by tests/test_mesh_training.py parity checks).

Optimizer state needs no explicit handling: `tx.init` on already-sharded
params builds its moments via `zeros_like`, and computation-follows-data
gives them the params' shardings.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vit_ad_tpu.parallel.mesh import create_mesh
from vit_ad_tpu.parallel.sharding import shard_variables


class MeshContext:
    """A live (data, model) mesh plus the shard/replicate helpers trainers
    need. Construct via `MeshContext.from_hp(hp)` — returns None when the
    config does not request a mesh, so the single-device path stays
    untouched."""

    def __init__(self, mesh: Mesh) -> None:
        self.mesh = mesh
        self.batch_sharding = NamedSharding(mesh, P("data"))
        self.replicated = NamedSharding(mesh, P())

    @classmethod
    def from_hp(cls, hp, devices: Optional[Sequence[jax.Device]] = None
                ) -> Optional["MeshContext"]:
        mesh_cfg = getattr(hp, "mesh", None)
        if mesh_cfg is None or not mesh_cfg.requested:
            return None
        mesh = create_mesh(
            data=mesh_cfg.data, model=mesh_cfg.model, devices=devices,
            axis_names=mesh_cfg.axis_names,
        )
        return cls(mesh)

    @property
    def data_size(self) -> int:
        return self.mesh.shape["data"]

    @property
    def model_size(self) -> int:
        return self.mesh.shape["model"]

    def check_batch(self, batch_size: int) -> None:
        """Static batch shapes must split evenly over the data axis."""
        if batch_size % self.data_size:
            raise ValueError(
                f"batch_size={batch_size} not divisible by the mesh data "
                f"axis ({self.data_size}); pick a multiple (-b) or a "
                f"smaller mesh (--mesh)"
            )

    def shard_params(self, variables: Any) -> Any:
        """Place a params/variables pytree onto the mesh under the TP rules
        (attention-head/MLP-hidden/mixture sharding; everything else
        replicated)."""
        return shard_variables(variables, self.mesh)

    def replicate(self, tree: Any) -> Any:
        """Replicate a pytree (e.g. batch_stats) across the mesh."""
        return jax.tree.map(
            lambda x: jax.device_put(x, self.replicated), tree
        )

    def shard_batch(self, *arrays: Any):
        """Shard arrays over the data axis (leading/batch dimension).
        Returns a tuple matching the inputs (a single array for one input)."""
        out = tuple(
            jax.device_put(a, self.batch_sharding) for a in arrays
        )
        return out if len(out) != 1 else out[0]

    def shard_stacked(self, *arrays: Any):
        """Shard stacked-epoch arrays [S, B, ...] with the BATCH (second)
        axis over the data axis — `lax.scan` slices the leading S axis, so
        each scanned step sees the same P("data") layout shard_batch gives
        the per-step loop."""
        sharding = NamedSharding(self.mesh, P(None, "data"))
        out = tuple(jax.device_put(a, sharding) for a in arrays)
        return out if len(out) != 1 else out[0]
