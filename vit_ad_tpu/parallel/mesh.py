"""Logical device mesh construction.

The reference is strictly single-device (SURVEY.md §2.8); parallelism here is
new capability, designed the JAX way: a 2-D (data, model) mesh, params and
batches annotated with NamedShardings, XLA/GSPMD inserting the collectives so
they ride ICI.

  * data axis — batch sharding (pure DP); also the axis a category sweep
    fans out over.
  * model axis — tensor parallelism for backbones too large for one chip:
    attention-head/MLP-hidden sharding of Dense kernels.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh. data=-1 → use all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis, replicate the rest."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
