"""Parameter sharding rules and multi-chip train steps.

Tensor-parallel layout for the transformer backbones (Megatron-style, but
expressed as GSPMD shardings — XLA inserts the all-reduces over ICI):

  * attention qkv kernel [D, 3D]   → shard output dim over "model"
    (head-parallel; 3D = 3*heads*hd and heads % model_axis == 0 holds for
    the 12-head backbones on 2/4-way TP)
  * attention proj kernel [D, D]   → shard input dim  (row-parallel → psum)
  * mlp fc1 kernel [D, 4D]         → shard output dim (column-parallel)
  * mlp fc2 kernel [4D, D]         → shard input dim  (row-parallel → psum)
  * MDN head kernels [D, D, K]     → shard K over "model" (mixture-parallel:
    the K-chunk scan becomes per-shard, logsumexp merges via psum-free
    replicated reduction at the tiny [B,P,D] level)
  * everything else                → replicated

Batches shard over "data". Optimizer states inherit param shardings.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax


def _spec_for(path: Tuple[str, ...], value: Any) -> P:
    """PartitionSpec by param path + rank."""
    name = "/".join(path)
    ndim = getattr(value, "ndim", 0)
    leaf = path[-1]
    # stacked-block layouts ([depth, in, out] kernels): ViT leaves are
    # "qkv_kernel"...; Swin stage pairs prefix them "a_"/"b_" (models/vit.py,
    # models/swin.py) — endswith covers both
    if leaf.endswith(("qkv_kernel", "fc1_kernel")) and ndim == 3:
        return P(None, None, "model")  # column-parallel
    if leaf.endswith(("proj_kernel", "fc2_kernel")) and ndim == 3:
        return P(None, "model", None)  # row-parallel → psum
    if leaf.endswith(("qkv_bias", "fc1_bias")) and ndim == 2:
        return P(None, "model")
    # Swin/NesT per-module Dense layout
    if "attn" in name and "qkv" in name and leaf == "kernel":
        return P(None, "model")
    if "attn" in name and "proj" in name and leaf == "kernel":
        return P("model", None)
    if "mlp" in name and "fc1" in name and leaf == "kernel":
        return P(None, "model")
    if "mlp" in name and "fc2" in name and leaf == "kernel":
        return P("model", None)
    if path[-1] in ("w_sigma", "w_mu") and ndim == 3:
        return P(None, None, "model")
    if path[-1] in ("b_sigma", "b_mu") and ndim == 2:
        return P(None, "model")
    if path[-1] == "w_pi" and ndim == 2:
        return P(None, "model")
    return P()


def param_shardings(variables: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree matching `variables` (TP rules above)."""
    flat = flax.traverse_util.flatten_dict(
        flax.serialization.to_state_dict(variables), sep=None
    )
    specs = {k: NamedSharding(mesh, _spec_for(k, v)) for k, v in flat.items()}
    tree = flax.traverse_util.unflatten_dict(specs)
    return flax.serialization.from_state_dict(variables, tree)


def shard_variables(variables: Any, mesh: Mesh) -> Any:
    """device_put params onto the mesh according to the TP rules."""
    sh = param_shardings(variables, mesh)
    return jax.tree.map(jax.device_put, variables, sh)


# Trainers consume these rules through parallel/context.MeshContext — the
# product-level entry point wired into every pipeline/train.py trainer and
# the --mesh CLI flag.
