"""Checkpointing (save AND resume — the reference only saves,
reference src/util/TrainingsHelper.py:105-125).

Orbax-backed pytree checkpoints with a flax-serialization fallback; file
naming mirrors the reference's `{Class}_{i}_{suffix}` convention loosely via
the `name` argument.
"""

from __future__ import annotations

import os
from typing import Any

import jax


def save_params(directory: str, name: str, params: Any) -> str:
    """Write a param pytree; returns the checkpoint path."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, name))
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(params), force=True)
        ckptr.wait_until_finished()
    except Exception:
        import flax.serialization

        with open(path + ".msgpack", "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(params)))
        path = path + ".msgpack"
    return path


def load_tree(path: str) -> Any:
    """Restore a checkpoint WITHOUT a target tree (shapes/dtypes come from
    the stored metadata). Used by tooling that only inspects or re-exports
    params (cli/export_weights) and so must not rebuild the model."""
    if path.endswith(".msgpack"):
        import flax.serialization

        with open(path, "rb") as f:
            return flax.serialization.msgpack_restore(f.read())
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def load_params(path: str, target: Any) -> Any:
    """Restore a param pytree saved by save_params. `target` provides the
    tree structure/dtypes (a freshly-initialized params tree)."""
    if path.endswith(".msgpack"):
        import flax.serialization

        with open(path, "rb") as f:
            return flax.serialization.from_bytes(target, f.read())
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(target))
