"""Checkpoint/resume for scene + camera parameter pytrees.

The reference has no checkpointing (stateless frames; SURVEY.md §5); this
exists for inverse-rendering optimisation loops: save/restore the
differentiable (SceneTables, CameraParams) state plus optimizer state via
orbax.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save(path: str, tree: Any) -> None:
    """Save a pytree checkpoint (orbax if available, else npz fallback).

    Leaf order follows jax.tree.flatten of the saved tree; restore() rebuilds
    into the caller-provided `like` structure, so container types
    (NamedTuples vs dicts) survive orbax's canonicalisation.
    """
    path = os.path.abspath(path)
    try:
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, jax.tree.leaves(tree), force=True)
    except Exception:
        flat = jax.tree.leaves(tree)
        np.savez(path + ".npz",
                 **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(flat)})


def restore(path: str, like: Any) -> Any:
    """Restore a checkpoint saved by save() into the structure of `like`."""
    path = os.path.abspath(path)
    treedef = jax.tree.structure(like)
    if os.path.isdir(path):
        import orbax.checkpoint as ocp

        with ocp.PyTreeCheckpointer() as ckptr:
            leaves = ckptr.restore(path)
        return jax.tree.unflatten(treedef, leaves)
    data = np.load(path + ".npz", allow_pickle=False)
    leaves = [data[f"leaf_{i}"] for i in range(treedef.num_leaves)]
    return jax.tree.unflatten(treedef, leaves)
