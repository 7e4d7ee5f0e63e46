"""Solver-state checkpointing.

The reference has no save/load at all (SURVEY.md §5: each solve retrains from
scratch; the planner object is the only 'resumable state'). Here any solver
state pytree — single problem or a sharded batch — serializes to one .npz
(portable, no framework lock-in); `restore` rebuilds the exact pytree
structure from a template state, so a long batched solve can resume after
preemption, or a trained field can be reused across related problems.
"""
from __future__ import annotations

import pathlib
from typing import Any

import jax
import numpy as np

__all__ = ["save_state", "restore_state"]


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    names = ["/".join(str(k) for k in path) for path, _ in flat]
    leaves = [leaf for _, leaf in flat]
    return names, leaves, treedef


def save_state(state: Any, path: str | pathlib.Path) -> pathlib.Path:
    """Write a state pytree to `path` (.npz). Device arrays are gathered."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    names, leaves, _ = _flatten_with_paths(state)
    arrays = {f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    arrays["__names__"] = np.asarray(names)
    np.savez_compressed(path, **arrays)
    return path


def restore_state(template: Any, path: str | pathlib.Path) -> Any:
    """Rebuild a state pytree with `template`'s structure from a checkpoint.

    Leaf shapes/dtypes must match the template (same solver config & batch
    size) — mismatches raise with the offending leaf path named.
    """
    data = np.load(pathlib.Path(path), allow_pickle=False)
    names, leaves, treedef = _flatten_with_paths(template)
    saved_names = [str(n) for n in data["__names__"]]
    if saved_names != names:
        raise ValueError(
            f"checkpoint structure mismatch: saved {len(saved_names)} leaves, "
            f"template has {len(names)}; first difference: "
            f"{next((a, b) for a, b in zip(saved_names, names) if a != b)}"
        )
    new_leaves = []
    for i, (name, leaf) in enumerate(zip(names, leaves)):
        value = data[f"leaf_{i}"]
        expected = np.asarray(leaf)
        if value.shape != expected.shape:
            raise ValueError(
                f"leaf {name}: checkpoint shape {value.shape} != template {expected.shape}"
            )
        new_leaves.append(value.astype(expected.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
