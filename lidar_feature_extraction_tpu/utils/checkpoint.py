"""Checkpoint / resume for the SLAM engine state.

The reference's only persistent artifact is the map PCD written at
shutdown (``mapping/include/lidar_feature_mapping/map.hpp:135-148``);
pose and filter state are lost (SURVEY.md §5). Here every long-lived
state object is a pytree, so checkpointing is uniform: named pytrees of
arrays to one ``.npz`` plus a small JSON manifest — enough to resume a
mapping or localization run mid-sequence (EKF state, keyframe buffer,
odometry window, trajectory).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree: Any, prefix: str, out: dict) -> dict:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out[f"{prefix}/__treedef__"] = str(treedef)
    for i, leaf in enumerate(leaves):
        out[f"{prefix}/{i}"] = np.asarray(leaf)
    return out


def save_checkpoint(path: str, _meta: dict | None = None,
                    **states: Any) -> None:
    """Save named pytrees. ``path`` is a .npz file; a sibling .json
    manifest records names and leaf counts for validation. ``_meta``
    is an arbitrary JSON-serializable dict stored in the manifest —
    callers use it for the counts a resumer needs to size its load
    templates (see ``load_meta``)."""
    arrays: dict = {}
    manifest: dict = {}
    for name, tree in states.items():
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        for i, leaf in enumerate(leaves):
            arrays[f"{name}/{i}"] = np.asarray(leaf)
        manifest[name] = {"n_leaves": len(leaves)}
    if _meta is not None:
        manifest["_meta"] = _meta
    np.savez_compressed(path, **arrays)
    with open(path + ".json", "w") as f:
        json.dump(manifest, f)


def load_meta(path: str) -> dict:
    """The ``_meta`` dict stored by ``save_checkpoint`` ({} if none)."""
    with open(path + ".json") as f:
        return json.load(f).get("_meta", {})


def load_checkpoint(path: str, **templates: Any) -> dict:
    """Load named pytrees; each ``templates[name]`` provides structure
    and dtypes (its array values are replaced)."""
    data = np.load(path)
    with open(path + ".json") as f:
        manifest = json.load(f)
    out = {}
    for name, template in templates.items():
        if name not in manifest:
            raise KeyError(f"checkpoint has no state named {name!r}")
        leaves, treedef = jax.tree_util.tree_flatten(template)
        if len(leaves) != manifest[name]["n_leaves"]:
            raise ValueError(
                f"{name}: template has {len(leaves)} leaves, checkpoint "
                f"has {manifest[name]['n_leaves']}")
        new_leaves = []
        for i, leaf in enumerate(leaves):
            arr = data[f"{name}/{i}"]
            if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(
                    jnp.shape(leaf)):
                raise ValueError(
                    f"{name}[{i}]: shape {arr.shape} != template "
                    f"{jnp.shape(leaf)}")
            new_leaves.append(jnp.asarray(arr))
        out[name] = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return out


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(path) and os.path.exists(path + ".json")
