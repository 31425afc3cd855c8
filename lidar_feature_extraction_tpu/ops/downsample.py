"""Voxel-grid centroid downsampling with fixed-capacity output.

Replaces ``Downsample`` / ``pcl::VoxelGrid`` (``lib/include/
lidar_feature_library/downsample.hpp:38-49``): points are bucketed by
voxel and each occupied voxel emits its centroid. Sort + segmented
reduction, one pass, fixed output shape.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.ops.voxel_map import _pack_coords, _EMPTY


@partial(jax.jit, static_argnames=("capacity",))
def voxel_downsample(xyz: jnp.ndarray, mask: jnp.ndarray, voxel_size,
                     capacity: int):
    """Centroid per occupied voxel of the masked points.

    Returns (points [capacity, 3], valid [capacity]). Output order is
    packed-key order (deterministic). Voxels beyond ``capacity`` are
    dropped (log-worthy but silent on device; size capacity generously).
    """
    dtype = xyz.dtype
    origin = jnp.zeros(3, dtype)
    key = jnp.where(mask, _pack_coords(xyz, voxel_size, origin), _EMPTY)
    order = jnp.argsort(key)
    skey = key[order]
    sxyz = xyz[order]
    valid = skey != _EMPTY

    first = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
    first = first & valid
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1          # [N]
    seg = jnp.where(valid & (seg >= 0), seg, capacity)
    seg_c = jnp.minimum(seg, capacity)

    sums = jnp.zeros((capacity + 1, 3), dtype)
    sums = sums.at[seg_c].add(jnp.where(valid[:, None], sxyz, 0.0),
                              mode="drop")
    cnts = jnp.zeros(capacity + 1, dtype)
    cnts = cnts.at[seg_c].add(valid.astype(dtype), mode="drop")

    n_voxels = jnp.sum(first.astype(jnp.int32))
    out_valid = jnp.arange(capacity) < jnp.minimum(n_voxels, capacity)
    pts = sums[:capacity] / jnp.maximum(cnts[:capacity, None], 1.0)
    return jnp.where(out_valid[:, None], pts, 0.0), out_valid
