"""Debug visualization coloring: RGB per point label / per value.

Parity with the reference's observability-by-visualization
(``extraction/include/lidar_feature_extraction/color_points.hpp:61`` +
``src/color_points.cpp``): the colored cloud is the extraction
pipeline's debug output. Colors are vectorized lookups, [R, P, 3] uint8.
"""

from __future__ import annotations

import jax.numpy as jnp

# Label -> RGB table (order matches the PointLabel codes).
_LABEL_COLORS = jnp.asarray([
    [120, 120, 120],   # Default: gray
    [255, 64, 64],     # Edge: red
    [255, 160, 160],   # EdgeNeighbor: light red
    [64, 96, 255],     # Surface: blue
    [160, 180, 255],   # SurfaceNeighbor: light blue
    [40, 40, 40],      # OutOfRange: near-black
    [255, 200, 0],     # Occluded: amber
    [0, 200, 120],     # ParallelBeam: green
], dtype=jnp.uint8)


def color_by_label(labels: jnp.ndarray) -> jnp.ndarray:
    """PointLabel codes [..., ] -> RGB [..., 3] uint8."""
    safe = jnp.clip(labels, 0, _LABEL_COLORS.shape[0] - 1)
    return _LABEL_COLORS[safe]


def color_by_value(values: jnp.ndarray, vmin=None, vmax=None) -> jnp.ndarray:
    """Scalar field -> blue-to-red ramp, [..., 3] uint8 (ValueToColor
    parity, color_points.cpp)."""
    v = values.astype(jnp.float32)
    lo = jnp.min(v) if vmin is None else vmin
    hi = jnp.max(v) if vmax is None else vmax
    t = jnp.clip((v - lo) / jnp.maximum(hi - lo, 1e-12), 0.0, 1.0)
    r = (255 * t).astype(jnp.uint8)
    b = (255 * (1.0 - t)).astype(jnp.uint8)
    g = (255 * (1.0 - jnp.abs(2 * t - 1))).astype(jnp.uint8)
    return jnp.stack([r, g, b], axis=-1)


def labeled_cloud(image_xyz, mask, labels):
    """(xyz [N, 3], rgb [N, 3], valid [N]) flattened debug cloud."""
    rgb = color_by_label(labels)
    return (image_xyz.reshape(-1, 3), rgb.reshape(-1, 3), mask.reshape(-1))


__all__ = ["color_by_label", "color_by_value", "labeled_cloud"]
