"""Pallas fused extraction kernel vs the XLA plane path: bit equality
(same shared code, interpret mode on CPU); curvature to fp tolerance."""

import numpy as np
import jax
import jax.numpy as jnp

from test_extraction import _multi_ring_image
from lidar_feature_extraction_tpu.config import ExtractionConfig
from lidar_feature_extraction_tpu.ops import extraction as ex
from lidar_feature_extraction_tpu.ops.extraction_pallas import (
    label_and_columns_pallas)

INTERPRET = jax.default_backend() != "tpu"


def test_pallas_labels_and_columns_match_xla():
    rng = np.random.default_rng(7)
    cfg = ExtractionConfig(n_rings=4, max_points_per_ring=512,
                           nms_rounds=96, surface_threshold=0.3)
    img = _multi_ring_image(rng, 4, 512)
    leaf, ce, cs = 1.0, 16, 24

    labels, curv = ex.label_range_image(img, cfg)
    key = ex._voxel_run_key(img.xyz, leaf)
    col, _, _, _ = ex.compact_columns(labels, img.mask, key, ce, cs)

    pl_labels, pl_curv, pl_col = label_and_columns_pallas(
        img.xyz[..., 0], img.xyz[..., 1], img.xyz[..., 2], img.count,
        cfg, leaf, ce, cs, ring_group=2, interpret=INTERPRET)

    np.testing.assert_array_equal(np.asarray(pl_labels),
                                  np.asarray(labels))
    np.testing.assert_array_equal(np.asarray(pl_col), np.asarray(col))
    # Same shared code, but separately compiled programs may contract
    # FMAs differently — tight tolerance instead of bit equality.
    np.testing.assert_allclose(np.asarray(pl_curv), np.asarray(curv),
                               rtol=1e-9, atol=1e-9)


def test_pallas_ring_group_split_invariance():
    rng = np.random.default_rng(8)
    cfg = ExtractionConfig(n_rings=8, max_points_per_ring=512,
                           nms_rounds=64)
    img = _multi_ring_image(rng, 8, 512)
    args = (img.xyz[..., 0], img.xyz[..., 1], img.xyz[..., 2], img.count,
            cfg, 1.0, 8, 8)
    a = label_and_columns_pallas(*args, ring_group=8, interpret=INTERPRET)
    b = label_and_columns_pallas(*args, ring_group=4, interpret=INTERPRET)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-9, atol=1e-9)
