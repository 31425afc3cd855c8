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


def test_compact_extraction_pallas_branch_traces(monkeypatch):
    """Trace extract_features_compact with the TPU Pallas branch forced.

    The CPU suite otherwise never traces the production dispatch path
    (extraction.py use_pallas), which let a captured-constant bug (a
    non-static ``surface_leaf`` leaking into the kernel closure as an
    f32[] tracer) reach the real chip. Kernel tracing is backend-
    independent, so .trace() catches that class of bug here."""
    from lidar_feature_extraction_tpu.config import kitti_hdl64

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    pc = kitti_hdl64()
    cfg = pc.extraction
    img = _multi_ring_image(np.random.default_rng(9), cfg.n_rings, 512)
    assert cfg.pallas_labeling
    try:
        traced = ex.extract_features_compact.trace(
            img, cfg, surface_leaf=pc.registration.surface_downsample_leaf,
            edges_per_ring=cfg.edges_per_ring,
            surface_runs_per_ring=cfg.surface_runs_per_ring)
        assert "pallas_call" in str(traced.jaxpr)
    finally:
        # The trace above caches a pallas-bearing jaxpr under a key that
        # does NOT include the backend (avals + static args only); a
        # later real-CPU call with the identical signature would reuse
        # it and fail to lower. Drop it.
        ex.extract_features_compact.clear_cache()


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
