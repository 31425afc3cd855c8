"""Chunked mapping front-end (pipeline/mapping_chunk.py): a block of
scans per dispatch must reproduce the per-scan pipeline exactly when
no scan is suspect, and fall back to the host re-seed ladder when one
is."""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.config import (ExtractionConfig,
                                                 PipelineConfig,
                                                 RegistrationConfig,
                                                 VoxelMapConfig)
from lidar_feature_extraction_tpu.core.scan import build_range_image
from lidar_feature_extraction_tpu.ops.extraction import extract_features
from lidar_feature_extraction_tpu.pipeline.mapping_chunk import (
    ChunkedMappingPipeline)
from lidar_feature_extraction_tpu.pipeline.slam import MappingPipeline
from lidar_feature_extraction_tpu.utils import worldsim


def tiny_cfg() -> PipelineConfig:
    vm = VoxelMapConfig(voxel_size=2.0, table_capacity=1 << 12,
                        points_per_voxel=16, max_probes=8)
    return PipelineConfig(
        extraction=ExtractionConfig(
            n_rings=16, max_points_per_ring=512, nms_rounds=16,
            max_edges=512, max_surfaces=4096),
        registration=RegistrationConfig(
            n_neighbors=8, max_iterations=20,
            edge_map=vm, surface_map=vm))


def raycast_images(cfg, n_scans=24, radius=5.0):
    rng = np.random.default_rng(3)
    world = worldsim.make_world(rng, n_poles=30, extent=25.0)
    ex = cfg.extraction
    n = ex.n_rings * ex.max_points_per_ring
    images = []
    for i in range(n_scans):
        pose = worldsim.circle_pose(i, n_scans, radius)
        pts, ring = worldsim.raycast_scan(world, pose, rng, n_rings=16,
                                          n_az=512,
                                          elev_deg=(2.0, -24.8))
        buf = np.zeros((n, 3), np.float32)
        rid = np.zeros(n, np.int32)
        val = np.zeros(n, bool)
        m = min(len(pts), n)
        buf[:m] = pts[:m]
        rid[:m] = ring[:m]
        val[:m] = True
        images.append(build_range_image(
            jnp.asarray(buf), jnp.asarray(rid), jnp.asarray(val),
            ex.n_rings, ex.max_points_per_ring,
            min_points_per_ring=ex.padding + 1))
    return images


def test_chunked_block_matches_per_scan_pipeline():
    cfg = tiny_cfg()
    images = raycast_images(cfg)
    n = len(images)
    kwargs = dict(loop_radius=4.0, loop_min_gap=5, optimize_every=6)

    per_scan = MappingPipeline(cfg, **kwargs)
    extract = jax.jit(lambda im: extract_features(im, cfg.extraction))
    for i, im in enumerate(images):
        f = extract(im)
        per_scan.process_scan(f.edge_xyz, f.edge_valid, f.surface_xyz,
                              f.surface_valid, stamp=0.1 * i)
    per_scan.optimize()

    chunked = ChunkedMappingPipeline(cfg, **kwargs)
    b = 6
    for s in range(0, n, b):
        block = jax.tree.map(
            lambda *xs: jnp.stack(xs), *images[s:s + b])
        chunked.process_block(block, [0.1 * (s + k)
                                      for k in range(len(images[s:s + b]))])
    chunked.optimize()

    assert len(chunked.keyframes) == len(per_scan.keyframes)
    assert len(chunked.constraints) == len(per_scan.constraints)
    np.testing.assert_allclose(chunked.trajectory, per_scan.trajectory,
                               atol=1e-3)
    # ... and the shared result is non-vacuous: the pipeline actually
    # drove the loop (at this deliberately tiny 16x512 configuration it
    # drifts ~0.1 m/scan — accuracy is pinned at production shape by
    # tests/test_slam_drive.py; equivalence is what THIS test pins).
    gt = np.stack([np.asarray(worldsim.circle_pose(
        round(kf.stamp / 0.1), n, 5.0).t) for kf in chunked.keyframes])
    err = np.linalg.norm(chunked.trajectory - gt, axis=-1)
    assert len(chunked.keyframes) >= 12
    assert err.max() < 0.2 * len(chunked.keyframes), err
    assert chunked.trajectory[:, 1].max() > 5.0  # reached the far side


def test_chunked_suspect_block_replays_host_ladder():
    """A block containing a garbage scan (all-invalid points after the
    window is warm) must flag suspect and take the host replay path —
    and still end with a usable trajectory."""
    cfg = tiny_cfg()
    images = raycast_images(cfg)
    # Scan 7: empty (registration EMPTY_INPUT -> suspect).
    dead = jax.tree.map(jnp.zeros_like, images[7])
    images[7] = dead._replace(mask=jnp.zeros_like(dead.mask))

    chunked = ChunkedMappingPipeline(cfg, loop_min_gap=99,
                                     optimize_every=99)
    b = 6
    for s in range(0, len(images), b):
        block = jax.tree.map(
            lambda *xs: jnp.stack(xs), *images[s:s + b])
        chunked.process_block(block, [0.1 * (s + k) for k in range(b)])

    # The drive survived the dead scan: the replay path kept tracking
    # (most scans still become keyframes) and the trajectory is finite.
    assert len(chunked.keyframes) >= 14
    assert np.isfinite(chunked.trajectory).all()
