"""Scan-to-map localization: the TPU equivalent of the reference's
``Localizer`` facade + ``LOAMOptimizationProblem``
(``localization/include/lidar_feature_localization/localizer.hpp:50-98``,
``loam_optimization_problem.hpp:51-88``).

One jitted step fuses the whole per-scan hot path of SURVEY.md §3.1:
range-image organization -> feature extraction -> iterative GN with
voxel-hash correspondence search -> pose. The feature maps live on
device as voxel-hash tables built once at load time.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.config import PipelineConfig
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.core.scan import RangeImage
from lidar_feature_extraction_tpu.ops import gauss_newton as gn
from lidar_feature_extraction_tpu.ops.downsample import voxel_downsample
from lidar_feature_extraction_tpu.ops.extraction import extract_features
from lidar_feature_extraction_tpu.ops.residuals import (edge_residuals,
                                                        surface_residuals)
from lidar_feature_extraction_tpu.ops.voxel_map import (VoxelHashMap,
                                                        build_voxel_map)


class FeatureMaps(NamedTuple):
    edge: VoxelHashMap
    surface: VoxelHashMap


def build_feature_maps(edge_xyz, edge_mask, surface_xyz, surface_mask,
                       cfg: PipelineConfig, origin=None) -> FeatureMaps:
    """Hash the pre-built feature map clouds into device tables.

    Replaces the KD-tree construction at localizer startup
    (``localization/app/localization.cpp:79-83`` loads maps/edge.pcd +
    maps/surface.pcd)."""
    em = cfg.registration.edge_map
    sm = cfg.registration.surface_map
    return FeatureMaps(
        edge=build_voxel_map(edge_xyz, edge_mask, em.voxel_size,
                             em.table_capacity, em.points_per_voxel,
                             em.max_probes, origin=origin),
        surface=build_voxel_map(surface_xyz, surface_mask, sm.voxel_size,
                                sm.table_capacity, sm.points_per_voxel,
                                sm.max_probes, origin=origin),
    )


def register_scan(maps: FeatureMaps, edge_pts, edge_valid, surf_pts,
                  surf_valid, prior: Pose, cfg: PipelineConfig) -> gn.GNResult:
    """Gauss-Newton registration of extracted features against the maps.

    Equivalent of ``Optimizer::Run`` over ``LOAMOptimizationProblem``:
    each iteration re-searches correspondences at the current pose and
    concatenates edge (3-row) and surface (1-row) residual blocks.
    The surface scan is voxel-downsampled once (pose-independent; the
    reference recomputes it per iteration inside ``Surface::Make``,
    surface.hpp:106-111 — same result).
    """
    reg = cfg.registration
    surf_ds, surf_ds_valid = voxel_downsample(
        surf_pts, surf_valid, reg.surface_downsample_leaf,
        reg.max_surface_points)

    def problem_fn(pose: Pose) -> gn.Problem:
        eb = edge_residuals(maps.edge, edge_pts, edge_valid, pose,
                            reg.n_neighbors)
        sb = surface_residuals(maps.surface, surf_ds, surf_ds_valid, pose,
                               reg.n_neighbors)
        return gn.make_problem([eb, sb])

    return gn.run_gauss_newton(
        problem_fn, prior,
        max_iterations=reg.max_iterations,
        convergence_tol=reg.convergence_tol,
        huber_k=reg.huber_k,
        degeneracy_threshold=reg.degeneracy_threshold)


@partial(jax.jit, static_argnames=("cfg",))
def localize_scan(maps: FeatureMaps, image: RangeImage, prior: Pose,
                  cfg: PipelineConfig):
    """Full per-scan hot path: extraction + registration, one jit.

    Returns (GNResult, ExtractionResult) — the pose and the features
    (the reference's node publishes both, subscriber.hpp:128-176 +
    feature_extraction.cpp:168-170).
    """
    feats = extract_features(image, cfg.extraction)
    result = register_scan(maps, feats.edge_xyz, feats.edge_valid,
                           feats.surface_xyz, feats.surface_valid,
                           prior, cfg)
    return result, feats
