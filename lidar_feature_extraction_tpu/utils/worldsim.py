"""Synthetic LiDAR world + drive simulator for closed-loop evaluation.

The reference repo has no simulation or evaluation harness (SURVEY.md
§4: unit tests only, no bag replays); its acceptance story for the
registration math is implicit in unit-level convergence tests. The TPU
build's documented deviations (voxel-candidate kNN, precomputed
per-voxel geometry, compact surface runs — docs/design.md §8) all
declare *ATE parity* as their acceptance criterion, which needs a
ground-truth world to measure against. This module provides it:

- ``make_world``: an urban-canyon-like scene of vertical pole lines
  (edge features) and a ground plane (surface features), the same
  geometry family the registration residuals model
  (``localization/include/lidar_feature_localization/edge.hpp:78-126``,
  ``surface.hpp:96-143``);
- ``synth_scan``: a sensor-frame scan sampled from the world with
  plausible ring assignments;
- ``run_drive``: a closed-loop localization+EKF replay over a scripted
  trajectory, returning ground-truth and estimated positions.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from lidar_feature_extraction_tpu.config import PipelineConfig
from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.core.pose import Pose


def make_world(rng: np.random.Generator, n_poles: int = 30,
               extent: float = 25.0, n_ground: int = 8000,
               ground_z: float = -1.7, noise: float = 0.01
               ) -> Tuple[np.ndarray, np.ndarray]:
    """(edge_points [Ne,3], surface_points [Ns,3]) in the world frame.

    Ground sits below the sensor (KITTI-like): the ``w.x = -1`` plane
    parameterization (surface.hpp:47) cannot represent planes through
    the origin, in the reference exactly as here.
    """
    zs = np.linspace(-2, 4, 40)
    poles = []
    for _ in range(n_poles):
        xy = rng.uniform(-extent, extent, size=2)
        poles.append(np.concatenate(
            [np.tile(xy, (len(zs), 1)), zs[:, None]], axis=-1))
    edge_pts = np.concatenate(poles) + rng.normal(
        scale=noise, size=(n_poles * len(zs), 3))
    g = rng.uniform(-extent - 5, extent + 5, size=(n_ground, 2))
    ground = np.concatenate(
        [g, ground_z + rng.normal(scale=noise, size=(n_ground, 1))],
        axis=-1)
    return edge_pts, ground


def synth_scan(world_edges: np.ndarray, world_surfs: np.ndarray,
               pose: Pose, rng: np.random.Generator, n_rings: int = 16,
               n_edge_samples: int = 400, n_surf_samples: int = 1500
               ) -> Tuple[np.ndarray, np.ndarray]:
    """Feature-bearing scan in the sensor frame: a mix of pole hits and
    ground hits, with plausible ring ids from elevation."""
    inv = pose.inverse()
    e_idx = rng.choice(len(world_edges), size=n_edge_samples,
                       replace=False)
    s_idx = rng.choice(len(world_surfs), size=n_surf_samples,
                       replace=False)
    pts_w = np.concatenate([world_edges[e_idx], world_surfs[s_idx]])
    pts = np.asarray(inv.apply(jnp.asarray(pts_w, jnp.float32)))
    d = np.linalg.norm(pts[:, :2], axis=-1)
    elev = np.arctan2(pts[:, 2], np.maximum(d, 1e-6))
    frac = (np.radians(15.0) - elev) / np.radians(30.0)
    ring = np.clip((frac * n_rings).astype(np.int32), 0, n_rings - 1)
    return pts, ring


def straight_drive(i: int) -> Pose:
    """Default scripted trajectory: forward + slight lateral + yaw."""
    yaw = 0.03 * i
    t = np.array([0.5 * i, 0.1 * i, 0.0])
    return Pose(q=quat.exp_so3(jnp.asarray([0, 0, yaw], jnp.float32)),
                t=jnp.asarray(t, jnp.float32))


def make_scan_sequence(world_edges: np.ndarray, world_surfs: np.ndarray,
                       rng: np.random.Generator, n_scans: int,
                       trajectory: Callable[[int], Pose] = straight_drive,
                       n_rings: int = 16, **scan_kwargs
                       ) -> Tuple[list, np.ndarray]:
    """Pre-generate one scan sequence so multiple pipeline variants can
    replay IDENTICAL inputs (required for a fair parity comparison)."""
    scans = []
    gt = []
    for i in range(n_scans):
        pose = trajectory(i)
        scans.append(synth_scan(world_edges, world_surfs, pose, rng,
                                n_rings=n_rings, **scan_kwargs))
        gt.append(np.asarray(pose.t))
    return scans, np.stack(gt)


def run_drive(maps, cfg: PipelineConfig, scans: Sequence,
              scan_period: float = 0.1) -> np.ndarray:
    """Closed-loop replay (localization + EKF feedback, SURVEY.md
    §3.1+§3.2) of a pre-generated scan sequence. Returns the raw
    scan-matcher positions [N, 3]."""
    from lidar_feature_extraction_tpu.pipeline.replay import (
        FusedLocalizationPipeline)

    pipeline = FusedLocalizationPipeline(maps, cfg,
                                         initial_pose=Pose.identity())
    est = []
    for i, (pts, ring) in enumerate(scans):
        res = pipeline.process_scan(pts, ring, stamp=scan_period * i)
        est.append(np.asarray(res.measured_pose.t))
    return np.stack(est)
