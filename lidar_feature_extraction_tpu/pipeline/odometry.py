"""Scan-to-scan odometry: the TPU equivalent of the reference's
library-only odometry path (``localization/include/
lidar_feature_localization/odometry.hpp:43-73``, ``pose_updater.hpp:
44-71``, ``recent_scans.hpp:56-87``; the binary is never built there,
SURVEY.md §2.2).

Design: a rolling window of the last N transformed feature scans lives
in one fixed-shape device ring buffer [N, max_pts, 3] + masks. Each new
scan registers against the merged window (voxel-hash maps rebuilt on
device per step — the reference likewise rebuilds KD-trees of the merged
recent scans every update, recent_scans.hpp:74) and is then inserted at
its estimated pose.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.config import PipelineConfig
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.fusion import imu as imu_mod
from lidar_feature_extraction_tpu.ops import gauss_newton as gn
from lidar_feature_extraction_tpu.ops.downsample import voxel_downsample
from lidar_feature_extraction_tpu.ops.residuals import (edge_residuals,
                                                        surface_residuals)
from lidar_feature_extraction_tpu.ops import voxel_grid as vg


class OdometryState(NamedTuple):
    """Rolling window of transformed feature scans + current pose."""

    edge_window: jnp.ndarray    # [W, E, 3] map-frame edge points
    edge_mask: jnp.ndarray      # [W, E]
    surf_window: jnp.ndarray    # [W, S, 3]
    surf_mask: jnp.ndarray      # [W, S]
    slot: jnp.ndarray           # scalar int32 next write slot (ring)
    n_scans: jnp.ndarray        # scalar int32 total scans inserted
    pose_q: jnp.ndarray
    pose_t: jnp.ndarray


def init_odometry(cfg: PipelineConfig, dtype=jnp.float32) -> OdometryState:
    w = cfg.mapping.recent_scans_window
    e = cfg.extraction.max_edges
    s = cfg.extraction.max_surfaces
    return OdometryState(
        edge_window=jnp.zeros((w, e, 3), dtype),
        edge_mask=jnp.zeros((w, e), bool),
        surf_window=jnp.zeros((w, s, 3), dtype),
        surf_mask=jnp.zeros((w, s), bool),
        slot=jnp.zeros((), jnp.int32),
        n_scans=jnp.zeros((), jnp.int32),
        pose_q=jnp.array([1.0, 0, 0, 0], dtype),
        pose_t=jnp.zeros(3, dtype))


@partial(jax.jit, static_argnames=("cfg",))
def odometry_step(state: OdometryState, edge_pts, edge_valid, surf_pts,
                  surf_valid, cfg: PipelineConfig, prior_q=None,
                  prior_t=None):
    """One odometry update (Odometry::Update, odometry.hpp:52-64):
    register the scan's features against the merged recent window,
    then insert the transformed scan at the new pose. The first scan
    initializes the window without registration.

    ``prior_q``/``prior_t`` override the Gauss-Newton starting pose
    (default: the previous pose, the reference's constant-position
    prior). The IMU-aided path passes the preintegrated prediction
    (fusion/imu.py predict_state) here."""
    reg = cfg.registration
    pose = Pose(state.pose_q if prior_q is None else prior_q,
                state.pose_t if prior_t is None else prior_t)
    is_first = state.n_scans == 0

    merged_edges = state.edge_window.reshape(-1, 3)
    merged_edge_mask = state.edge_mask.reshape(-1)
    merged_surfs = state.surf_window.reshape(-1, 3)
    merged_surf_mask = state.surf_mask.reshape(-1)

    # Dense grids re-centered on the current pose every step (dims are
    # static; the origin is a traced array, so no recompilation). The
    # reference likewise rebuilds its KD-trees of the merged recent
    # scans every update (recent_scans.hpp:74).
    em, sm = reg.edge_map, reg.surface_map
    dims = reg.odometry_grid_dims
    half_e = jnp.asarray(dims, state.pose_t.dtype) * em.voxel_size / 2.0
    half_s = jnp.asarray(dims, state.pose_t.dtype) * sm.voxel_size / 2.0
    edge_map = vg.build_voxel_grid(
        merged_edges, merged_edge_mask, em.voxel_size,
        state.pose_t - half_e, dims, em.points_per_voxel)
    surf_map = vg.build_voxel_grid(
        merged_surfs, merged_surf_mask, sm.voxel_size,
        state.pose_t - half_s, dims, sm.points_per_voxel)

    surf_ds, surf_ds_valid = voxel_downsample(
        surf_pts, surf_valid, reg.surface_downsample_leaf,
        reg.max_surface_points)

    def problem_fn(p: Pose) -> gn.Problem:
        eb = edge_residuals(edge_map, edge_pts, edge_valid, p,
                            reg.n_neighbors)
        sb = surface_residuals(surf_map, surf_ds, surf_ds_valid, p,
                               reg.n_neighbors)
        return gn.make_problem([eb, sb])

    result = gn.run_gauss_newton(
        problem_fn, pose, max_iterations=reg.max_iterations,
        convergence_tol=reg.convergence_tol, huber_k=reg.huber_k,
        degeneracy_threshold=reg.degeneracy_threshold)

    new_q = jnp.where(is_first, state.pose_q, result.pose.q)
    new_t = jnp.where(is_first, state.pose_t, result.pose.t)
    new_pose = Pose(new_q, new_t)

    # Insert the transformed scan into the ring buffer slot.
    w = state.edge_window.shape[0]
    te = new_pose.apply(edge_pts)
    ts = new_pose.apply(surf_pts)
    ew = jax.lax.dynamic_update_index_in_dim(
        state.edge_window, te, state.slot, 0)
    emk = jax.lax.dynamic_update_index_in_dim(
        state.edge_mask, edge_valid, state.slot, 0)
    sw = jax.lax.dynamic_update_index_in_dim(
        state.surf_window, ts, state.slot, 0)
    smk = jax.lax.dynamic_update_index_in_dim(
        state.surf_mask, surf_valid, state.slot, 0)

    new_state = OdometryState(
        edge_window=ew, edge_mask=emk, surf_window=sw, surf_mask=smk,
        slot=(state.slot + 1) % w, n_scans=state.n_scans + 1,
        pose_q=new_q, pose_t=new_t)
    return new_state, result


class Odometry:
    """Host facade mirroring the C++ ``Odometry`` template, plus the
    IMU-aided prior path the reference's stubbed ``imu_integration``
    package intended (LIO-SAM lineage, SURVEY.md §2.6)."""

    def __init__(self, cfg: PipelineConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.state = init_odometry(cfg, dtype)
        self.velocity = jnp.zeros(3, dtype)
        self._last_pose: Pose | None = None
        self._preintegrate = jax.jit(
            lambda g, a, d: imu_mod.preintegrate(
                g, a, d, jnp.zeros(3, dtype), jnp.zeros(3, dtype)))

    def update(self, edge_pts, edge_valid, surf_pts, surf_valid,
               prior: Pose | None = None):
        if prior is None:
            self.state, result = odometry_step(
                self.state, edge_pts, edge_valid, surf_pts, surf_valid,
                self.cfg)
        else:
            self.state, result = odometry_step(
                self.state, edge_pts, edge_valid, surf_pts, surf_valid,
                self.cfg, prior_q=prior.q, prior_t=prior.t)
        return result

    def update_with_imu(self, edge_pts, edge_valid, surf_pts, surf_valid,
                        gyro, accel, dts):
        """Odometry update with the scan-matcher seeded by the IMU
        prediction over the inter-scan window (gyro/accel/dts: [N, 3] /
        [N, 3] / [N] samples since the previous scan). Velocity state
        is corrected from the registered poses after each update."""
        pre = self._preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                                 jnp.asarray(dts))
        q, t, _v = imu_mod.predict_state(
            self.state.pose_q, self.state.pose_t, self.velocity, pre)
        prev_t = self.state.pose_t
        result = self.update(edge_pts, edge_valid, surf_pts, surf_valid,
                             prior=Pose(q, t))
        # Velocity from registered motion (more stable than trusting
        # the IMU-propagated velocity once the matcher has corrected
        # the pose).
        window_dt = jnp.maximum(pre.dt, 1e-6)
        self.velocity = (self.state.pose_t - prev_t) / window_dt
        return result

    @property
    def pose(self) -> Pose:
        return Pose(self.state.pose_q, self.state.pose_t)
