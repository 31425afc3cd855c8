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

import numpy as np
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


class GeometryOdometryState(NamedTuple):
    """Incremental moment-grid odometry map + rolling eviction window.

    Instead of rebuilding correspondence structures from the merged
    recent-scans window every update (the reference rebuilds KD-trees
    per scan, ``recent_scans.hpp:74``; the point-grid path above
    rebuilds dense voxel grids), the map IS a persistent pair of
    per-voxel moment grids (ops/geometry_grid.py): moments are
    additive, so inserting the new scan is one scatter-ADD and
    evicting the scan leaving the recent-N window is the same scatter
    with weight -1. The vehicle-following grid re-centers by integer
    voxel rolls (``recenter_moments``). Per update only the
    neighborhood box-filter + closed-form fits run over the dense
    grid — pure VPU passes — and registration re-searches per GN
    iteration with one 8-float record gather per point, exactly the
    production localization fast path."""

    edge_m: jnp.ndarray       # [Ce, 10] raw per-voxel moments
    surf_m: jnp.ndarray       # [Cs, 10]
    edge_origin: jnp.ndarray  # [3]
    surf_origin: jnp.ndarray  # [3]
    edge_window: jnp.ndarray  # [W, E, 3] world-frame inserted points
    edge_mask: jnp.ndarray    # [W, E]
    surf_window: jnp.ndarray  # [W, S, 3]
    surf_mask: jnp.ndarray    # [W, S]
    slot: jnp.ndarray
    n_scans: jnp.ndarray
    pose_q: jnp.ndarray
    pose_t: jnp.ndarray


def init_geometry_odometry(cfg: PipelineConfig,
                           dtype=jnp.float32) -> GeometryOdometryState:
    w = cfg.mapping.recent_scans_window
    e = cfg.extraction.max_edges
    s = cfg.extraction.max_surfaces
    reg = cfg.registration
    dims = reg.odometry_grid_dims
    cap = dims[0] * dims[1] * dims[2]
    half_e = np.asarray(dims) * reg.edge_map.voxel_size / 2.0
    half_s = np.asarray(dims) * reg.surface_map.voxel_size / 2.0
    return GeometryOdometryState(
        edge_m=jnp.zeros((cap, 10), dtype),
        surf_m=jnp.zeros((cap, 10), dtype),
        edge_origin=jnp.asarray(-half_e, dtype),
        surf_origin=jnp.asarray(-half_s, dtype),
        edge_window=jnp.zeros((w, e, 3), dtype),
        edge_mask=jnp.zeros((w, e), bool),
        surf_window=jnp.zeros((w, s, 3), dtype),
        surf_mask=jnp.zeros((w, s), bool),
        slot=jnp.zeros((), jnp.int32),
        n_scans=jnp.zeros((), jnp.int32),
        pose_q=jnp.array([1.0, 0, 0, 0], dtype),
        pose_t=jnp.zeros(3, dtype))


@partial(jax.jit, static_argnames=("cfg",))
def geometry_odometry_step(state: GeometryOdometryState, edge_pts,
                           edge_valid, surf_pts, surf_valid,
                           cfg: PipelineConfig, prior_q=None,
                           prior_t=None):
    """One incremental odometry update: re-center, fit, register,
    evict + insert. Same ``Odometry::Update`` semantics as
    ``odometry_step`` (odometry.hpp:52-64) at the production
    fast path's per-iteration cost."""
    from lidar_feature_extraction_tpu.ops import geometry_grid as gg

    reg = cfg.registration
    em, sm = reg.edge_map, reg.surface_map
    dims = reg.odometry_grid_dims
    pose = Pose(state.pose_q if prior_q is None else prior_q,
                state.pose_t if prior_t is None else prior_t)
    is_first = state.n_scans == 0

    # 1. Grids follow the vehicle (integer-voxel rolls, no rebuild).
    edge_m, edge_origin = gg.recenter_moments(
        state.edge_m, dims, em.voxel_size, state.edge_origin, pose.t)
    surf_m, surf_origin = gg.recenter_moments(
        state.surf_m, dims, sm.voxel_size, state.surf_origin, pose.t)

    # 2. Finalize per-voxel line/plane fits (box-filter + eig3).
    edge_grid = gg.GeometryGrid(
        rec=gg.edge_records_from_moments(edge_m, dims, em.voxel_size,
                                         edge_origin),
        voxel_size=jnp.asarray(em.voxel_size, edge_m.dtype),
        origin=edge_origin, dims=dims)
    surf_grid = gg.GeometryGrid(
        rec=gg.surface_records_from_moments(surf_m, dims, sm.voxel_size,
                                            surf_origin),
        voxel_size=jnp.asarray(sm.voxel_size, surf_m.dtype),
        origin=surf_origin, dims=dims)

    surf_ds, surf_ds_valid = voxel_downsample(
        surf_pts, surf_valid, reg.surface_downsample_leaf,
        reg.max_surface_points)

    def problem_fn(p: Pose) -> gn.Problem:
        eb = gg.edge_rows_from_grid(edge_grid, edge_pts, edge_valid, p,
                                    reg.min_fit_points)
        sb = gg.surface_rows_from_grid(surf_grid, surf_ds, surf_ds_valid,
                                       p, reg.min_fit_points)
        return gn.make_problem([eb, sb])

    result = gn.run_gauss_newton(
        problem_fn, pose, max_iterations=reg.max_iterations,
        convergence_tol=reg.convergence_tol, huber_k=reg.huber_k,
        degeneracy_threshold=reg.degeneracy_threshold)

    new_q = jnp.where(is_first, state.pose_q, result.pose.q)
    new_t = jnp.where(is_first, state.pose_t, result.pose.t)
    new_pose = Pose(new_q, new_t)

    # 3. Evict the slot leaving the window and insert the new scan —
    # ONE signed moment scatter per grid.
    te = new_pose.apply(edge_pts)
    ts = new_pose.apply(surf_pts)
    old_e = jax.lax.dynamic_index_in_dim(state.edge_window, state.slot,
                                         0, keepdims=False)
    old_em = jax.lax.dynamic_index_in_dim(state.edge_mask, state.slot,
                                          0, keepdims=False)
    old_s = jax.lax.dynamic_index_in_dim(state.surf_window, state.slot,
                                         0, keepdims=False)
    old_sm = jax.lax.dynamic_index_in_dim(state.surf_mask, state.slot,
                                          0, keepdims=False)
    sign_e = jnp.concatenate([jnp.ones(te.shape[0], te.dtype),
                              jnp.full(old_e.shape[0], -1.0, te.dtype)])
    sign_s = jnp.concatenate([jnp.ones(ts.shape[0], ts.dtype),
                              jnp.full(old_s.shape[0], -1.0, ts.dtype)])
    edge_m = edge_m + gg.voxel_moments(
        jnp.concatenate([te, old_e]), jnp.concatenate([edge_valid, old_em]),
        em.voxel_size, edge_origin, dims, weight=sign_e)
    surf_m = surf_m + gg.voxel_moments(
        jnp.concatenate([ts, old_s]), jnp.concatenate([surf_valid, old_sm]),
        sm.voxel_size, surf_origin, dims, weight=sign_s)

    w = state.edge_window.shape[0]
    new_state = GeometryOdometryState(
        edge_m=edge_m, surf_m=surf_m,
        edge_origin=edge_origin, surf_origin=surf_origin,
        edge_window=jax.lax.dynamic_update_index_in_dim(
            state.edge_window, te, state.slot, 0),
        edge_mask=jax.lax.dynamic_update_index_in_dim(
            state.edge_mask, edge_valid, state.slot, 0),
        surf_window=jax.lax.dynamic_update_index_in_dim(
            state.surf_window, ts, state.slot, 0),
        surf_mask=jax.lax.dynamic_update_index_in_dim(
            state.surf_mask, surf_valid, state.slot, 0),
        slot=(state.slot + 1) % w, n_scans=state.n_scans + 1,
        pose_q=new_q, pose_t=new_t)
    return new_state, result


class Odometry:
    """Host facade mirroring the C++ ``Odometry`` template, plus the
    IMU-aided prior path the reference's stubbed ``imu_integration``
    package intended (LIO-SAM lineage, SURVEY.md §2.6).

    ``use_geometry=True`` (default) runs the incremental moment-grid
    map (``geometry_odometry_step``) — the production fast path's
    registration cost per iteration; ``False`` keeps the point-grid
    kNN path (``odometry_step``), the direct analogue of the
    reference's merged-window KD-trees."""

    def __init__(self, cfg: PipelineConfig, dtype=jnp.float32,
                 use_geometry: bool = True):
        self.cfg = cfg
        self.use_geometry = use_geometry
        self._step = (geometry_odometry_step if use_geometry
                      else odometry_step)
        self.state = (init_geometry_odometry(cfg, dtype) if use_geometry
                      else init_odometry(cfg, dtype))
        self.velocity = jnp.zeros(3, dtype)
        self._last_pose: Pose | None = None
        self._preintegrate = jax.jit(
            lambda g, a, d: imu_mod.preintegrate(
                g, a, d, jnp.zeros(3, dtype), jnp.zeros(3, dtype)))

    def update(self, edge_pts, edge_valid, surf_pts, surf_valid,
               prior: Pose | None = None):
        if prior is None:
            self.state, result = self._step(
                self.state, edge_pts, edge_valid, surf_pts, surf_valid,
                self.cfg)
        else:
            self.state, result = self._step(
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
