"""End-to-end pipeline tests on synthetic scenes: scan-to-map
localization recovers a perturbed pose; mapping accumulates keyframes;
odometry tracks motion over a short sequence."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.config import (ExtractionConfig,
                                                 PipelineConfig,
                                                 MappingConfig,
                                                 RegistrationConfig,
                                                 VoxelMapConfig)
from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.core.scan import RangeImage
from lidar_feature_extraction_tpu.ops import gauss_newton as gn
from lidar_feature_extraction_tpu.pipeline.localization import (
    build_feature_maps, register_scan)
from lidar_feature_extraction_tpu.pipeline.mapping import MapBuilder
from lidar_feature_extraction_tpu.pipeline.odometry import Odometry


def small_cfg():
    vm = VoxelMapConfig(voxel_size=2.0, table_capacity=1 << 12,
                        points_per_voxel=16, max_probes=8)
    return PipelineConfig(
        extraction=ExtractionConfig(n_rings=8, max_points_per_ring=256,
                                    nms_rounds=32,
                                    max_edges=256, max_surfaces=512),
        registration=RegistrationConfig(n_neighbors=8, max_iterations=30,
                                        edge_map=vm, surface_map=vm),
        mapping=MappingConfig(max_keyframes=16, max_map_points=1 << 14))


def make_world(rng):
    """Edge lines (poles) + surface planes (ground/walls)."""
    zs = np.linspace(-2, 4, 30)
    poles = []
    for _ in range(20):
        xy = rng.uniform(-15, 15, size=2)
        poles.append(np.concatenate(
            [np.tile(xy, (len(zs), 1)), zs[:, None]], axis=-1))
    edge_pts = np.concatenate(poles) + rng.normal(
        scale=0.01, size=(20 * len(zs), 3))
    g = rng.uniform(-20, 20, size=(4000, 2))
    ground = np.concatenate([g, rng.normal(scale=0.01, size=(4000, 1))],
                            axis=-1)
    return edge_pts, ground


def sample_scan_features(world_edges, world_surfs, pose: Pose, rng,
                         n_e=150, n_s=400):
    """Feature points as seen from ``pose`` (sensor frame)."""
    inv = pose.inverse()
    e_idx = rng.choice(len(world_edges), size=n_e, replace=False)
    s_idx = rng.choice(len(world_surfs), size=n_s, replace=False)
    e = np.asarray(inv.apply(jnp.asarray(world_edges[e_idx])))
    s = np.asarray(inv.apply(jnp.asarray(world_surfs[s_idx])))
    return jnp.asarray(e, jnp.float32), jnp.asarray(s, jnp.float32)


def pad_to(pts, capacity):
    n = pts.shape[0]
    out = jnp.zeros((capacity, 3), jnp.float32).at[:n].set(pts)
    return out, jnp.arange(capacity) < n


def test_register_scan_recovers_perturbed_pose():
    rng = np.random.default_rng(0)
    cfg = small_cfg()
    world_edges, world_surfs = make_world(rng)
    maps = build_feature_maps(
        jnp.asarray(world_edges, jnp.float32),
        jnp.ones(len(world_edges), bool),
        jnp.asarray(world_surfs, jnp.float32),
        jnp.ones(len(world_surfs), bool), cfg)

    true_pose = Pose(
        q=quat.exp_so3(jnp.asarray([0.0, 0.0, 0.15], jnp.float32)),
        t=jnp.asarray([1.0, -0.5, 0.1], jnp.float32))
    e, s = sample_scan_features(world_edges, world_surfs, true_pose, rng)
    e_pts, e_valid = pad_to(e, cfg.extraction.max_edges)
    s_pts, s_valid = pad_to(s, cfg.extraction.max_surfaces)

    prior = Pose(
        q=quat.exp_so3(jnp.asarray([0.0, 0.0, 0.1], jnp.float32)),
        t=jnp.asarray([0.7, -0.3, 0.0], jnp.float32))
    result = register_scan(maps, e_pts, e_valid, s_pts, s_valid, prior, cfg)

    t_err = np.linalg.norm(np.asarray(result.pose.t - true_pose.t))
    dq = quat.quat_multiply(quat.quat_conjugate(result.pose.q), true_pose.q)
    ang_err = np.linalg.norm(np.asarray(quat.log_so3(dq)))
    assert t_err < 0.1, (t_err, int(result.status), int(result.iterations))
    assert ang_err < 0.02


def test_map_builder_keyframe_gating():
    rng = np.random.default_rng(1)
    cfg = small_cfg()
    builder = MapBuilder(cfg.mapping, capacity=4096)
    scan = jnp.asarray(rng.uniform(-5, 5, size=(100, 3)), jnp.float32)
    valid = jnp.ones(100, bool)

    p0 = Pose.identity()
    assert builder.add(scan, valid, p0)          # first scan always added
    assert int(builder.state.n) == 100
    # Tiny motion -> rejected
    p1 = Pose(p0.q, p0.t + jnp.asarray([0.1, 0, 0], jnp.float32))
    assert not builder.add(scan, valid, p1)
    assert int(builder.state.n) == 100
    # Large motion -> accepted, transformed correctly
    p2 = Pose(p0.q, p0.t + jnp.asarray([2.0, 0, 0], jnp.float32))
    assert builder.add(scan, valid, p2)
    assert int(builder.state.n) == 200
    got = np.asarray(builder.points[100:200])
    np.testing.assert_allclose(got, np.asarray(scan) + [2.0, 0, 0],
                               atol=1e-5)


def test_map_builder_respects_validity_and_capacity():
    cfg = small_cfg()
    builder = MapBuilder(cfg.mapping, capacity=150)
    scan = jnp.asarray(np.random.default_rng(2).uniform(
        -5, 5, size=(100, 3)), jnp.float32)
    valid = jnp.asarray(np.arange(100) < 60)
    builder.add(scan, valid, Pose.identity())
    assert int(builder.state.n) == 60
    p = Pose(Pose.identity().q, jnp.asarray([3.0, 0, 0], jnp.float32))
    builder.add(scan, valid, p)  # 60 more -> hits capacity 150? no: 120
    assert int(builder.state.n) == 120
    p2 = Pose(Pose.identity().q, jnp.asarray([6.0, 0, 0], jnp.float32))
    builder.add(scan, valid, p2)  # would be 180 -> clipped at 150
    assert int(builder.state.n) == 150


def test_odometry_tracks_simple_motion():
    rng = np.random.default_rng(3)
    cfg = small_cfg()
    world_edges, world_surfs = make_world(rng)

    odo = Odometry(cfg)
    true_poses = []
    for step in range(4):
        yaw = 0.02 * step
        t = np.array([0.4 * step, 0.05 * step, 0.0])
        pose = Pose(q=quat.exp_so3(jnp.asarray([0, 0, yaw], jnp.float32)),
                    t=jnp.asarray(t, jnp.float32))
        true_poses.append(pose)
        e, s = sample_scan_features(world_edges, world_surfs, pose, rng,
                                    n_e=200, n_s=500)
        e_pts, e_valid = pad_to(e, cfg.extraction.max_edges)
        s_pts, s_valid = pad_to(s, cfg.extraction.max_surfaces)
        odo.update(e_pts, e_valid, s_pts, s_valid)

    est = odo.pose
    want = true_poses[-1]
    t_err = np.linalg.norm(np.asarray(est.t - want.t))
    assert t_err < 0.15, t_err


def test_geometry_odometry_matches_point_path_and_evicts():
    """The incremental moment-grid odometry must (a) track like the
    point-grid kNN path on the same inputs, and (b) maintain the
    eviction invariant: after the recent-N window wraps, the moment
    grid equals a fresh scatter of exactly the points still in the
    window (scans that left the window are really gone — within f32
    add/subtract residue)."""
    from lidar_feature_extraction_tpu.ops import geometry_grid as gg
    from lidar_feature_extraction_tpu.pipeline.odometry import (
        init_geometry_odometry)

    rng = np.random.default_rng(11)
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, mapping=dataclasses.replace(cfg.mapping,
                                         recent_scans_window=3))
    world_edges, world_surfs = make_world(rng)

    geo = Odometry(cfg, use_geometry=True)
    pts_ref = Odometry(cfg, use_geometry=False)
    n_steps = 6   # > window: forces eviction
    for step in range(n_steps):
        yaw = 0.02 * step
        t = np.array([0.4 * step, 0.05 * step, 0.0])
        pose = Pose(q=quat.exp_so3(jnp.asarray([0, 0, yaw], jnp.float32)),
                    t=jnp.asarray(t, jnp.float32))
        e, s = sample_scan_features(world_edges, world_surfs, pose, rng,
                                    n_e=200, n_s=500)
        e_pts, e_valid = pad_to(e, cfg.extraction.max_edges)
        s_pts, s_valid = pad_to(s, cfg.extraction.max_surfaces)
        geo.update(e_pts, e_valid, s_pts, s_valid)
        pts_ref.update(e_pts, e_valid, s_pts, s_valid)

    want = np.array([0.4 * (n_steps - 1), 0.05 * (n_steps - 1), 0.0])
    assert np.linalg.norm(np.asarray(geo.pose.t) - want) < 0.15
    assert np.linalg.norm(np.asarray(geo.pose.t)
                          - np.asarray(pts_ref.pose.t)) < 0.15

    # Eviction invariant.
    st = geo.state
    dims = cfg.registration.odometry_grid_dims
    for m, origin, window, mask, vox in (
            (st.edge_m, st.edge_origin, st.edge_window, st.edge_mask,
             cfg.registration.edge_map.voxel_size),
            (st.surf_m, st.surf_origin, st.surf_window, st.surf_mask,
             cfg.registration.surface_map.voxel_size)):
        fresh = gg.voxel_moments(window.reshape(-1, 3),
                                 mask.reshape(-1), vox, origin, dims)
        np.testing.assert_allclose(np.asarray(m), np.asarray(fresh),
                                   atol=5e-3)


def test_pcd_roundtrip(tmp_path):
    from lidar_feature_extraction_tpu.io import pcd

    rng = np.random.default_rng(4)
    pts = rng.normal(size=(257, 3)).astype(np.float32)
    path = str(tmp_path / "m.pcd")
    pcd.save_pcd(path, pts, binary=True)
    back = pcd.load_pcd(path)
    np.testing.assert_allclose(back, pts, atol=1e-7)
    pcd.save_pcd(path, pts, binary=False)
    back = pcd.load_pcd(path)
    np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-6)


def test_kitti_bin_reader(tmp_path):
    from lidar_feature_extraction_tpu.io import kitti

    rng = np.random.default_rng(5)
    scan = rng.normal(size=(1000, 4)).astype(np.float32)
    path = str(tmp_path / "000000.bin")
    scan.tofile(path)
    back = kitti.read_velodyne_bin(path)
    np.testing.assert_array_equal(back, scan)
    rings = kitti.estimate_rings(scan[:, :3])
    assert rings.shape == (1000,)
    assert (rings >= 0).all() and (rings < 64).all()


def test_register_scan_refit_modes_agree():
    """Hoisted-geometry registration (refit_per_iteration=False) must
    recover the same pose as the per-iteration re-rank path."""
    import dataclasses

    rng = np.random.default_rng(3)
    cfg = small_cfg()
    world_edges, world_surfs = make_world(rng)
    maps = build_feature_maps(
        jnp.asarray(world_edges, jnp.float32),
        jnp.ones(len(world_edges), bool),
        jnp.asarray(world_surfs, jnp.float32),
        jnp.ones(len(world_surfs), bool), cfg)

    true_pose = Pose(
        q=quat.exp_so3(jnp.asarray([0.0, 0.0, -0.12], jnp.float32)),
        t=jnp.asarray([-0.8, 0.6, 0.05], jnp.float32))
    e, s = sample_scan_features(world_edges, world_surfs, true_pose, rng)
    e_pts, e_valid = pad_to(e, cfg.extraction.max_edges)
    s_pts, s_valid = pad_to(s, cfg.extraction.max_surfaces)
    prior = Pose(
        q=quat.exp_so3(jnp.asarray([0.0, 0.0, -0.08], jnp.float32)),
        t=jnp.asarray([-0.5, 0.4, 0.0], jnp.float32))

    cfg_refit = dataclasses.replace(
        cfg, registration=dataclasses.replace(
            cfg.registration, refit_per_iteration=True))

    fast = register_scan(maps, e_pts, e_valid, s_pts, s_valid, prior, cfg)
    slow = register_scan(maps, e_pts, e_valid, s_pts, s_valid, prior,
                         cfg_refit)

    for r in (fast, slow):
        t_err = np.linalg.norm(np.asarray(r.pose.t - true_pose.t))
        assert t_err < 0.1, (t_err, int(r.status))
    np.testing.assert_allclose(np.asarray(fast.pose.t),
                               np.asarray(slow.pose.t), atol=0.02)
