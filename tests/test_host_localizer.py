"""HostLocalizer must match the fused register_scan path (same math,
different execution strategy)."""

import numpy as np
import jax.numpy as jnp

from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.pipeline.localization import (
    HostLocalizer, build_feature_maps, register_scan)
from test_pipeline import make_world, pad_to, sample_scan_features, small_cfg


def test_host_localizer_matches_fused_registration():
    rng = np.random.default_rng(0)
    cfg = small_cfg()
    world_edges, world_surfs = make_world(rng)
    maps = build_feature_maps(
        jnp.asarray(world_edges, jnp.float32),
        jnp.ones(len(world_edges), bool),
        jnp.asarray(world_surfs, jnp.float32),
        jnp.ones(len(world_surfs), bool), cfg)

    true_pose = Pose(
        q=quat.exp_so3(jnp.asarray([0.0, 0.0, 0.12], jnp.float32)),
        t=jnp.asarray([0.8, -0.4, 0.1], jnp.float32))
    e, s = sample_scan_features(world_edges, world_surfs, true_pose, rng)
    e_pts, e_valid = pad_to(e, cfg.extraction.max_edges)
    s_pts, s_valid = pad_to(s, cfg.extraction.max_surfaces)
    prior = Pose(
        q=quat.exp_so3(jnp.asarray([0.0, 0.0, 0.08], jnp.float32)),
        t=jnp.asarray([0.5, -0.2, 0.0], jnp.float32))

    fused = register_scan(maps, e_pts, e_valid, s_pts, s_valid, prior, cfg)

    localizer = HostLocalizer(maps, cfg)
    hosted = localizer.register(e_pts, e_valid, s_pts, s_valid, prior)

    # Both must recover the true pose; trajectories of the two loop
    # drivers can differ in iteration count (host exits rounds early on
    # convergence) but the fixed point is the same.
    for result in (fused, hosted):
        t_err = np.linalg.norm(np.asarray(result.pose.t - true_pose.t))
        assert t_err < 0.1, (t_err, int(result.status))
    np.testing.assert_allclose(np.asarray(hosted.pose.t),
                               np.asarray(fused.pose.t), atol=5e-3)
    np.testing.assert_allclose(np.asarray(hosted.pose.q),
                               np.asarray(fused.pose.q), atol=5e-3)


def test_host_localizer_empty_scan():
    rng = np.random.default_rng(1)
    cfg = small_cfg()
    world_edges, world_surfs = make_world(rng)
    maps = build_feature_maps(
        jnp.asarray(world_edges, jnp.float32),
        jnp.ones(len(world_edges), bool),
        jnp.asarray(world_surfs, jnp.float32),
        jnp.ones(len(world_surfs), bool), cfg)
    localizer = HostLocalizer(maps, cfg)
    e_pts = jnp.zeros((cfg.extraction.max_edges, 3), jnp.float32)
    s_pts = jnp.zeros((cfg.extraction.max_surfaces, 3), jnp.float32)
    no = jnp.zeros(cfg.extraction.max_edges, bool)
    no_s = jnp.zeros(cfg.extraction.max_surfaces, bool)
    prior = Pose.identity()
    result = localizer.register(e_pts, no, s_pts, no_s, prior)
    from lidar_feature_extraction_tpu.ops import gauss_newton as gn
    assert int(result.status) == gn.EMPTY_INPUT
    np.testing.assert_allclose(np.asarray(result.pose.t),
                               np.asarray(prior.t))
