"""Closed-loop ATE evaluation of the production kitti_hdl64 stack.

Replays one pre-generated synthetic drive (utils/worldsim.py) through
the EXACT benched configuration (``config.py kitti_hdl64``:
64x2304 range image, GeometryMaps, compact extraction) AND through the
faithful path (FeatureMaps, full extraction, per-iteration
neighborhood refits) with identical extraction parameters, then prints
ATE-RMSE of both against ground truth and writes ``ATE_EVAL.json``.

This is the acceptance evidence for the production path's documented
deviations (docs/design.md §8; VERDICT r2 item 1). The CI-speed
regression guard lives in ``tests/test_production_parity.py``; this
script records the full-shape numbers quoted in BASELINE.md.

Run on CPU (the closed loop is host-stepped; accuracy is
shape-independent of the backend):
    JAX_PLATFORMS=cpu python eval_ate.py
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lidar_feature_extraction_tpu.config import kitti_hdl64
    from lidar_feature_extraction_tpu.pipeline.localization import (
        build_feature_maps, build_geometry_maps)
    from lidar_feature_extraction_tpu.utils import worldsim
    from lidar_feature_extraction_tpu.utils.evaluation import (
        ate_rmse, relative_translation_errors)

    production = kitti_hdl64()
    # Faithful variant: identical extraction parameters and shapes; the
    # deviation stack off (full extraction -> point maps -> cached-
    # candidate kNN with per-iteration line/plane refits).
    faithful = dataclasses.replace(
        production,
        compact_extraction=False,
        registration=dataclasses.replace(production.registration,
                                         refit_per_iteration=True))

    rng = np.random.default_rng(0)
    # KITTI-like world ray-cast into full 64-ring HDL-64E sweeps
    # (~110k points/scan, real silhouette discontinuities + occlusion).
    world = worldsim.make_world(rng, n_poles=50, extent=35.0)
    world_edges, world_surfs = worldsim.world_maps(world, rng,
                                                  n_ground=30000)
    scans, gt = worldsim.make_scan_sequence(
        world, rng, n_scans=20, n_rings=64, n_az=2048,
        elev_deg=(2.0, -24.8))
    twists = worldsim.synth_twists(len(scans), rng=rng)

    args = (jnp.asarray(world_edges, jnp.float32),
            jnp.ones(len(world_edges), bool),
            jnp.asarray(world_surfs, jnp.float32),
            jnp.ones(len(world_surfs), bool))
    geometry_maps = build_geometry_maps(*args, production)
    feature_maps = build_feature_maps(*args, faithful)

    out = {}
    for name, maps, cfg in (("production_kitti_hdl64", geometry_maps,
                             production),
                            ("faithful", feature_maps, faithful)):
        t0 = time.time()
        est = worldsim.run_drive(maps, cfg, scans, twists=twists)
        out[name] = {
            "ate_rmse_m": round(ate_rmse(est, gt, align=False), 4),
            "ate_xy_rmse_m": round(ate_rmse(
                np.pad(est[:, :2], ((0, 0), (0, 1))),
                np.pad(gt[:, :2], ((0, 0), (0, 1))), align=False), 4),
            "mean_step_drift_m": round(float(np.mean(
                relative_translation_errors(est, gt))), 4),
            "wall_s": round(time.time() - t0, 1),
        }
        print(name, out[name], flush=True)

    out["ratio_production_over_faithful"] = round(
        out["production_kitti_hdl64"]["ate_rmse_m"]
        / max(out["faithful"]["ate_rmse_m"], 1e-9), 3)
    out["n_scans"] = len(scans)

    out["slam_loop"] = eval_slam_loop(production, world, rng)
    print("slam_loop", out["slam_loop"], flush=True)
    out["slam_loop_imu"] = eval_slam_loop(production, world, rng,
                                          with_imu=True)
    print("slam_loop_imu", out["slam_loop_imu"], flush=True)

    with open("ATE_EVAL.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def eval_slam_loop(cfg, world, rng, n_scans: int = 80,
                   radius: float = 10.0, with_imu: bool = False,
                   scan_period: float = 0.1):
    """Full mapping workload (BASELINE row 4): odometry front-end +
    keyframes + loop closure + pose-graph back-end over a closed
    circular drive on the ray-cast world; ATE of the optimized
    keyframe trajectory vs ground truth. ``with_imu`` feeds synthesized
    IMU windows (fusion/imu.py) as scan-matcher priors and keyframe
    factors — the LIO-SAM-style configuration the reference's stubbed
    imu_integration package intended."""
    import time

    import jax
    import jax.numpy as jnp

    from lidar_feature_extraction_tpu.core import quaternion as quat
    from lidar_feature_extraction_tpu.core.pose import Pose
    from lidar_feature_extraction_tpu.core.scan import build_range_image
    from lidar_feature_extraction_tpu.fusion import imu as imu_mod
    from lidar_feature_extraction_tpu.ops.extraction import (
        extract_features)
    from lidar_feature_extraction_tpu.pipeline.slam import MappingPipeline
    from lidar_feature_extraction_tpu.utils import worldsim
    from lidar_feature_extraction_tpu.utils.evaluation import ate_rmse

    ex = cfg.extraction
    n = ex.n_rings * ex.max_points_per_ring
    extract = jax.jit(lambda im: extract_features(im, ex))

    def gt_pose(i):
        th = 2 * np.pi * i / n_scans
        t = np.array([radius * np.sin(th), radius * (1 - np.cos(th)),
                      0.0])
        return Pose(q=quat.exp_so3(jnp.asarray([0, 0, th], jnp.float32)),
                    t=jnp.asarray(t, jnp.float32))

    gyro = accel = dts = None
    sub = 20                      # IMU substeps per scan interval
    if with_imu:
        fine = [gt_pose(k / sub) for k in range(n_scans * sub + 1)]
        q_f = jnp.stack([p.q for p in fine])
        t_f = jnp.stack([p.t for p in fine])
        gyro, accel, dts, _v0 = imu_mod.synthesize_imu(
            q_f, t_f, scan_period / sub)
        gyro = np.asarray(gyro) + rng.normal(scale=1e-3,
                                             size=gyro.shape)
        accel = np.asarray(accel) + rng.normal(scale=1e-2,
                                               size=accel.shape)
        dts = np.asarray(dts)

    pipeline = MappingPipeline(cfg, loop_radius=6.0, loop_min_gap=10,
                               optimize_every=8)
    t0 = time.time()
    for i in range(n_scans):
        pose = gt_pose(i)
        pts, ring = worldsim.raycast_scan(world, pose, rng, n_rings=64,
                                          n_az=2048,
                                          elev_deg=(2.0, -24.8))
        buf = np.zeros((n, 3), np.float32)
        rid = np.zeros(n, np.int32)
        val = np.zeros(n, bool)
        m = min(len(pts), n)
        buf[:m] = pts[:m]
        rid[:m] = ring[:m]
        val[:m] = True
        image = build_range_image(
            jnp.asarray(buf), jnp.asarray(rid), jnp.asarray(val),
            ex.n_rings, ex.max_points_per_ring,
            min_points_per_ring=ex.padding + 1)
        feats = extract(image)
        if with_imu and i >= 1:
            sl = slice((i - 1) * sub, i * sub)
            pipeline.process_scan(
                feats.edge_xyz, feats.edge_valid,
                feats.surface_xyz, feats.surface_valid,
                stamp=float(i) * scan_period,
                imu_gyro=gyro[sl], imu_accel=accel[sl],
                imu_dts=dts[sl])
        else:
            pipeline.process_scan(feats.edge_xyz, feats.edge_valid,
                                  feats.surface_xyz, feats.surface_valid,
                                  stamp=float(i) * scan_period)
    pipeline.optimize()

    est = pipeline.trajectory
    gt = np.stack([np.asarray(gt_pose(round(kf.stamp / scan_period)).t)
                   for kf in pipeline.keyframes])
    n_chain = len(pipeline.keyframes) - 1
    return {
        "ate_rmse_m": round(ate_rmse(est, gt, align=False), 4),
        "n_keyframes": len(pipeline.keyframes),
        "n_loop_constraints": len(pipeline.constraints) - n_chain,
        "wall_s": round(time.time() - t0, 1),
    }


if __name__ == "__main__":
    main()
