"""Reduced-shape closed-loop mapping regression: the flagship full
mapping workload (raycast -> extraction -> odometry -> keyframes ->
loop closure -> pose graph, BASELINE.json config 4) on a circular
drive that returns to its start.

This is the CI-scale twin of ``eval_ate.py eval_slam_loop`` (which
runs 64x2048 / 80 scans and records ATE_EVAL.json): same code path
via ``worldsim.run_mapping_drive``, at 32x1024 / 40 scans. It guards
the r3->r4 fix stack — constant-velocity odometry prior, cold-start
wide-basin re-seed, odometry-frame chain constraints, and the
post-optimization frame correction (VERDICT r3 item 1).
"""

import dataclasses

import numpy as np

from lidar_feature_extraction_tpu.config import kitti_hdl64
from lidar_feature_extraction_tpu.utils import worldsim
from lidar_feature_extraction_tpu.utils.evaluation import ate_rmse


def test_circular_drive_closes_loop_and_stays_metric():
    prod = kitti_hdl64()
    cfg = dataclasses.replace(
        prod,
        extraction=dataclasses.replace(
            prod.extraction, n_rings=32, max_points_per_ring=1024,
            max_edges=1024, max_surfaces=16384))

    rng = np.random.default_rng(0)
    world = worldsim.make_world(rng, n_poles=50, extent=35.0)
    pipeline, gt = worldsim.run_mapping_drive(
        world, cfg, rng, n_scans=40, radius=8.0,
        pipeline_kwargs=dict(loop_radius=6.0, loop_min_gap=10,
                             optimize_every=8),
        n_rings=32, n_az=1024, elev_deg=(2.0, -24.8))

    est = pipeline.trajectory
    n_kf = len(pipeline.keyframes)
    n_loop = len(pipeline.constraints) - (n_kf - 1)
    ate = ate_rmse(est, gt, align=False)
    per_kf = np.linalg.norm(est - gt, axis=-1)

    # The odometry front-end must keep tracking around the whole loop
    # (~50 m, ~1.26 m + 9 deg per scan) ...
    assert n_kf >= 30, n_kf
    # ... the revisit must produce at least one accepted closure ...
    assert n_loop >= 1, (n_kf, len(pipeline.constraints))
    # ... and the optimized trajectory must be metric end to end
    # (measured 0.03 m at r4; the r3 failure mode was 15.6 m).
    assert ate < 0.3, ate
    assert per_kf.max() < 0.5, per_kf.max()
