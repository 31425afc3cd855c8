"""IMU wiring tests: dead-reckoning prediction, the IMU-aided odometry
prior, and preintegrated factors in the keyframe graph back-end.

The reference's ``imu_integration`` package is an empty stub
(``imu_integration/include/imu_integration/integration.hpp:30-33``);
these tests cover the LIO-SAM-style integration it was meant to have."""

import numpy as np
import jax.numpy as jnp

from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.fusion import imu as imu_mod
from lidar_feature_extraction_tpu.parallel.imu_graph import (
    ImuFactors, ImuGraph, optimize_imu_graph, weights_from_covariance)
from lidar_feature_extraction_tpu.parallel.pose_graph import (
    Constraints, PoseGraph, optimize_pose_graph)
from lidar_feature_extraction_tpu.utils.evaluation import ate_rmse


def arc_trajectory(n: int, dt: float, speed: float = 2.0,
                   radius: float = 20.0):
    """Constant-speed arc: poses [n, 4]/[n, 3], yaw tangent to the
    circle."""
    s = speed * dt * np.arange(n)
    theta = s / radius
    t = np.stack([radius * np.sin(theta),
                  radius * (1 - np.cos(theta)),
                  np.zeros(n)], axis=-1).astype(np.float32)
    q = np.stack([np.asarray(quat.exp_so3(
        jnp.asarray([0.0, 0.0, th], jnp.float32))) for th in theta])
    return jnp.asarray(q), jnp.asarray(t)


def test_synthesized_imu_dead_reckons_trajectory():
    """preintegrate + predict_state over synthesized IMU reproduces the
    generating trajectory (sample by sample)."""
    n, dt = 50, 0.02
    q_gt, t_gt = arc_trajectory(n, dt)
    gyro, accel, dts, v0 = imu_mod.synthesize_imu(q_gt, t_gt, dt)

    q, t, v = q_gt[0], t_gt[0], v0
    zero = jnp.zeros(3)
    errs = []
    for k in range(n - 1):
        pre = imu_mod.preintegrate(gyro[k:k + 1], accel[k:k + 1],
                                   dts[k:k + 1], zero, zero)
        q, t, v = imu_mod.predict_state(q, t, v, pre)
        errs.append(float(jnp.linalg.norm(t - t_gt[k + 1])))
    # ZOH integration error accumulates ~ a * dt^2 per step.
    assert max(errs) < 0.05, max(errs)
    # Final orientation matches.
    dq = quat.quat_multiply(quat.quat_conjugate(q), q_gt[-1])
    assert float(jnp.linalg.norm(quat.log_so3(dq))) < 1e-3


def test_imu_factors_reduce_keyframe_graph_drift():
    """A drifting odometry chain + clean IMU factors: the IMU-aware
    graph recovers the trajectory; the pose-only graph cannot (its only
    information is the drifted chain itself)."""
    rng = np.random.default_rng(0)
    n, dt, kf_every = 101, 0.05, 10
    q_gt, t_gt = arc_trajectory(n, dt)
    gyro, accel, dts, v0 = imu_mod.synthesize_imu(q_gt, t_gt, dt)

    kf_idx = list(range(0, n, kf_every))
    k = len(kf_idx)
    zero = jnp.zeros(3)

    # Corrupted odometry: per-interval relative pose with a yaw bias
    # and translation noise.
    rels = []
    for a, b in zip(kf_idx[:-1], kf_idx[1:]):
        pa = Pose(q_gt[a], t_gt[a])
        pb = Pose(q_gt[b], t_gt[b])
        rel = pa.inverse().compose(pb)
        bad_q = quat.quat_multiply(rel.q, quat.exp_so3(
            jnp.asarray([0, 0, 0.02], jnp.float32)))
        bad_t = rel.t + jnp.asarray(
            rng.normal(scale=0.05, size=3), jnp.float32)
        rels.append(Pose(bad_q, bad_t))

    # Integrate the corrupted chain for the initial guess.
    init_q, init_t = [q_gt[0]], [t_gt[0]]
    for rel in rels:
        p = Pose(init_q[-1], init_t[-1]).compose(rel)
        init_q.append(p.q)
        init_t.append(p.t)
    init_q = jnp.stack(init_q)
    init_t = jnp.stack(init_t)
    gt_kf = np.asarray(t_gt)[kf_idx]
    ate_init = ate_rmse(np.asarray(init_t), gt_kf, align=False)
    assert ate_init > 0.3, ate_init  # the chain really drifts

    cons = Constraints(
        i=jnp.arange(k - 1, dtype=jnp.int32),
        j=jnp.arange(1, k, dtype=jnp.int32),
        z_q=jnp.stack([r.q for r in rels]),
        z_t=jnp.stack([r.t for r in rels]),
        weight=jnp.ones(k - 1, jnp.float32))

    pres = [imu_mod.preintegrate(gyro[a:b], accel[a:b], dts[a:b],
                                 zero, zero)
            for a, b in zip(kf_idx[:-1], kf_idx[1:])]
    cov = jnp.stack([p.cov for p in pres])
    w_rot, w_vel, w_pos = weights_from_covariance(cov)
    imu = ImuFactors(
        i=jnp.arange(k - 1, dtype=jnp.int32),
        j=jnp.arange(1, k, dtype=jnp.int32),
        dq=jnp.stack([p.dq for p in pres]),
        dv=jnp.stack([p.dv for p in pres]),
        dp=jnp.stack([p.dp for p in pres]),
        dt=jnp.stack([p.dt for p in pres]),
        w_rot=w_rot, w_vel=w_vel, w_pos=w_pos,
        weight=jnp.ones(k - 1, jnp.float32))

    v_init = jnp.asarray(np.gradient(np.asarray(init_t), axis=0)
                         / (kf_every * dt), jnp.float32)
    out9 = optimize_imu_graph(
        ImuGraph(poses_q=init_q, poses_t=init_t, vels=v_init),
        cons, imu, n_iterations=15)
    ate_imu = ate_rmse(np.asarray(out9.poses_t), gt_kf, align=False)

    out6 = optimize_pose_graph(
        PoseGraph(poses_q=init_q, poses_t=init_t), cons,
        n_iterations=15)
    ate_pose_only = ate_rmse(np.asarray(out6.poses_t), gt_kf,
                             align=False)

    print(f"init {ate_init:.3f}  pose-only {ate_pose_only:.3f}  "
          f"imu {ate_imu:.3f}")
    assert ate_imu < 0.5 * ate_init, (ate_imu, ate_init)
    assert ate_imu < 0.5 * ate_pose_only, (ate_imu, ate_pose_only)


def test_odometry_imu_prior_tracks_fast_rotation():
    """A turn too fast for the constant-position prior: plain odometry
    loses the registration; the IMU-predicted prior keeps it inside
    the Gauss-Newton convergence basin."""
    from test_pipeline import (make_world, pad_to, sample_scan_features,
                               small_cfg)
    from lidar_feature_extraction_tpu.pipeline.odometry import Odometry

    rng = np.random.default_rng(4)
    cfg = small_cfg()
    world_edges, world_surfs = make_world(rng)

    n_scans, yaw_rate, dt = 6, 0.5, 0.1   # ~29 deg per scan
    qs, ts = [], []
    for i in range(n_scans):
        yaw = yaw_rate * i
        qs.append(np.asarray(quat.exp_so3(
            jnp.asarray([0, 0, yaw], jnp.float32))))
        ts.append([0.3 * i, 0.2 * i, 0.0])
    q_gt = jnp.asarray(np.stack(qs), jnp.float32)
    t_gt = jnp.asarray(np.asarray(ts), jnp.float32)
    gyro, accel, dts, v0 = imu_mod.synthesize_imu(q_gt, t_gt, dt)

    def scans():
        r = np.random.default_rng(5)
        for i in range(n_scans):
            pose = Pose(q_gt[i], t_gt[i])
            e, s = sample_scan_features(world_edges, world_surfs, pose,
                                        r, n_e=200, n_s=500)
            e_pts, e_valid = pad_to(e, cfg.extraction.max_edges)
            s_pts, s_valid = pad_to(s, cfg.extraction.max_surfaces)
            yield e_pts, e_valid, s_pts, s_valid

    plain = Odometry(cfg)
    for e_pts, e_valid, s_pts, s_valid in scans():
        plain.update(e_pts, e_valid, s_pts, s_valid)

    aided = Odometry(cfg)
    aided.velocity = v0
    for i, (e_pts, e_valid, s_pts, s_valid) in enumerate(scans()):
        if i == 0:
            aided.update(e_pts, e_valid, s_pts, s_valid)
        else:
            aided.update_with_imu(e_pts, e_valid, s_pts, s_valid,
                                  gyro[i - 1:i], accel[i - 1:i],
                                  dts[i - 1:i])

    err_plain = float(jnp.linalg.norm(plain.pose.t - t_gt[-1]))
    err_aided = float(jnp.linalg.norm(aided.pose.t - t_gt[-1]))
    yaw_err_aided = abs(float(quat.quat_yaw(aided.pose.q))
                        - yaw_rate * (n_scans - 1))
    print(f"plain {err_plain:.3f}  aided {err_aided:.3f}")
    assert err_aided < 0.3, err_aided
    assert yaw_err_aided < 0.1, yaw_err_aided
    assert err_plain > 2 * err_aided, (err_plain, err_aided)


def test_mapping_pipeline_consumes_imu():
    """End-to-end: MappingPipeline fed IMU windows uses the IMU prior
    for odometry, accumulates preintegrated factors between keyframes,
    and optimizes over the IMU-aware graph."""
    from test_pipeline import (make_world, pad_to, sample_scan_features,
                               small_cfg)
    from lidar_feature_extraction_tpu.pipeline.slam import MappingPipeline

    rng = np.random.default_rng(6)
    cfg = small_cfg()
    world_edges, world_surfs = make_world(rng)

    n_scans, yaw_rate, dt = 6, 0.4, 0.1
    qs, ts = [], []
    for i in range(n_scans):
        qs.append(np.asarray(quat.exp_so3(
            jnp.asarray([0, 0, yaw_rate * i], jnp.float32))))
        ts.append([0.6 * i, 0.3 * i, 0.0])
    q_gt = jnp.asarray(np.stack(qs), jnp.float32)
    t_gt = jnp.asarray(np.asarray(ts), jnp.float32)
    gyro, accel, dts, v0 = imu_mod.synthesize_imu(q_gt, t_gt, dt)

    pipeline = MappingPipeline(cfg, loop_min_gap=99, optimize_every=99)
    pipeline.odometry.velocity = v0
    for i in range(n_scans):
        pose = Pose(q_gt[i], t_gt[i])
        e, s = sample_scan_features(world_edges, world_surfs, pose, rng,
                                    n_e=200, n_s=500)
        e_pts, e_valid = pad_to(e, cfg.extraction.max_edges)
        s_pts, s_valid = pad_to(s, cfg.extraction.max_surfaces)
        kwargs = {}
        if i > 0:
            kwargs = dict(imu_gyro=gyro[i - 1:i],
                          imu_accel=accel[i - 1:i],
                          imu_dts=dts[i - 1:i])
        pipeline.process_scan(e_pts, e_valid, s_pts, s_valid,
                              stamp=dt * i, **kwargs)

    assert len(pipeline.keyframes) >= 3
    assert len(pipeline.imu_factors) == len(pipeline.keyframes) - 1
    pipeline.optimize()
    assert pipeline._vels is not None
    traj = pipeline.trajectory
    gt = np.asarray(t_gt)
    for p in traj:
        d = np.linalg.norm(gt - p, axis=-1).min()
        assert d < 0.3, (p, d)


def test_joint_bias_estimation_recovers_injected_gyro_bias():
    """Biased IMU + exact odometry chain, initialized at ground truth:
    without bias estimation the biased factors drag the trajectory off
    truth; with joint estimation (ImuGraph.bg/ba) the bias state
    absorbs the discrepancy — the trajectory stays metric and the
    recovered gyro bias matches the injected one. The reference's
    imu_integration stub cites LIO-SAM, whose factor graph estimates
    exactly this state."""
    n, dt, kf_every = 101, 0.05, 10
    q_gt, t_gt = arc_trajectory(n, dt)
    gyro, accel, dts, v0 = imu_mod.synthesize_imu(q_gt, t_gt, dt)
    bg_true = np.asarray([0.02, -0.015, 0.03], np.float32)
    gyro = gyro + jnp.asarray(bg_true)   # sensor reads true rate + bias

    kf_idx = list(range(0, n, kf_every))
    k = len(kf_idx)
    zero = jnp.zeros(3)

    # Exact chain constraints and ground-truth initialization.
    rels = []
    for a, b in zip(kf_idx[:-1], kf_idx[1:]):
        rels.append(Pose(q_gt[a], t_gt[a]).inverse().compose(
            Pose(q_gt[b], t_gt[b])))
    cons = Constraints(
        i=jnp.arange(k - 1, dtype=jnp.int32),
        j=jnp.arange(1, k, dtype=jnp.int32),
        z_q=jnp.stack([r.q for r in rels]),
        z_t=jnp.stack([r.t for r in rels]),
        weight=jnp.ones(k - 1, jnp.float32))

    # Factors preintegrated at ZERO bias (the pipeline's convention).
    pres = [imu_mod.preintegrate(gyro[a:b], accel[a:b], dts[a:b],
                                 zero, zero)
            for a, b in zip(kf_idx[:-1], kf_idx[1:])]
    cov = jnp.stack([p.cov for p in pres])
    w_rot, w_vel, w_pos = weights_from_covariance(cov)

    def factors():
        return ImuFactors(
            i=jnp.arange(k - 1, dtype=jnp.int32),
            j=jnp.arange(1, k, dtype=jnp.int32),
            dq=jnp.stack([p.dq for p in pres]),
            dv=jnp.stack([p.dv for p in pres]),
            dp=jnp.stack([p.dp for p in pres]),
            dt=jnp.stack([p.dt for p in pres]),
            w_rot=w_rot, w_vel=w_vel, w_pos=w_pos,
            weight=jnp.ones(k - 1, jnp.float32),
            dq_dbg=jnp.stack([p.dq_dbg for p in pres]),
            dv_dbg=jnp.stack([p.dv_dbg for p in pres]),
            dv_dba=jnp.stack([p.dv_dba for p in pres]),
            dp_dbg=jnp.stack([p.dp_dbg for p in pres]),
            dp_dba=jnp.stack([p.dp_dba for p in pres]))

    init_q = q_gt[jnp.asarray(kf_idx)]
    init_t = t_gt[jnp.asarray(kf_idx)]
    gt_kf = np.asarray(t_gt)[kf_idx]
    v_init = jnp.asarray(np.gradient(np.asarray(init_t), axis=0)
                         / (kf_every * dt), jnp.float32)

    out_nb = optimize_imu_graph(
        ImuGraph(poses_q=init_q, poses_t=init_t, vels=v_init),
        cons, factors(), n_iterations=15)
    ate_nb = ate_rmse(np.asarray(out_nb.poses_t), gt_kf, align=False)

    # Gyro-only estimation (ba=None), the pipeline's configuration:
    # accel bias is weakly observable here and would absorb the
    # synthesized IMU's zeroth-order-hold model error.
    out_b = optimize_imu_graph(
        ImuGraph(poses_q=init_q, poses_t=init_t, vels=v_init,
                 bg=jnp.zeros(3), ba=None),
        cons, factors(), n_iterations=30)
    ate_b = ate_rmse(np.asarray(out_b.poses_t), gt_kf, align=False)
    bg_est = np.asarray(out_b.bg)

    print(f"no-bias ATE {ate_nb:.4f}  bias ATE {ate_b:.4f}  "
          f"bg_est {bg_est}")
    # The biased factors visibly bend the un-modeled graph ...
    assert ate_nb > 2 * max(ate_b, 1e-4), (ate_nb, ate_b)
    # ... joint estimation keeps the trajectory metric ...
    assert ate_b < 0.05, ate_b
    # ... and recovers the injected gyro bias.
    np.testing.assert_allclose(bg_est, bg_true, atol=0.006)
