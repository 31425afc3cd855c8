"""Tests for the asynchronous EKF node driver and its host plumbing
(queues, timing, marshalling, checks) — the node-level behaviors of
``ekf_localizer`` (test model: ekf_localizer/test/test_ekf_localizer.cpp
drives the node with measurements and asserts on the published odom)."""

import numpy as np
import pytest

from lidar_feature_extraction_tpu.config import EkfConfig
from lidar_feature_extraction_tpu.fusion import queues
from lidar_feature_extraction_tpu.pipeline.ekf_node import (
    EkfNode, PoseMeasurement, TwistMeasurement)


def _pose_cov(var_xy=0.01, var_yaw=0.01):
    c = np.zeros(36)
    c[0] = c[7] = var_xy
    c[35] = var_yaw
    return c


def _twist_cov(var=0.01):
    c = np.zeros(36)
    c[0] = c[35] = var
    return c


# ---------------------------------------------------------------------------
# queues


def test_aged_queue_retries_then_drops():
    q = queues.AgedMessageQueue(max_age=3)
    q.push("a")
    assert q.pop_increment_age() == ["a"]   # age 0 -> 1
    assert q.pop_increment_age() == ["a"]   # age 1 -> 2
    assert q.pop_increment_age() == ["a"]   # age 2 -> dropped
    assert q.pop_increment_age() == []
    assert len(q) == 0


def test_aged_queue_order_preserved():
    q = queues.AgedMessageQueue(max_age=2)
    q.push(1)
    q.push(2)
    assert q.pop_increment_age() == [1, 2]
    q.push(3)
    assert q.pop_increment_age() == [1, 2, 3]


def test_update_interval_first_and_measured():
    ui = queues.UpdateInterval(frequency=50.0)
    assert ui.compute(100.0) == pytest.approx(0.02)
    assert ui.compute(100.05) == pytest.approx(0.05)


def test_update_interval_jump_back_resets():
    ui = queues.UpdateInterval(frequency=50.0)
    ui.compute(100.0)
    assert ui.compute(99.0) == pytest.approx(0.02)   # reset to nominal
    assert ui.compute(99.1) == pytest.approx(0.1)


def test_delay_step_quantization_and_limits():
    w = queues.Warning(sink=lambda m: None)
    assert queues.delay_step(0.05, 0.02, 50, w) == 2   # round(2.5) -> 2
    assert queues.delay_step(-0.1, 0.02, 50, w) == 0   # clamp negative
    assert queues.delay_step(2.0, 0.02, 50, w) is None  # beyond horizon


def test_warning_throttle():
    msgs = []
    t = [0.0]
    w = queues.Warning(sink=msgs.append, clock=lambda: t[0])
    w.warn_throttle("x", 1.0)
    w.warn_throttle("x", 1.0)
    assert msgs == ["x"]
    t[0] = 1.5
    w.warn_throttle("x", 1.0)
    assert msgs == ["x", "x"]


def test_checks():
    w = queues.Warning(sink=lambda m: None)
    assert queues.check_measurement_finite([1.0, 2.0], "pose", w)
    assert not queues.check_measurement_finite([1.0, np.nan], "pose", w)
    assert not queues.check_measurement_finite([np.inf, 0.0], "pose", w)
    assert queues.check_frame("map", "map", w)
    assert not queues.check_frame("odom", "map", w)
    assert queues.check_mahalanobis(1.0, 2.0, w)
    assert not queues.check_mahalanobis(9.0, 2.0, w)
    assert not queues.check_mahalanobis(float("nan"), 2.0, w)


# ---------------------------------------------------------------------------
# covariance marshalling


def test_covariance_roundtrip_pose():
    p = np.arange(36, dtype=np.float64).reshape(6, 6)
    p = 0.5 * (p + p.T)
    flat = queues.ekf_covariance_to_pose_covariance(p)
    # (x, y, yaw) block lands in the (x, y, rz) slots.
    assert flat[0] == p[0, 0]
    assert flat[1] == p[0, 1]
    assert flat[5] == p[0, 2]
    assert flat[7] == p[1, 1]
    assert flat[35] == p[2, 2]
    r = queues.pose_covariance_to_measurement_r(flat, smoothing_steps=5)
    np.testing.assert_allclose(r, 5.0 * np.array(
        [[p[0, 0], p[0, 1], p[0, 2]],
         [p[1, 0], p[1, 1], p[1, 2]],
         [p[2, 0], p[2, 1], p[2, 2]]]))


def test_covariance_roundtrip_twist():
    p = np.diag([1., 2., 3., 4., 5., 6.])
    p[4, 5] = p[5, 4] = 0.5
    flat = queues.ekf_covariance_to_twist_covariance(p)
    assert flat[0] == 5.0
    assert flat[35] == 6.0
    assert flat[5] == 0.5
    r = queues.twist_covariance_to_measurement_r(flat, smoothing_steps=2)
    np.testing.assert_allclose(r, 2.0 * np.array([[5.0, 0.5], [0.5, 6.0]]))


# ---------------------------------------------------------------------------
# node behavior


def test_node_converges_to_static_pose():
    cfg = EkfConfig(pose_smoothing_steps=1)
    node = EkfNode(cfg, warn=queues.Warning(sink=lambda m: None))
    now = 0.0
    for _ in range(100):
        now += 0.02
        node.push_pose(PoseMeasurement(stamp=now, x=2.0, y=-1.0, yaw=0.3,
                                       covariance=_pose_cov()))
        est = node.tick(now)
    np.testing.assert_allclose(est.pose_xyyaw, [2.0, -1.0, 0.3], atol=0.05)


def test_node_twist_drives_motion():
    cfg = EkfConfig()
    node = EkfNode(cfg, warn=queues.Warning(sink=lambda m: None))
    now = 0.0
    for _ in range(50):
        now += 0.02
        node.push_twist(TwistMeasurement(stamp=now, vx=1.0, wz=0.0,
                                         covariance=_twist_cov()))
        est = node.tick(now)
    # ~1 s of vx = 1 m/s from the origin along +x.
    assert est.pose_xyyaw[0] > 0.4
    assert abs(est.pose_xyyaw[1]) < 0.1
    assert est.twist[0] == pytest.approx(1.0, abs=0.2)


def test_node_rejects_wrong_frame_and_nan():
    cfg = EkfConfig()
    node = EkfNode(cfg, warn=queues.Warning(sink=lambda m: None))
    node.push_pose(PoseMeasurement(stamp=0.0, x=1.0, y=0.0, yaw=0.0,
                                   covariance=_pose_cov(),
                                   frame_id="odom"))
    node.push_pose(PoseMeasurement(stamp=0.0, x=np.nan, y=0.0, yaw=0.0,
                                   covariance=_pose_cov()))
    assert len(node.pose_queue) == 0


def test_node_stale_measurement_ignored():
    """A measurement older than the delay horizon must not move the
    state (the delay_step None path -> C++ continue)."""
    cfg = EkfConfig(pose_smoothing_steps=1)
    node = EkfNode(cfg, warn=queues.Warning(sink=lambda m: None))
    now = 10.0
    node.tick(now)
    before = node.current_estimate().pose_xyyaw.copy()
    node.push_pose(PoseMeasurement(stamp=now - 5.0, x=100.0, y=100.0,
                                   yaw=1.0, covariance=_pose_cov()))
    now += 0.02
    est = node.tick(now)
    np.testing.assert_allclose(est.pose_xyyaw, before, atol=1e-6)


def test_node_initial_pose_reset():
    cfg = EkfConfig()
    node = EkfNode(cfg, warn=queues.Warning(sink=lambda m: None))
    node.set_initial_pose(5.0, -3.0, 0.7, z=1.2, roll=0.1, pitch=-0.1)
    est = node.current_estimate()
    np.testing.assert_allclose(est.pose_xyyaw, [5.0, -3.0, 0.7], atol=1e-5)
    assert est.z == pytest.approx(1.2, abs=1e-5)
    assert est.roll == pytest.approx(0.1, abs=1e-5)
    assert est.pitch == pytest.approx(-0.1, abs=1e-5)


def test_node_smoothing_steps_scale_r():
    """More smoothing steps -> inflated R -> slower convergence per
    tick, but the aged queue retries the measurement so the steady
    state matches (pose_measurement.cpp:47-55 + aged queue)."""
    meas = dict(x=1.0, y=0.0, yaw=0.0, covariance=_pose_cov())
    outs = []
    for steps in (1, 5):
        cfg = EkfConfig(pose_smoothing_steps=steps)
        node = EkfNode(cfg, warn=queues.Warning(sink=lambda m: None))
        now = 0.0
        now += 0.02
        node.push_pose(PoseMeasurement(stamp=now, **meas))
        est = node.tick(now)
        outs.append(est.pose_xyyaw[0])
    assert outs[0] > outs[1]  # single-step gain larger without smoothing
