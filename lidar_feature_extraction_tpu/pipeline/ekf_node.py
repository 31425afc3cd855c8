"""Asynchronous EKF fusion driver — the full node-equivalent of the
reference's ``ekf_localizer`` (``ekf_localizer/src/ekf_localizer.cpp:
176-233``).

``FusedLocalizationPipeline`` (pipeline/replay.py) is the synchronous
replay loop where queueing degenerates away; this driver keeps the
reference's asynchronous structure for deployments where measurements
arrive on their own clocks:

- a 50 Hz (configurable) ``tick`` owns predict and drains the
  measurement queues (``timerCallback``);
- pose/twist measurements land in ``AgedMessageQueue``s between ticks
  and are retried for ``smoothing_steps`` ticks
  (aged_message_queue.hpp:21-66);
- per measurement: finite check, delay quantization against the
  measured dt, covariance scaling by smoothing steps, then the jitted
  delayed update with its on-device Mahalanobis gate
  (pose_measurement.cpp:74-114, twist_measurement.cpp:70-110);
- ``current_estimate`` composes the published pose: EKF (x, y, yaw) +
  the three scalar filters for z / roll / pitch
  (ekf_localizer.cpp:209-232) and the marshalled flat-36 covariances.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from lidar_feature_extraction_tpu.config import EkfConfig
from lidar_feature_extraction_tpu.fusion import ekf as ekf_mod
from lidar_feature_extraction_tpu.fusion import queues


class PoseMeasurement(NamedTuple):
    """(x, y, yaw) measurement with stamp and flat-36 covariance."""

    stamp: float
    x: float
    y: float
    yaw: float
    covariance: np.ndarray     # flat 36, row-major pose layout
    frame_id: str = "map"


class TwistMeasurement(NamedTuple):
    """(vx, wz) measurement with stamp and flat-36 covariance."""

    stamp: float
    vx: float
    wz: float
    covariance: np.ndarray     # flat 36, row-major twist layout
    frame_id: str = "base_link"


class EkfEstimate(NamedTuple):
    pose_xyyaw: np.ndarray       # [3] x, y, unbiased yaw
    z: float
    roll: float
    pitch: float
    twist: np.ndarray            # [2] vx, wz
    pose_covariance: np.ndarray  # flat 36
    twist_covariance: np.ndarray  # flat 36


class EkfNode:
    """Queue-driven EKF fusion node.

    ``push_pose`` / ``push_twist`` may be called at any time between
    ticks; ``tick(now)`` advances the filter one predict step and
    applies every queued measurement (with aging/retry), mirroring the
    reference's timer callback order: predict, pose updates, twist
    updates, publish.
    """

    def __init__(self, cfg: EkfConfig, pose_frame: str = "map",
                 twist_frame: str = "base_link",
                 warn: Optional[queues.Warning] = None,
                 dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.warn = warn if warn is not None else queues.Warning()
        self.pose_frame = pose_frame
        self.twist_frame = twist_frame
        self.ekf = ekf_mod.init_ekf(cfg, dtype=dtype)
        self.z_filter = ekf_mod.Filter1D.create(dtype=dtype)
        self.roll_filter = ekf_mod.Filter1D.create(dtype=dtype)
        self.pitch_filter = ekf_mod.Filter1D.create(dtype=dtype)
        self.pose_queue = queues.AgedMessageQueue(cfg.pose_smoothing_steps)
        self.twist_queue = queues.AgedMessageQueue(
            cfg.twist_smoothing_steps)
        self.interval = queues.UpdateInterval(cfg.predict_frequency)
        self.clock: Optional[float] = None

    # -- inputs -----------------------------------------------------------
    def push_pose(self, m: PoseMeasurement) -> None:
        if not queues.check_frame(m.frame_id, self.pose_frame, self.warn):
            return
        if not queues.check_measurement_finite(
                [m.x, m.y, m.yaw], "pose", self.warn):
            return
        self.pose_queue.push(m)

    def push_twist(self, m: TwistMeasurement) -> None:
        if not queues.check_frame(m.frame_id, self.twist_frame, self.warn):
            return
        if not queues.check_measurement_finite(
                [m.vx, m.wz], "twist", self.warn):
            return
        self.twist_queue.push(m)

    def set_initial_pose(self, x: float, y: float, yaw: float,
                         z: float = 0.0, roll: float = 0.0,
                         pitch: float = 0.0,
                         pose_cov: tuple = (1e4, 1e4, 1e2)) -> None:
        """Re-initialize from an external pose (``callbackInitialPose``,
        ekf_localizer.cpp:235-261): EKF restarts at (x, y, yaw), the 1-D
        filters restart at z/roll/pitch, queues are flushed."""
        x0 = jnp.asarray([x, y, yaw, 0.0, 0.0, 0.0], self.dtype)
        self.ekf = ekf_mod.init_ekf(self.cfg, x0=x0, pose_cov=pose_cov,
                                    dtype=self.dtype)
        std = jnp.asarray(np.sqrt(0.1), self.dtype)
        one = jnp.asarray(1.0, self.dtype)
        for name, val in (("z_filter", z), ("roll_filter", roll),
                          ("pitch_filter", pitch)):
            f = ekf_mod.Filter1D.create(dtype=self.dtype)
            f = ekf_mod.filter1d_update(f, jnp.asarray(val, self.dtype),
                                        std, one)
            setattr(self, name, f)
        self.pose_queue.clear()
        self.twist_queue.clear()

    # -- timer ------------------------------------------------------------
    def tick(self, now: float) -> EkfEstimate:
        dt = self.interval.compute(now)
        self.clock = now
        self.ekf = ekf_mod.predict(self.ekf, dt, self.cfg)

        for m in self.pose_queue.pop_increment_age():
            step = queues.delay_step(now - m.stamp, dt,
                                     self.cfg.extend_state_step, self.warn)
            if step is None:
                continue
            r = queues.pose_covariance_to_measurement_r(
                m.covariance, self.cfg.pose_smoothing_steps)
            y = jnp.asarray([m.x, m.y, m.yaw], self.dtype)
            self.ekf = ekf_mod.update_pose(
                self.ekf, y, jnp.asarray(r, self.dtype),
                jnp.asarray(step), self.cfg)

        for m in self.twist_queue.pop_increment_age():
            step = queues.delay_step(now - m.stamp, dt,
                                     self.cfg.extend_state_step, self.warn)
            if step is None:
                continue
            r = queues.twist_covariance_to_measurement_r(
                m.covariance, self.cfg.twist_smoothing_steps)
            y = jnp.asarray([m.vx, m.wz], self.dtype)
            self.ekf = ekf_mod.update_twist(
                self.ekf, y, jnp.asarray(r, self.dtype),
                jnp.asarray(step), self.cfg)

        return self.current_estimate()

    def update_1d_filters(self, z: float, roll: float, pitch: float,
                          obs_stddev: float = float(np.sqrt(0.1))) -> None:
        """Feed the z / roll / pitch scalar filters from a 3D pose
        measurement (ekf_localizer.cpp:209-218)."""
        dt = jnp.asarray(self.interval.default_dt, self.dtype)
        std = jnp.asarray(obs_stddev, self.dtype)
        self.z_filter = ekf_mod.filter1d_update(
            self.z_filter, jnp.asarray(z, self.dtype), std, dt)
        self.roll_filter = ekf_mod.filter1d_update(
            self.roll_filter, jnp.asarray(roll, self.dtype), std, dt)
        self.pitch_filter = ekf_mod.filter1d_update(
            self.pitch_filter, jnp.asarray(pitch, self.dtype), std, dt)

    # -- outputs ----------------------------------------------------------
    def current_estimate(self) -> EkfEstimate:
        pose2d, twist, p = ekf_mod.current_pose_twist(self.ekf)
        p_np = np.asarray(p, dtype=np.float64)
        return EkfEstimate(
            pose_xyyaw=np.asarray(pose2d, dtype=np.float64),
            z=float(self.z_filter.x),
            roll=float(self.roll_filter.x),
            pitch=float(self.pitch_filter.x),
            twist=np.asarray(twist, dtype=np.float64),
            pose_covariance=queues.ekf_covariance_to_pose_covariance(p_np),
            twist_covariance=queues.ekf_covariance_to_twist_covariance(
                p_np))
