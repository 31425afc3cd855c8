"""IMU preintegration tests: analytic trajectories, bias-correction
Jacobians vs finite differences, factor residual zero at ground truth."""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.fusion import imu

jax.config.update("jax_enable_x64", True)


def simulate(n, dt, omega_fn, accel_world_fn, q0=None):
    """Ground-truth integration + ideal body-frame IMU measurements.

    Returns (gyro [n,3], accel [n,3], q_traj, v_traj, p_traj) where the
    accelerometer measures f = R^T (a_world - g)."""
    q = np.array([1.0, 0, 0, 0]) if q0 is None else q0
    v = np.zeros(3)
    p = np.zeros(3)
    g = np.asarray(imu.GRAVITY)
    gyro, accel = [], []
    for k in range(n):
        w = omega_fn(k * dt)
        a_w = accel_world_fn(k * dt)
        r = np.asarray(quat.quat_to_matrix(jnp.asarray(q)))
        gyro.append(w)
        accel.append(r.T @ (a_w - g))
        # integrate exactly like the preintegrator (Euler)
        p = p + v * dt + 0.5 * a_w * dt * dt
        v = v + a_w * dt
        q = np.array(quat.quat_multiply(
            jnp.asarray(q), quat.exp_so3(jnp.asarray(w * dt))))
        q = q / np.linalg.norm(q)
    return (np.stack(gyro), np.stack(accel), q, v, p)


def test_preintegration_matches_simulated_motion():
    n, dt = 200, 0.005
    omega = lambda t: np.array([0.3, -0.2, 0.5])
    accel_w = lambda t: np.array([1.0, 0.5, -0.3])
    gyro, accel, q_end, v_end, p_end = simulate(n, dt, omega, accel_w)

    pre = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                           jnp.full(n, dt), jnp.zeros(3), jnp.zeros(3))
    # Recover world end state from the preintegrated deltas:
    g = np.asarray(imu.GRAVITY)
    t_total = n * dt
    p_rec = 0.5 * g * t_total ** 2 + np.asarray(pre.dp)
    v_rec = g * t_total + np.asarray(pre.dv)
    np.testing.assert_allclose(p_rec, p_end, atol=1e-6)
    np.testing.assert_allclose(v_rec, v_end, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pre.dq), q_end, atol=1e-6)


def test_factor_residual_zero_at_truth():
    n, dt = 150, 0.004
    omega = lambda t: np.array([0.1 * np.sin(t * 10), 0.2, -0.15])
    accel_w = lambda t: np.array([0.5 * np.cos(5 * t), -0.2, 0.1])
    gyro, accel, q_end, v_end, p_end = simulate(n, dt, omega, accel_w)

    pre = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                           jnp.full(n, dt), jnp.zeros(3), jnp.zeros(3))
    res = imu.imu_factor_residual(
        pre,
        qi=jnp.asarray([1.0, 0, 0, 0]), pi=jnp.zeros(3), vi=jnp.zeros(3),
        qj=jnp.asarray(q_end), pj=jnp.asarray(p_end), vj=jnp.asarray(v_end))
    np.testing.assert_allclose(np.asarray(res.r_theta), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.r_v), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.r_p), 0.0, atol=1e-6)


def test_bias_jacobians_match_finite_difference():
    rng = np.random.default_rng(0)
    n, dt = 60, 0.01
    gyro = rng.normal(scale=0.3, size=(n, 3))
    accel = rng.normal(scale=1.0, size=(n, 3)) + [0, 0, 9.8]
    dts = jnp.full(n, dt)
    bg0 = jnp.zeros(3)
    ba0 = jnp.zeros(3)

    def deltas(bg, ba):
        pre = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel), dts,
                               bg, ba)
        return pre

    base = deltas(bg0, ba0)
    eps = 1e-6
    for axis in range(3):
        dbg = jnp.zeros(3).at[axis].set(eps)
        pert = deltas(bg0 + dbg, ba0)
        # d log(dq) / d bg
        dq_diff = quat.quat_multiply(quat.quat_conjugate(base.dq), pert.dq)
        num = np.asarray(quat.log_so3(dq_diff)) / eps
        np.testing.assert_allclose(num, np.asarray(base.dq_dbg)[:, axis],
                                   atol=2e-3)
        np.testing.assert_allclose(
            (np.asarray(pert.dv) - np.asarray(base.dv)) / eps,
            np.asarray(base.dv_dbg)[:, axis], atol=2e-3)
        np.testing.assert_allclose(
            (np.asarray(pert.dp) - np.asarray(base.dp)) / eps,
            np.asarray(base.dp_dbg)[:, axis], atol=2e-3)

        dba = jnp.zeros(3).at[axis].set(eps)
        pert_a = deltas(bg0, ba0 + dba)
        np.testing.assert_allclose(
            (np.asarray(pert_a.dv) - np.asarray(base.dv)) / eps,
            np.asarray(base.dv_dba)[:, axis], atol=2e-3)
        np.testing.assert_allclose(
            (np.asarray(pert_a.dp) - np.asarray(base.dp)) / eps,
            np.asarray(base.dp_dba)[:, axis], atol=2e-3)


def test_bias_corrected_residual_improves():
    """Integrating with a wrong gyro bias, the first-order correction in
    the factor must reduce the residual substantially."""
    n, dt = 100, 0.005
    omega = lambda t: np.array([0.2, -0.1, 0.3])
    accel_w = lambda t: np.array([0.3, 0.2, -0.1])
    gyro, accel, q_end, v_end, p_end = simulate(n, dt, omega, accel_w)

    true_bg = np.array([0.01, -0.02, 0.015])
    # Preintegrate at zero bias although the gyro is biased.
    pre = imu.preintegrate(jnp.asarray(gyro + true_bg), jnp.asarray(accel),
                           jnp.full(n, dt), jnp.zeros(3), jnp.zeros(3))
    states = dict(
        qi=jnp.asarray([1.0, 0, 0, 0]), pi=jnp.zeros(3), vi=jnp.zeros(3),
        qj=jnp.asarray(q_end), pj=jnp.asarray(p_end), vj=jnp.asarray(v_end))
    res_raw = imu.imu_factor_residual(pre, **states)
    # delta_bg = (new bias estimate) - (linearization bias 0) = +true_bg
    res_fix = imu.imu_factor_residual(pre, **states,
                                      delta_bg=jnp.asarray(true_bg))
    raw = np.linalg.norm(np.asarray(res_raw.r_theta))
    fix = np.linalg.norm(np.asarray(res_fix.r_theta))
    assert fix < 0.1 * raw, (raw, fix)


def test_masked_padding_lanes_ignored():
    rng = np.random.default_rng(1)
    n = 50
    gyro = rng.normal(scale=0.2, size=(n, 3))
    accel = rng.normal(scale=0.5, size=(n, 3))
    dts = jnp.full(n, 0.01)
    full = imu.preintegrate(jnp.asarray(gyro), jnp.asarray(accel), dts,
                            jnp.zeros(3), jnp.zeros(3))
    # Pad with garbage but masked lanes.
    pad = 20
    gyro_p = np.concatenate([gyro, rng.normal(size=(pad, 3)) * 100])
    accel_p = np.concatenate([accel, rng.normal(size=(pad, 3)) * 100])
    dts_p = jnp.full(n + pad, 0.01)
    valid = jnp.asarray(np.arange(n + pad) < n)
    masked = imu.preintegrate(jnp.asarray(gyro_p), jnp.asarray(accel_p),
                              dts_p, jnp.zeros(3), jnp.zeros(3),
                              valid=valid)
    np.testing.assert_allclose(np.asarray(masked.dq), np.asarray(full.dq),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(masked.dp), np.asarray(full.dp),
                               atol=1e-12)
    np.testing.assert_allclose(float(masked.dt), float(full.dt), atol=1e-12)
