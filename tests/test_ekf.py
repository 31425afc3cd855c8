"""EKF + time-delay Kalman filter tests, including a dense-matrix numpy
oracle for the block-sparse delayed update."""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.config import EkfConfig
from lidar_feature_extraction_tpu.fusion import ekf, kalman

jax.config.update("jax_enable_x64", True)

CFG = EkfConfig(extend_state_step=10)


def np_time_delay_predict(x, p, x_next, a, q):
    """Dense oracle of updateX/updateP (time_delay_kalman_filter.cpp:
    43-92)."""
    d = a.shape[0]
    nd = len(x)
    c = nd - d
    x1 = np.concatenate([x_next, x[:c]])
    p1 = np.zeros_like(p)
    p1[:d, :d] = a @ p[:d, :d] @ a.T + q
    p1[:d, d:] = a @ p[:d, :c]
    p1[d:, :d] = p[:c, :d] @ a.T
    p1[d:, d:] = p[:c, :c]
    return x1, p1


def np_time_delay_update(x, p, y, c_mat, r, delay_step, d):
    """Dense oracle with the explicit block measurement matrix D
    (makeMeasurementMatrix :95-103 + the kalman_filter.hpp kernels)."""
    nd = len(x)
    m = c_mat.shape[0]
    big_d = np.zeros((m, nd))
    s = delay_step * d
    big_d[:, s:s + d] = c_mat
    pct = p @ big_d.T
    k = pct @ np.linalg.inv(r + big_d @ pct)
    x1 = x + k @ (y - big_d @ x)
    p1 = p - k @ big_d @ p
    return x1, p1


def test_time_delay_predict_matches_dense_oracle():
    rng = np.random.default_rng(0)
    d, n = 6, 10
    x0 = rng.normal(size=d)
    p0 = np.eye(d) + 0.1 * rng.normal(size=(d, d))
    p0 = p0 @ p0.T
    st = kalman.init_time_delay(jnp.asarray(x0), jnp.asarray(p0), n)
    xd = np.tile(x0, n)
    pd = np.kron(np.eye(n), p0)
    np.testing.assert_allclose(np.asarray(st.x), xd)
    np.testing.assert_allclose(np.asarray(st.p), pd)

    for _ in range(3):
        a = np.eye(d) + 0.05 * rng.normal(size=(d, d))
        q = np.diag(rng.uniform(0, 0.1, size=d))
        x_next = rng.normal(size=d)
        st = kalman.predict_with_delay(st, jnp.asarray(x_next),
                                       jnp.asarray(a), jnp.asarray(q))
        xd, pd = np_time_delay_predict(xd, pd, x_next, a, q)
        np.testing.assert_allclose(np.asarray(st.x), xd, atol=1e-10)
        np.testing.assert_allclose(np.asarray(st.p), pd, atol=1e-10)


def test_time_delay_update_matches_dense_oracle():
    rng = np.random.default_rng(1)
    d, n = 6, 10
    x0 = rng.normal(size=d)
    p0 = np.eye(d) * 2.0
    st = kalman.init_time_delay(jnp.asarray(x0), jnp.asarray(p0), n)
    xd = np.tile(x0, n)
    pd = np.kron(np.eye(n), p0)
    # Run a couple of predicts so off-diagonal correlations exist.
    for _ in range(4):
        a = np.eye(d) + 0.05 * rng.normal(size=(d, d))
        q = np.eye(d) * 0.01
        xn = rng.normal(size=d)
        st = kalman.predict_with_delay(st, jnp.asarray(xn), jnp.asarray(a),
                                       jnp.asarray(q))
        xd, pd = np_time_delay_predict(xd, pd, xn, a, q)

    for delay in [0, 3, 9]:
        c_mat = rng.normal(size=(3, d))
        r = np.eye(3) * 0.5
        y = rng.normal(size=3)
        st = kalman.update_with_delay(st, jnp.asarray(y), jnp.asarray(c_mat),
                                      jnp.asarray(r),
                                      jnp.asarray(delay), d)
        xd, pd = np_time_delay_update(xd, pd, y, c_mat, r, delay, d)
        np.testing.assert_allclose(np.asarray(st.x), xd, atol=1e-9)
        np.testing.assert_allclose(np.asarray(st.p), pd, atol=1e-9)


def test_bicycle_model_jacobian_matches_autodiff():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=6))
    dt = 0.02
    a_analytic = ekf.state_transition_matrix(x, dt)
    # The analytic A omits the yaw wrap (normalizeYaw has unit slope);
    # compare against autodiff of the unwrapped model.
    def unwrapped(xv):
        yaw = xv[2] + xv[3]
        return jnp.array([
            xv[0] + xv[4] * jnp.cos(yaw) * dt,
            xv[1] + xv[4] * jnp.sin(yaw) * dt,
            xv[2] + xv[5] * dt,
            xv[3], xv[4], xv[5]])
    a_ad = jax.jacfwd(unwrapped)(x)
    np.testing.assert_allclose(np.asarray(a_analytic), np.asarray(a_ad),
                               atol=1e-12)


def test_ekf_converges_on_static_pose():
    """Feed repeated identical pose measurements: estimate converges to
    the measured pose."""
    st = ekf.init_ekf(CFG, dtype=jnp.float64)
    dt = 0.02
    y = jnp.asarray([1.0, 2.0, 0.3])
    r = jnp.eye(3) * 0.01
    for _ in range(50):
        st = ekf.predict(st, dt, CFG)
        st = ekf.update_pose(st, y, r, jnp.asarray(0), CFG)
    pose, twist, _ = ekf.current_pose_twist(st)
    np.testing.assert_allclose(np.asarray(pose), [1.0, 2.0, 0.3], atol=1e-2)
    np.testing.assert_allclose(np.asarray(twist), 0.0, atol=0.05)


def test_ekf_tracks_constant_velocity():
    """Simulated straight drive with pose+twist measurements."""
    st = ekf.init_ekf(CFG, dtype=jnp.float64)
    dt = 0.02
    vx = 2.0
    r_pose = jnp.eye(3) * 0.001
    r_twist = jnp.eye(2) * 0.001
    for i in range(200):
        st = ekf.predict(st, dt, CFG)
        t = (i + 1) * dt
        st = ekf.update_pose(st, jnp.asarray([vx * t, 0.0, 0.0]), r_pose,
                             jnp.asarray(0), CFG)
        st = ekf.update_twist(st, jnp.asarray([vx, 0.0]), r_twist,
                              jnp.asarray(0), CFG)
    pose, twist, _ = ekf.current_pose_twist(st)
    np.testing.assert_allclose(float(twist[0]), vx, rtol=0.05)
    np.testing.assert_allclose(float(pose[0]), vx * 200 * dt, rtol=0.05)


def test_mahalanobis_gate_rejects_outlier():
    cfg = EkfConfig(extend_state_step=10, pose_gate_dist=3.0)
    st = ekf.init_ekf(cfg, x0=jnp.zeros(6, jnp.float64),
                      p0=jnp.eye(6, dtype=jnp.float64) * 0.01,
                      dtype=jnp.float64)
    before = np.asarray(st.td.x[:6])
    # 100-sigma outlier must be ignored.
    st2 = ekf.update_pose(st, jnp.asarray([10.0, 0.0, 0.0]),
                          jnp.eye(3) * 0.01, jnp.asarray(0), cfg)
    np.testing.assert_allclose(np.asarray(st2.td.x[:6]), before)
    # In-gate measurement must be applied.
    st3 = ekf.update_pose(st, jnp.asarray([0.01, 0.0, 0.0]),
                          jnp.eye(3) * 0.01, jnp.asarray(0), cfg)
    assert abs(float(st3.td.x[0])) > 1e-6


def test_delayed_measurement_uses_past_state():
    """A measurement of where the vehicle was d steps ago must be
    consistent with the shift register (no innovation if it matches the
    past state exactly)."""
    st = ekf.init_ekf(CFG, x0=jnp.zeros(6, jnp.float64),
                      p0=jnp.eye(6, dtype=jnp.float64),
                      dtype=jnp.float64)
    dt = 0.1
    # Drive forward: vx = 1
    st = ekf.update_twist(st, jnp.asarray([1.0, 0.0]), jnp.eye(2) * 1e-6,
                          jnp.asarray(0), CFG)
    xs = []
    for _ in range(5):
        st = ekf.predict(st, dt, CFG)
        xs.append(float(st.td.x[0]))
    # Measure the pose from 3 steps ago.
    past_x = xs[-4]
    st2 = ekf.update_pose(st, jnp.asarray([past_x, 0.0, 0.0]),
                          jnp.eye(3) * 1e-4, jnp.asarray(3), CFG)
    # Current estimate should barely move (measurement agrees with past).
    assert abs(float(st2.td.x[0]) - xs[-1]) < 1e-3


def test_filter1d():
    f = ekf.Filter1D.create(proc_stddev=0.1, dtype=jnp.float64)
    f = ekf.filter1d_update(f, jnp.asarray(5.0), jnp.asarray(1.0),
                            jnp.asarray(0.1))
    assert float(f.x) == 5.0  # first update initializes
    for _ in range(100):
        f = ekf.filter1d_update(f, jnp.asarray(3.0), jnp.asarray(0.1),
                                jnp.asarray(0.1))
    np.testing.assert_allclose(float(f.x), 3.0, atol=1e-2)


def test_normalize_yaw():
    ys = jnp.asarray([0.0, 3.0 * np.pi, -3.0 * np.pi, np.pi])
    out = np.asarray(ekf.normalize_yaw(ys))
    np.testing.assert_allclose(out[0], 0.0, atol=1e-12)
    np.testing.assert_allclose(abs(out[1]), np.pi, atol=1e-9)
    np.testing.assert_allclose(abs(out[3]), np.pi, atol=1e-12)
