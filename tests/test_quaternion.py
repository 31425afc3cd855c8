import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.core.pose import Pose

jax.config.update("jax_enable_x64", True)


def random_quat(rng, n=None):
    shape = (4,) if n is None else (n, 4)
    q = rng.normal(size=shape)
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_multiply_matches_matrix_composition():
    rng = np.random.default_rng(0)
    a, b = random_quat(rng, 8), random_quat(rng, 8)
    q = quat.quat_multiply(jnp.asarray(a), jnp.asarray(b))
    ra = np.asarray(quat.quat_to_matrix(jnp.asarray(a)))
    rb = np.asarray(quat.quat_to_matrix(jnp.asarray(b)))
    rq = np.asarray(quat.quat_to_matrix(q))
    np.testing.assert_allclose(rq, ra @ rb, atol=1e-12)


def test_left_multiplication_matrix():
    rng = np.random.default_rng(1)
    a, b = random_quat(rng), random_quat(rng)
    lhs = quat.left_multiplication_matrix(jnp.asarray(a)) @ jnp.asarray(b)
    rhs = quat.quat_multiply(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_right_multiplication_matrix():
    rng = np.random.default_rng(2)
    a, b = random_quat(rng), random_quat(rng)
    lhs = quat.right_multiplication_matrix(jnp.asarray(b)) @ jnp.asarray(a)
    rhs = quat.quat_multiply(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_rotate_matches_matrix():
    rng = np.random.default_rng(3)
    q = random_quat(rng, 5)
    p = rng.normal(size=(5, 3))
    out = quat.quat_rotate(jnp.asarray(q), jnp.asarray(p))
    r = np.asarray(quat.quat_to_matrix(jnp.asarray(q)))
    np.testing.assert_allclose(np.asarray(out),
                               np.einsum("nij,nj->ni", r, p), atol=1e-12)


def test_matrix_quat_roundtrip():
    rng = np.random.default_rng(4)
    q = random_quat(rng, 64)
    q *= np.where(q[:, :1] < 0, -1.0, 1.0)
    m = quat.quat_to_matrix(jnp.asarray(q))
    q2 = quat.matrix_to_quat(m)
    np.testing.assert_allclose(np.asarray(q2), q, atol=1e-9)


def test_exp_log_roundtrip():
    rng = np.random.default_rng(5)
    theta = rng.normal(size=(32, 3))
    q = quat.exp_so3(jnp.asarray(theta))
    back = quat.log_so3(q)
    np.testing.assert_allclose(np.asarray(back), theta, atol=1e-9)
    # Small-angle branch
    tiny = jnp.asarray([[1e-12, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(quat.exp_so3(tiny))[0],
                               [1.0, 5e-13, 0.0, 0.0], atol=1e-15)


def test_drpdq_matches_finite_difference():
    """Jacobian parity with rotationlib DRpDq: d(R(q)p)/dq for a NON-unit
    perturbation of q (the Sola eq. 174 jacobian treats q as R^4)."""
    rng = np.random.default_rng(6)
    q = random_quat(rng)
    p = rng.normal(size=3)

    def f(qv):
        return quat.quat_rotate(quat.quat_normalize(qv), jnp.asarray(p))

    # The reference jacobian is of the *unnormalized* action
    # R(q)p where R uses the homogeneous quaternion formula. Compare to
    # autodiff of the raw rotation formula without normalization:
    def raw(qv):
        w, v = qv[0], qv[1:]
        pj = jnp.asarray(p)
        # R(q) p for unit q, extended homogeneously (Sola eq. 112 form):
        return (w * w - v @ v) * pj + 2 * (v @ pj) * v + 2 * w * jnp.cross(v, pj)

    jac = jax.jacfwd(raw)(jnp.asarray(q))
    ours = quat.drpdq(jnp.asarray(q), jnp.asarray(p))
    np.testing.assert_allclose(np.asarray(ours), np.asarray(jac), atol=1e-9)


def test_drpdq_batched():
    rng = np.random.default_rng(7)
    q = jnp.asarray(random_quat(rng, 10))
    p = jnp.asarray(rng.normal(size=(10, 3)))
    batched = quat.drpdq(q, p)
    for i in range(10):
        np.testing.assert_allclose(np.asarray(batched[i]),
                                   np.asarray(quat.drpdq(q[i], p[i])),
                                   atol=1e-12)


def test_rpy_to_quat_axes():
    q = quat.rpy_to_quat(0.0, 0.0, np.pi / 2)
    out = quat.quat_rotate(q, jnp.asarray([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(out), [0.0, 1.0, 0.0], atol=1e-12)
    np.testing.assert_allclose(float(quat.quat_yaw(q)), np.pi / 2, atol=1e-12)


def test_pose_compose_inverse():
    rng = np.random.default_rng(8)
    a = Pose(jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3)))
    b = Pose(jnp.asarray(random_quat(rng)), jnp.asarray(rng.normal(size=3)))
    p = jnp.asarray(rng.normal(size=3))
    np.testing.assert_allclose(
        np.asarray(a.compose(b).apply(p)), np.asarray(a.apply(b.apply(p))),
        atol=1e-12)
    ident = a.compose(a.inverse())
    np.testing.assert_allclose(np.asarray(ident.apply(p)), np.asarray(p),
                               atol=1e-12)
    m = a.matrix()
    a2 = Pose.from_matrix(m)
    np.testing.assert_allclose(np.asarray(a2.apply(p)), np.asarray(a.apply(p)),
                               atol=1e-9)


def test_pose_batched():
    rng = np.random.default_rng(9)
    q = jnp.asarray(random_quat(rng, 6))
    t = jnp.asarray(rng.normal(size=(6, 3)))
    pts = jnp.asarray(rng.normal(size=(6, 3)))
    batched = Pose(q, t).apply(pts)
    for i in range(6):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(Pose(q[i], t[i]).apply(pts[i])),
            atol=1e-12)
