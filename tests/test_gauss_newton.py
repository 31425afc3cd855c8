"""Gauss-Newton optimizer tests, modeled on the reference's convergence
tests (localization/test/test_optimizer.cpp:53-127): synthetic rigid
transforms recovered from point correspondences."""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.ops import gauss_newton as gn
from lidar_feature_extraction_tpu.ops.alignment import (alignment_problem,
                                                        align_points)
from lidar_feature_extraction_tpu.ops.residuals import ResidualBlock

jax.config.update("jax_enable_x64", True)


def random_pose(rng, angle=0.3, trans=0.5):
    axis = rng.normal(size=3)
    axis *= angle / np.linalg.norm(axis)
    q = quat.exp_so3(jnp.asarray(axis))
    return Pose(q, jnp.asarray(rng.normal(scale=trans, size=3)))


def test_converges_to_true_transform():
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.uniform(-5, 5, size=(40, 3)))
    true = random_pose(rng)
    dst = true.apply(src)
    problem_fn = alignment_problem(src, dst, jnp.ones(40, bool))
    res = gn.run_gauss_newton(problem_fn, Pose.identity(jnp.float64),
                              max_iterations=40)
    assert int(res.status) == gn.CONVERGED
    np.testing.assert_allclose(np.asarray(res.pose.apply(src)),
                               np.asarray(dst), atol=1e-4)


def test_start_at_truth_converges_immediately():
    """Parity with test_optimizer.cpp: starting at the true pose, the
    first update is ~zero and the optimizer reports convergence with
    tiny error."""
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.uniform(-5, 5, size=(30, 3)))
    true = random_pose(rng)
    dst = true.apply(src)
    problem_fn = alignment_problem(src, dst, jnp.ones(30, bool))
    res = gn.run_gauss_newton(problem_fn, true, max_iterations=40)
    assert int(res.status) == gn.CONVERGED
    assert int(res.iterations) == 1
    assert float(res.error) < 1e-8


def test_error_decreases_after_one_step():
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.uniform(-5, 5, size=(25, 3)))
    true = random_pose(rng)
    dst = true.apply(src)
    problem_fn = alignment_problem(src, dst, jnp.ones(25, bool))

    def total_error(pose):
        p = gn.make_problem([ResidualBlock(
            jacobian=jnp.zeros((25, 3, 7)),
            residual=pose.apply(src) - dst,
            valid=jnp.ones(25, bool))])
        return float(jnp.sum(jnp.where(p.valid, p.errors, 0.0)))

    start = Pose.identity(jnp.float64)
    one = gn.run_gauss_newton(problem_fn, start, max_iterations=1)
    assert total_error(one.pose) < total_error(start)


def test_empty_input_status():
    src = jnp.zeros((10, 3))
    problem_fn = alignment_problem(src, src, jnp.zeros(10, bool))
    res = gn.run_gauss_newton(problem_fn, Pose.identity(jnp.float64),
                              max_iterations=5)
    assert int(res.status) == gn.EMPTY_INPUT
    np.testing.assert_allclose(np.asarray(res.pose.t), 0.0)


def test_degenerate_problem_keeps_pose():
    """All points identical -> J^T J singular -> zero update, reported
    converged with unchanged pose (parity: WeightedUpdate zero-update on
    IsDegenerate, optimizer.cpp:66-69)."""
    src = jnp.zeros((12, 3))
    dst = jnp.ones((12, 3))
    problem_fn = alignment_problem(src, dst, jnp.ones(12, bool))
    start = Pose.identity(jnp.float64)
    res = gn.run_gauss_newton(problem_fn, start, max_iterations=10)
    assert int(res.status) == gn.CONVERGED
    np.testing.assert_allclose(np.asarray(res.pose.t), 0.0, atol=1e-12)


def test_robust_to_outliers():
    """Huber-IRLS downweights gross outliers: transform recovered despite
    corrupted correspondences."""
    rng = np.random.default_rng(3)
    src = jnp.asarray(rng.uniform(-5, 5, size=(200, 3)))
    true = random_pose(rng, angle=0.2, trans=0.3)
    dst = np.array(true.apply(src))
    dst[:8] += rng.uniform(5, 10, size=(8, 3))  # 4% outliers
    problem_fn = alignment_problem(src, jnp.asarray(dst),
                                   jnp.ones(200, bool))
    res = gn.run_gauss_newton(problem_fn, Pose.identity(jnp.float64),
                              max_iterations=40)
    inliers = np.asarray(res.pose.apply(src))[8:]
    np.testing.assert_allclose(inliers, dst[8:], atol=2e-2)


def test_masked_lanes_do_not_affect_solution():
    rng = np.random.default_rng(4)
    src = rng.uniform(-5, 5, size=(50, 3))
    true = random_pose(rng)
    dst = np.asarray(true.apply(jnp.asarray(src)))
    # Corrupt the masked-out half with garbage.
    src_pad = np.concatenate([src, rng.normal(size=(50, 3)) * 100])
    dst_pad = np.concatenate([dst, rng.normal(size=(50, 3)) * 100])
    valid = jnp.asarray(np.arange(100) < 50)
    problem_fn = alignment_problem(jnp.asarray(src_pad),
                                   jnp.asarray(dst_pad), valid)
    res = gn.run_gauss_newton(problem_fn, Pose.identity(jnp.float64),
                              max_iterations=40)
    np.testing.assert_allclose(
        np.asarray(res.pose.apply(jnp.asarray(src))), dst, atol=1e-4)


def test_make_m_lifts_quaternion_tangent():
    """M maps (dtheta, dt) to (dq, dt): top block must equal
    0.5 * L(q)[:, 1:] (optimizer.cpp:74-85)."""
    rng = np.random.default_rng(5)
    q = quat.quat_normalize(jnp.asarray(rng.normal(size=4)))
    M = gn.make_m(q)
    L = quat.left_multiplication_matrix(q)
    np.testing.assert_allclose(np.asarray(M[:4, :3]),
                               np.asarray(0.5 * L[:, 1:]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(M[4:, 3:]), np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.asarray(M[:4, 3:]), 0.0)
    np.testing.assert_allclose(np.asarray(M[4:, :3]), 0.0)


def test_align_points_facade():
    """ops.alignment.align_points recovers a rigid transform end-to-end
    (the library-level AlignmentProblem entry, alignment.cpp:65-76)."""
    rng = np.random.default_rng(6)
    src = jnp.asarray(rng.uniform(-5, 5, size=(32, 3)))
    true = random_pose(rng)
    dst = true.apply(src)
    res = align_points(src, dst, jnp.ones(32, bool),
                       Pose.identity(jnp.float64))
    assert int(res.status) == gn.CONVERGED
    np.testing.assert_allclose(np.asarray(res.pose.apply(src)),
                               np.asarray(dst), atol=1e-4)
