"""Point-to-point alignment problem.

Parity with ``AlignmentProblem`` (``localization/src/alignment.cpp:
33-76``): residual ``T(p) - y`` with Jacobian ``[DRpDq | I]`` per
correspondence. The reference uses it as the simplest concrete
``ProblemType`` for its optimizer (exercised by test_optimizer.cpp);
here it serves the same role for ``run_gauss_newton`` and doubles as a
general rigid point-set alignment utility (e.g. loop-closure
verification between keyframe clouds).
"""

from __future__ import annotations

import jax.numpy as jnp

from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.ops import gauss_newton as gn
from lidar_feature_extraction_tpu.ops.residuals import ResidualBlock


def alignment_block(src: jnp.ndarray, dst: jnp.ndarray,
                    valid: jnp.ndarray, pose: Pose) -> ResidualBlock:
    """One [N, 3, 7] residual block for ``T(src) - dst``.

    Jacobian rows ``[DRpDq | I_3]`` (``MakeJacobian``,
    alignment.cpp:33-47); residual ``R(q) p + t - y`` (``MakeResidual``,
    alignment.cpp:49-63). Invalid lanes are zeroed so the masked
    normal-equation reductions ignore them.
    """
    n = src.shape[0]
    r = pose.apply(src) - dst                                 # [N, 3]
    dr = quat.drpdq(jnp.broadcast_to(pose.q, (n, 4)), src)    # [N, 3, 4]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=src.dtype), (n, 3, 3))
    jac = jnp.concatenate([dr, eye], axis=-1)                 # [N, 3, 7]
    okf = valid[:, None]
    return ResidualBlock(jacobian=jnp.where(okf[..., None], jac, 0.0),
                         residual=jnp.where(okf, r, 0.0),
                         valid=valid)


def alignment_problem(src: jnp.ndarray, dst: jnp.ndarray,
                      valid: jnp.ndarray):
    """``problem_fn(pose) -> gn.Problem`` closure over fixed
    correspondences — plug directly into ``gn.run_gauss_newton``
    (parity: ``AlignmentProblem::Make``, alignment.cpp:65-76)."""

    def problem_fn(pose: Pose) -> gn.Problem:
        return gn.make_problem([alignment_block(src, dst, valid, pose)])

    return problem_fn


def align_points(src: jnp.ndarray, dst: jnp.ndarray, valid: jnp.ndarray,
                 initial: Pose, max_iterations: int = 40,
                 convergence_tol: float = 1e-3) -> gn.GNResult:
    """Estimate the rigid transform mapping ``src`` onto ``dst``."""
    return gn.run_gauss_newton(alignment_problem(src, dst, valid),
                               initial, max_iterations=max_iterations,
                               convergence_tol=convergence_tol)
