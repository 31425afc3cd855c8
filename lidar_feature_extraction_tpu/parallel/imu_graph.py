"""IMU-aware keyframe graph: poses + velocities, relative-pose
constraints AND preintegrated-IMU factor blocks.

The reference intended IMU integration but shipped a stub
(``imu_integration/include/imu_integration/integration.hpp:30-33``,
SURVEY.md §2.6); its LIO-SAM lineage puts preintegrated IMU factors
between keyframes of a pose graph. This module is that back-end,
TPU-native: the state is [K] keyframes of (q, t, v) — 9-dim tangent
each — and two batched factor families linearized with ``jacfwd`` and
reduced to dense normal equations exactly like parallel/pose_graph.py
(same sharding story: factors shard on the leading axis, the global
H/g is one ``psum`` over the mesh).

Bias states are NOT estimated here: factors are used at their
preintegration linearization bias (fusion/imu.py carries the
first-order bias Jacobians for the day bias estimation is added; the
EKF's yaw-bias state covers the dominant gyro-bias effect in the
meantime, ekf_localizer.hpp:141-171).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.fusion.imu import GRAVITY
from lidar_feature_extraction_tpu.parallel.pose_graph import (
    Constraints, constraint_residual)


class ImuGraph(NamedTuple):
    poses_q: jnp.ndarray   # [K, 4]
    poses_t: jnp.ndarray   # [K, 3]
    vels: jnp.ndarray      # [K, 3] world-frame velocities


class ImuFactors(NamedTuple):
    """Batched preintegrated-IMU factors (fixed shape, maskable).

    dq/dv/dp/dt: stacked ``ImuPreintegration`` deltas between keyframes
    i and j. w_rot/w_vel/w_pos: per-block scalar information weights
    (1/sigma^2), typically from the preintegration covariance diagonal.
    weight == 0 masks a lane."""

    i: jnp.ndarray        # [M]
    j: jnp.ndarray        # [M]
    dq: jnp.ndarray       # [M, 4]
    dv: jnp.ndarray       # [M, 3]
    dp: jnp.ndarray       # [M, 3]
    dt: jnp.ndarray       # [M]
    w_rot: jnp.ndarray    # [M]
    w_vel: jnp.ndarray    # [M]
    w_pos: jnp.ndarray    # [M]
    weight: jnp.ndarray   # [M] overall scale (0 masks)


def imu_residual_9(qi, ti, vi, qj, tj, vj, dq, dv, dp, dt,
                   gravity=GRAVITY):
    """[9] residual (theta, v, p) of one preintegrated factor — the
    batched-graph form of fusion.imu.imu_factor_residual."""
    gravity = jnp.asarray(gravity, jnp.asarray(ti).dtype)
    qi_inv = quat.quat_conjugate(qi)
    rel_q = quat.quat_multiply(qi_inv, qj)
    r_theta = quat.log_so3(
        quat.quat_multiply(quat.quat_conjugate(dq), rel_q))
    r_v = quat.quat_rotate(qi_inv, vj - vi - gravity * dt) - dv
    r_p = quat.quat_rotate(
        qi_inv, tj - ti - vi * dt - 0.5 * gravity * dt * dt) - dp
    return jnp.concatenate([r_theta, r_v, r_p])


def _perturb9(q, t, v, xi):
    """Right-perturbation of a 9-dim state: (dtheta, dt_local, dv)."""
    dq = quat.exp_so3(xi[:3])
    return (quat.quat_multiply(q, dq),
            t + quat.quat_rotate(q, xi[3:6]),
            v + xi[6:9])


def _linearize_imu_one(qi, ti, vi, qj, tj, vj, dq, dv, dp, dt):
    r = imu_residual_9(qi, ti, vi, qj, tj, vj, dq, dv, dp, dt)

    def fi(xi):
        q2, t2, v2 = _perturb9(qi, ti, vi, xi)
        return imu_residual_9(q2, t2, v2, qj, tj, vj, dq, dv, dp, dt)

    def fj(xi):
        q2, t2, v2 = _perturb9(qj, tj, vj, xi)
        return imu_residual_9(qi, ti, vi, q2, t2, v2, dq, dv, dp, dt)

    zero = jnp.zeros(9, qi.dtype)
    return r, jax.jacfwd(fi)(zero), jax.jacfwd(fj)(zero)


_linearize_imu = jax.vmap(_linearize_imu_one)


def _linearize_pose_one(qi, ti, qj, tj, z_q, z_t):
    r = constraint_residual(qi, ti, qj, tj, z_q, z_t)

    def fi(xi):
        q2, t2, _ = _perturb9(qi, ti, jnp.zeros(3, qi.dtype), xi)
        return constraint_residual(q2, t2, qj, tj, z_q, z_t)

    def fj(xi):
        q2, t2, _ = _perturb9(qj, tj, jnp.zeros(3, qi.dtype), xi)
        return constraint_residual(qi, ti, q2, t2, z_q, z_t)

    zero = jnp.zeros(9, qi.dtype)
    return r, jax.jacfwd(fi)(zero), jax.jacfwd(fj)(zero)


_linearize_pose = jax.vmap(_linearize_pose_one)


def _scatter(h, g, bi, bj, r, ji, jj, wji, wjj):
    """Accumulate one factor family's weighted blocks into H [9K, 9K],
    g [9K]. ji/jj: [M, D, 9] raw Jacobians; wji/wjj: the same blocks
    pre-multiplied by the factor's (possibly non-diagonal) information
    Lambda: wji = Lambda @ ji — so H_ii = ji^T Lambda ji etc."""
    hii = jnp.einsum("mki,mkj->mij", wji, ji)
    hij = jnp.einsum("mki,mkj->mij", wji, jj)
    hjj = jnp.einsum("mki,mkj->mij", wjj, jj)
    gi = jnp.einsum("mki,mk->mi", wji, r)
    gj = jnp.einsum("mki,mk->mi", wjj, r)

    def block(h, bi, bj, blocks):
        rows = bi[:, None] * 9 + jnp.arange(9)[None, :]
        cols = bj[:, None] * 9 + jnp.arange(9)[None, :]
        rr = jnp.repeat(rows[:, :, None], 9, axis=2)
        cc = jnp.repeat(cols[:, None, :], 9, axis=1)
        return h.at[rr, cc].add(blocks)

    h = block(h, bi, bi, hii)
    h = block(h, bi, bj, hij)
    h = block(h, bj, bi, jnp.swapaxes(hij, 1, 2))
    h = block(h, bj, bj, hjj)
    g = g.at[bi[:, None] * 9 + jnp.arange(9)[None, :]].add(gi)
    g = g.at[bj[:, None] * 9 + jnp.arange(9)[None, :]].add(gj)
    return h, g


def optimize_imu_graph(graph: ImuGraph, cons: Constraints | None,
                       imu: ImuFactors | None,
                       n_iterations: int = 10,
                       prior_weight: float = 1e6,
                       damping: float = 1e-4,
                       robust_delta: float | None = None,
                       axis_name: str | None = None) -> ImuGraph:
    """Gauss-Newton over (pose, velocity) keyframe states with
    relative-pose constraints and IMU factors. Semantics mirror
    ``optimize_pose_graph`` (gauge prior on pose 0, Levenberg damping,
    optional Geman-McClure kernel on the pose constraints, optional
    ``psum`` sharding over ``axis_name``)."""
    k = graph.poses_q.shape[0]
    k9 = 9 * k
    dtype = graph.poses_t.dtype

    def step(_, graph):
        h = jnp.zeros((k9, k9), dtype)
        g = jnp.zeros((k9,), dtype)

        if cons is not None:
            r, ji, jj = _linearize_pose(
                graph.poses_q[cons.i], graph.poses_t[cons.i],
                graph.poses_q[cons.j], graph.poses_t[cons.j],
                cons.z_q, cons.z_t)
            w = cons.weight
            if robust_delta is not None:
                d2 = robust_delta * robust_delta
                r2 = jnp.sum(r * r, axis=-1)
                w = w * jnp.square(d2 / (d2 + r2))
            if cons.info is not None:
                lam = w[:, None, None] * cons.info
                wji = jnp.einsum("mab,mbk->mak", lam, ji)
                wjj = jnp.einsum("mab,mbk->mak", lam, jj)
            else:
                wji = w[:, None, None] * ji
                wjj = w[:, None, None] * jj
            h, g = _scatter(h, g, cons.i, cons.j, r, ji, jj, wji, wjj)

        if imu is not None:
            r, ji, jj = _linearize_imu(
                graph.poses_q[imu.i], graph.poses_t[imu.i],
                graph.vels[imu.i],
                graph.poses_q[imu.j], graph.poses_t[imu.j],
                graph.vels[imu.j],
                imu.dq, imu.dv, imu.dp, imu.dt)
            w9 = jnp.concatenate([
                jnp.broadcast_to((imu.weight * imu.w_rot)[:, None],
                                 (imu.i.shape[0], 3)),
                jnp.broadcast_to((imu.weight * imu.w_vel)[:, None],
                                 (imu.i.shape[0], 3)),
                jnp.broadcast_to((imu.weight * imu.w_pos)[:, None],
                                 (imu.i.shape[0], 3))], axis=-1)
            h, g = _scatter(h, g, imu.i, imu.j, r, ji, jj,
                            w9[:, :, None] * ji, w9[:, :, None] * jj)

        if axis_name is not None:
            h = jax.lax.psum(h, axis_name)
            g = jax.lax.psum(g, axis_name)

        prior = jnp.zeros(k9, dtype).at[:6].set(prior_weight)
        h = h + jnp.diag(prior + damping)
        dx = -jnp.linalg.solve(h, g)

        xi = dx.reshape(k, 9)
        dq = quat.exp_so3(xi[:, :3])
        q2 = quat.quat_normalize(quat.quat_multiply(graph.poses_q, dq))
        t2 = graph.poses_t + quat.quat_rotate(graph.poses_q, xi[:, 3:6])
        v2 = graph.vels + xi[:, 6:9]
        return ImuGraph(poses_q=q2, poses_t=t2, vels=v2)

    return jax.lax.fori_loop(0, n_iterations, step, graph)


def weights_from_covariance(cov: jnp.ndarray,
                            max_weight: float = 1e5) -> tuple:
    """(w_rot, w_vel, w_pos) scalar information weights from a [..., 9,
    9] preintegration covariance: inverse mean diagonal per 3-block.

    ``max_weight`` caps the information so a near-noiseless IMU cannot
    push the float32 normal equations past usable conditioning (the
    gauge prior is 1e6; weights far above it would drown it)."""
    d = jnp.diagonal(cov, axis1=-2, axis2=-1)
    eps = 1e-12
    return (jnp.minimum(1.0 / (jnp.mean(d[..., 0:3], axis=-1) + eps),
                        max_weight),
            jnp.minimum(1.0 / (jnp.mean(d[..., 3:6], axis=-1) + eps),
                        max_weight),
            jnp.minimum(1.0 / (jnp.mean(d[..., 6:9], axis=-1) + eps),
                        max_weight))
