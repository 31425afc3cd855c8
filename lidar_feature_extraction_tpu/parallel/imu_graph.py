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

Bias estimation (r4): setting ``ImuGraph.bg``/``ba`` adds a SHARED
gyro/accel bias pair to the state, corrected into every factor through
the preintegration's first-order bias Jacobians (fusion/imu.py) — the
LIO-SAM-style joint estimation the reference's stub intended. Factors
stay at their zero-bias linearization (no re-integration). The EKF's
yaw-bias state (ekf_localizer.hpp:141-171) still covers the online
localization path; this covers the mapping back-end.
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
    # Shared IMU biases, estimated jointly with the trajectory when set
    # (arrays [3]; None disables estimation of that bias — setting only
    # ``bg`` estimates the gyro bias and holds the accel bias at the
    # linearization point, the robust default: accel bias is weakly
    # observable on short planar segments and otherwise absorbs any
    # accel model error). Factors must carry their first-order bias
    # Jacobians (ImuFactors.dq_dbg etc.), and the biases are
    # interpreted RELATIVE to the factors' linearization bias (the
    # pipeline preintegrates at zero bias, so these are the absolute
    # biases there).
    bg: jnp.ndarray | None = None
    ba: jnp.ndarray | None = None


class ImuFactors(NamedTuple):
    """Batched preintegrated-IMU factors (fixed shape, maskable).

    dq/dv/dp/dt: stacked ``ImuPreintegration`` deltas between keyframes
    i and j. w_rot/w_vel/w_pos: per-block scalar information weights
    (1/sigma^2), typically from the preintegration covariance diagonal.
    weight == 0 masks a lane. The optional [M, 3, 3] blocks are the
    stacked first-order bias-correction Jacobians (Forster eqs. 69-71,
    fusion/imu.py preintegrate) — required for bias estimation."""

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
    dq_dbg: jnp.ndarray | None = None
    dv_dbg: jnp.ndarray | None = None
    dv_dba: jnp.ndarray | None = None
    dp_dbg: jnp.ndarray | None = None
    dp_dba: jnp.ndarray | None = None


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


def imu_residual_9_bias(qi, ti, vi, qj, tj, vj, dq, dv, dp, dt,
                        dq_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba,
                        dbg, dba, gravity=GRAVITY):
    """Bias-corrected preintegration residual: the factor's deltas are
    shifted to the bias estimate (dbg, dba) away from the linearization
    point via the first-order Jacobians (no re-integration; fusion/
    imu.py imu_factor_residual carries the same correction)."""
    dq = quat.quat_multiply(dq, quat.exp_so3(dq_dbg @ dbg))
    dv = dv + dv_dbg @ dbg + dv_dba @ dba
    dp = dp + dp_dbg @ dbg + dp_dba @ dba
    return imu_residual_9(qi, ti, vi, qj, tj, vj, dq, dv, dp, dt,
                          gravity=gravity)


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


def _linearize_imu_bias_one(qi, ti, vi, qj, tj, vj, dq, dv, dp, dt,
                            dq_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba,
                            bg, ba):
    r = imu_residual_9_bias(qi, ti, vi, qj, tj, vj, dq, dv, dp, dt,
                            dq_dbg, dv_dbg, dv_dba, dp_dbg, dp_dba,
                            bg, ba)

    def fi(xi):
        q2, t2, v2 = _perturb9(qi, ti, vi, xi)
        return imu_residual_9_bias(q2, t2, v2, qj, tj, vj, dq, dv, dp,
                                   dt, dq_dbg, dv_dbg, dv_dba, dp_dbg,
                                   dp_dba, bg, ba)

    def fj(xi):
        q2, t2, v2 = _perturb9(qj, tj, vj, xi)
        return imu_residual_9_bias(qi, ti, vi, q2, t2, v2, dq, dv, dp,
                                   dt, dq_dbg, dv_dbg, dv_dba, dp_dbg,
                                   dp_dba, bg, ba)

    def fb(xb):
        return imu_residual_9_bias(qi, ti, vi, qj, tj, vj, dq, dv, dp,
                                   dt, dq_dbg, dv_dbg, dv_dba, dp_dbg,
                                   dp_dba, bg + xb[:3], ba + xb[3:])

    zero9 = jnp.zeros(9, qi.dtype)
    zero6 = jnp.zeros(6, qi.dtype)
    return (r, jax.jacfwd(fi)(zero9), jax.jacfwd(fj)(zero9),
            jax.jacfwd(fb)(zero6))


_linearize_imu_bias = jax.vmap(
    _linearize_imu_bias_one,
    in_axes=(0,) * 15 + (None, None))


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
                       bias_prior_weight: float = 0.5,
                       bias_step_clip: float = 0.02,
                       bias_clip: float = 0.5,
                       axis_name: str | None = None) -> ImuGraph:
    """Gauss-Newton over (pose, velocity) keyframe states with
    relative-pose constraints and IMU factors. Semantics mirror
    ``optimize_pose_graph`` (gauge prior on pose 0, Levenberg damping,
    optional Geman-McClure kernel on the pose constraints, optional
    ``psum`` sharding over ``axis_name``).

    When ``graph.bg``/``graph.ba`` are set (and the factors carry bias
    Jacobians) the shared gyro/accel biases join the state — the
    LIO-SAM-style joint bias estimation the reference's stubbed
    imu_integration intended. A soft zero-bias prior
    (``bias_prior_weight``) keeps weakly-observable bias axes (e.g.
    accel z on a planar drive, which trades against gravity) bounded.
    Note the information balance: bias observability comes from the
    DISAGREEMENT between the (dimensionless, weight~1) pose-chain
    constraints and the (metrically-weighted) IMU factors, so the
    recovered-bias fraction is roughly chain_info / (chain_info +
    bias_prior_weight) — keep the prior well below the number of chain
    constraints or it eats the estimate."""
    k = graph.poses_q.shape[0]
    k9 = 9 * k
    dtype = graph.poses_t.dtype
    est_bias = (graph.bg is not None and imu is not None
                and imu.dq_dbg is not None)
    est_ba = est_bias and graph.ba is not None
    nb = (6 if est_ba else 3) if est_bias else 0
    dim = k9 + nb

    def step(_, graph):
        h = jnp.zeros((dim, dim), dtype)
        g = jnp.zeros((dim,), dtype)

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
            if est_bias:
                r, ji, jj, jb = _linearize_imu_bias(
                    graph.poses_q[imu.i], graph.poses_t[imu.i],
                    graph.vels[imu.i],
                    graph.poses_q[imu.j], graph.poses_t[imu.j],
                    graph.vels[imu.j],
                    imu.dq, imu.dv, imu.dp, imu.dt,
                    imu.dq_dbg, imu.dv_dbg, imu.dv_dba,
                    imu.dp_dbg, imu.dp_dba,
                    graph.bg,
                    graph.ba if est_ba
                    else jnp.zeros(3, graph.poses_t.dtype))
                jb = jb[:, :, :nb]
            else:
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
            wji = w9[:, :, None] * ji
            wjj = w9[:, :, None] * jj
            h, g = _scatter(h, g, imu.i, imu.j, r, ji, jj, wji, wjj)
            if est_bias:
                # Bias cross/diagonal blocks appended at rows/cols
                # [k9, k9 + 6).
                wjb = w9[:, :, None] * jb            # [M, 9, nb]
                hib = jnp.einsum("mki,mkj->mij", wji, jb)   # [M, 9, nb]
                hjb = jnp.einsum("mki,mkj->mij", wjj, jb)
                hbb = jnp.einsum("mki,mkj->ij", wjb, jb)    # [nb, nb]
                gb = jnp.einsum("mki,mk->i", wjb, r)        # [nb]
                cols_b = k9 + jnp.arange(nb)
                for bidx, blocks in ((imu.i, hib), (imu.j, hjb)):
                    rows = bidx[:, None] * 9 + jnp.arange(9)[None, :]
                    rr = rows[:, :, None]
                    cc = jnp.broadcast_to(cols_b[None, None, :],
                                          blocks.shape)
                    h = h.at[rr, cc].add(blocks)
                    h = h.at[cc, rr].add(blocks)  # symmetric transpose
                h = h.at[cols_b[:, None], cols_b[None, :]].add(hbb)
                g = g.at[cols_b].add(gb)

        if axis_name is not None:
            h = jax.lax.psum(h, axis_name)
            g = jax.lax.psum(g, axis_name)

        prior = jnp.zeros(dim, dtype).at[:6].set(prior_weight)
        if est_bias:
            # Soft zero-bias prior: a true prior residual (b - 0), not
            # just added stiffness — g must carry it or the bias walks.
            prior = prior.at[k9:].add(bias_prior_weight)
            g = g.at[k9:k9 + 3].add(bias_prior_weight * graph.bg)
            if est_ba:
                g = g.at[k9 + 3:].add(bias_prior_weight * graph.ba)
        h = h + jnp.diag(prior + damping)
        # Jacobi equilibration: the raw system spans ~10 orders of
        # magnitude (gauge prior 1e6, IMU information ~1e5, damping
        # 1e-4) — beyond f32 solve precision; symmetric diagonal
        # scaling brings the condition number back into range (without
        # it the joint bias estimation walks off along its flattest
        # coupled direction after ~40 iterations).
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(h), 1e-12))
        hn = h / d[:, None] / d[None, :]
        dx = -jnp.linalg.solve(hn, g / d) / d

        xi = dx[:k9].reshape(k, 9)
        dq = quat.exp_so3(xi[:, :3])
        q2 = quat.quat_normalize(quat.quat_multiply(graph.poses_q, dq))
        t2 = graph.poses_t + quat.quat_rotate(graph.poses_q, xi[:, 3:6])
        v2 = graph.vels + xi[:, 6:9]
        if est_bias:
            # Trust region on the bias: the factor correction is a
            # FIRST-ORDER expansion (exp(J_dbg @ bg) on rotation) —
            # a large step leaves its validity region, the wrapped
            # rotation correction points the next step further out,
            # and the bias runs away (observed: 0.003 -> 1e8 rad/s in
            # ten iterations). Physical biases are < 0.05 rad/s |
            # m/s^2; clamp the per-iteration step and the state.
            db = jnp.clip(dx[k9:], -bias_step_clip, bias_step_clip)
            bg2 = jnp.clip(graph.bg + db[:3], -bias_clip, bias_clip)
            return ImuGraph(poses_q=q2, poses_t=t2, vels=v2,
                            bg=bg2,
                            ba=jnp.clip(graph.ba + db[3:], -bias_clip,
                                        bias_clip) if est_ba
                            else graph.ba)
        return ImuGraph(poses_q=q2, poses_t=t2, vels=v2,
                        bg=graph.bg, ba=graph.ba)

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
