"""Tests for the registration substrate: eig3x3, voxel map k-NN,
downsample, residual factories."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.core import quaternion as quat
from lidar_feature_extraction_tpu.ops.eig3 import eigh3x3
from lidar_feature_extraction_tpu.ops.voxel_map import build_voxel_map, knn
from lidar_feature_extraction_tpu.ops.downsample import voxel_downsample
from lidar_feature_extraction_tpu.ops import residuals as R

jax.config.update("jax_enable_x64", True)


class TestEig3:
    def test_random_symmetric(self):
        rng = np.random.default_rng(0)
        b = rng.normal(size=(256, 3, 3))
        a = (b + b.transpose(0, 2, 1)) / 2
        w, v = eigh3x3(jnp.asarray(a))
        w, v = np.asarray(w), np.asarray(v)
        wref = np.linalg.eigvalsh(a)
        np.testing.assert_allclose(w, wref, atol=1e-7)
        # A v = w v per column
        av = np.einsum("nij,njk->nik", a, v)
        wv = w[:, None, :] * v
        np.testing.assert_allclose(av, wv, atol=1e-6)
        # Orthonormal
        vtv = np.einsum("nij,nik->njk", v, v)
        np.testing.assert_allclose(
            vtv, np.broadcast_to(np.eye(3), vtv.shape), atol=1e-7)

    def test_line_degenerate(self):
        """Rank-1 covariance (points on a line): principal must be the
        line direction; the other two must stay orthonormal."""
        d = np.array([1.0, 2.0, -0.5])
        d /= np.linalg.norm(d)
        a = np.outer(d, d) * 4.0
        w, v = eigh3x3(jnp.asarray(a[None]))
        w, v = np.asarray(w)[0], np.asarray(v)[0]
        np.testing.assert_allclose(w, [0, 0, 4.0], atol=1e-7)
        assert abs(abs(v[:, 2] @ d) - 1) < 1e-6
        np.testing.assert_allclose(v.T @ v, np.eye(3), atol=1e-6)

    def test_isotropic(self):
        a = np.eye(3)[None] * 2.5
        w, v = eigh3x3(jnp.asarray(a))
        np.testing.assert_allclose(np.asarray(w)[0], 2.5, atol=1e-7)
        np.testing.assert_allclose(np.asarray(v)[0].T @ np.asarray(v)[0],
                                   np.eye(3), atol=1e-7)

    def test_scaled_tiny_and_huge(self):
        rng = np.random.default_rng(1)
        b = rng.normal(size=(8, 3, 3))
        a = (b + b.transpose(0, 2, 1)) / 2
        for s in [1e-6, 1e6]:
            w, _ = eigh3x3(jnp.asarray(a * s))
            np.testing.assert_allclose(np.asarray(w),
                                       np.linalg.eigvalsh(a * s),
                                       rtol=1e-5, atol=1e-7 * s)


class TestVoxelMap:
    def _brute_knn(self, pts, q, k, radius):
        d = np.linalg.norm(pts - q, axis=-1)
        idx = np.argsort(d)[:k]
        return idx[d[idx] <= radius]

    def test_knn_matches_bruteforce_within_neighborhood(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-20, 20, size=(5000, 3))
        vm = build_voxel_map(jnp.asarray(pts), jnp.ones(5000, bool),
                             voxel_size=2.0, capacity=1 << 14, slots=16)
        queries = rng.uniform(-18, 18, size=(64, 3))
        nbrs, sq, valid = knn(vm, jnp.asarray(queries), k=5)
        nbrs, sq, valid = map(np.asarray, (nbrs, sq, valid))
        for i, q in enumerate(queries):
            # All returned neighbors must be real points at the claimed
            # distance.
            for j in range(5):
                if not valid[i, j]:
                    continue
                d2 = np.sum((pts - nbrs[i, j]) ** 2, axis=-1)
                assert d2.min() < 1e-12  # neighbor is an actual map point
                np.testing.assert_allclose(np.sum((nbrs[i, j] - q) ** 2),
                                           sq[i, j], rtol=1e-9)
            # Distances ascend
            svalid = sq[i, valid[i]]
            assert (np.diff(svalid) >= -1e-12).all()

    def test_knn_exact_when_dense_slots(self):
        """With enough slots per voxel the 27-neighborhood k-NN is exact
        for neighbors within one voxel size of the query."""
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 10, size=(800, 3))
        vm = build_voxel_map(jnp.asarray(pts), jnp.ones(800, bool),
                             voxel_size=2.5, capacity=1 << 12, slots=64)
        queries = rng.uniform(1, 9, size=(32, 3))
        nbrs, sq, valid = knn(vm, jnp.asarray(queries), k=4)
        nbrs, sq, valid = map(np.asarray, (nbrs, sq, valid))
        for i, q in enumerate(queries):
            want = self._brute_knn(pts, q, 4, radius=2.5)
            got_d = np.sqrt(sq[i][valid[i]])
            want_d = np.linalg.norm(pts[want] - q, axis=-1)
            m = min(len(want_d), len(got_d))
            assert m >= 1
            np.testing.assert_allclose(got_d[:m], want_d[:m], rtol=1e-9)

    def test_mask_respected(self):
        pts = np.array([[0.0, 0, 0], [5, 5, 5]])
        vm = build_voxel_map(jnp.asarray(pts),
                             jnp.asarray([True, False]),
                             voxel_size=1.0, capacity=64, slots=4)
        _, sq, valid = knn(vm, jnp.asarray([[5.0, 5, 5]]), k=1)
        assert not bool(valid[0, 0])  # masked point is unfindable

    def test_capacity_overflow_drops_not_corrupts(self):
        rng = np.random.default_rng(2)
        pts = rng.uniform(-50, 50, size=(2000, 3))
        vm = build_voxel_map(jnp.asarray(pts), jnp.ones(2000, bool),
                             voxel_size=1.0, capacity=256, slots=2,
                             max_probes=8)
        # Table must stay consistent: n_pts <= slots, keys unique.
        n = np.asarray(vm.n_pts)
        assert (n <= 2).all()
        keys = np.asarray(vm.keys)
        occ = keys[keys != 0x7FFFFFFF]
        assert len(np.unique(occ)) == len(occ)


class TestDownsample:
    def test_centroids(self):
        pts = np.array([
            [0.1, 0.1, 0.1], [0.3, 0.3, 0.3],   # voxel (0,0,0)
            [1.5, 0.2, 0.2],                     # voxel (1,0,0)
        ])
        out, valid = voxel_downsample(jnp.asarray(pts), jnp.ones(3, bool),
                                      1.0, capacity=8)
        out, valid = np.asarray(out), np.asarray(valid)
        assert valid.sum() == 2
        got = sorted(out[valid].tolist())
        np.testing.assert_allclose(got[0], [0.2, 0.2, 0.2], atol=1e-12)
        np.testing.assert_allclose(got[1], [1.5, 0.2, 0.2], atol=1e-12)

    def test_mask_and_capacity(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-10, 10, size=(500, 3))
        mask = rng.random(500) < 0.5
        out, valid = voxel_downsample(jnp.asarray(pts), jnp.asarray(mask),
                                      2.0, capacity=512)
        nvox = len({tuple(np.floor(p / 2.0).astype(int)) for p in pts[mask]})
        assert int(valid.sum()) == nvox


class TestResiduals:
    def test_edge_residual_zero_on_perfect_line(self):
        """Scan points lying exactly on a line of map points must give
        near-zero point-to-line residuals at identity pose."""
        t = np.linspace(-3, 3, 61)
        d = np.array([1.0, 0.5, 0.2])
        d /= np.linalg.norm(d)
        line_pts = t[:, None] * d[None, :]
        vm = build_voxel_map(jnp.asarray(line_pts), jnp.ones(61, bool),
                             voxel_size=1.0, capacity=1 << 10, slots=16)
        scan = jnp.asarray(line_pts[10:50:7])
        block = R.edge_residuals(vm, scan, jnp.ones(scan.shape[0], bool),
                                 Pose.identity(jnp.float64), k=5)
        assert bool(block.valid.all())
        np.testing.assert_allclose(np.asarray(block.residual), 0.0, atol=1e-6)

    def test_edge_jacobian_matches_autodiff(self):
        """J = d residual / d(q, t) at the linearization point."""
        rng = np.random.default_rng(0)
        line_pts = np.linspace(-3, 3, 61)[:, None] * np.array([1.0, 0, 0])
        line_pts += rng.normal(scale=1e-3, size=line_pts.shape)
        vm = build_voxel_map(jnp.asarray(line_pts), jnp.ones(61, bool),
                             voxel_size=1.0, capacity=1 << 10, slots=16)
        scan = jnp.asarray(rng.normal(scale=0.5, size=(4, 3)))
        q0 = jnp.asarray(quat.quat_normalize(jnp.asarray(
            rng.normal(size=4))))
        t0 = jnp.asarray(rng.normal(scale=0.1, size=3))

        # Freeze the correspondences (p1, p2) at the evaluation pose,
        # like the reference's per-iteration linearization.
        pose0 = Pose(q0, t0)
        p_map = pose0.apply(scan)
        nbrs, _, nvalid = knn(vm, p_map, 5)
        mean, cov = R.masked_mean_and_cov(nbrs, nvalid)
        _, evecs = eigh3x3(cov)
        principal = evecs[..., :, 2]
        p1, p2 = mean - principal, mean + principal

        def res_fn(qt):
            # Homogeneous rotation form (Sola eq. 112): its ambient
            # 4-coordinate derivative is DRpDq; the Rodrigues form
            # agrees on values at |q|=1 but not on ambient derivatives.
            q, t = qt[:4], qt[4:]
            w, v = q[0], q[1:]
            p = ((w * w - v @ v) * scan
                 + 2.0 * (scan @ v)[:, None] * v[None, :]
                 + 2.0 * w * jnp.cross(v[None, :], scan)) + t
            return jnp.cross(p - p1, p - p2)

        jac_ad = jax.jacfwd(res_fn)(jnp.concatenate([q0, t0]))  # [4,3,7]
        block = R.edge_residuals(vm, scan, jnp.ones(4, bool), pose0, k=5)
        # Autodiff of the homogeneous rotation formula differs from the
        # unit-constrained DRpDq by the normalization term; at a unit
        # quaternion they agree.
        np.testing.assert_allclose(np.asarray(block.jacobian),
                                   np.asarray(jac_ad), atol=1e-5)

    def test_surface_residual_signed_distance(self):
        """Map = plane z=1; residual must equal the signed point-plane
        distance of the transformed point."""
        rng = np.random.default_rng(1)
        g = np.stack(np.meshgrid(np.linspace(-5, 5, 21),
                                 np.linspace(-5, 5, 21)), -1).reshape(-1, 2)
        plane = np.concatenate([g, np.ones((len(g), 1))], axis=-1)
        vm = build_voxel_map(jnp.asarray(plane), jnp.ones(len(plane), bool),
                             voxel_size=1.0, capacity=1 << 12, slots=16)
        scan = np.array([[0.0, 0, 1.3], [1.0, 1.0, 0.8]])
        block = R.surface_residuals(vm, jnp.asarray(scan),
                                    jnp.ones(2, bool),
                                    Pose.identity(jnp.float64), k=8)
        # Plane z=1 -> w = (0,0,-1) (solves w.x = -1), |w|=1,
        # residual = (w.x+1)/|w| = 1 - z.
        np.testing.assert_allclose(np.asarray(block.residual)[:, 0],
                                   [1 - 1.3, 1 - 0.8], atol=1e-6)

    def test_min_neighbor_gating(self):
        pts = np.zeros((3, 3)) + np.array([[0, 0, 0], [0.1, 0, 0],
                                           [0, 0.1, 0]])
        vm = build_voxel_map(jnp.asarray(pts), jnp.ones(3, bool),
                             voxel_size=1.0, capacity=64, slots=8)
        scan = jnp.asarray([[50.0, 50.0, 0.0]])  # far from any map point
        block = R.edge_residuals(vm, scan, jnp.ones(1, bool),
                                 Pose.identity(jnp.float64), k=5)
        assert not bool(block.valid[0])
        np.testing.assert_allclose(np.asarray(block.jacobian), 0.0)


class TestGeometryHoisting:
    """The fitted-geometry path (fit once per round) must produce the
    exact same rows as the candidate path when evaluated at the fit
    pose, and the same registration result when the pose barely moves."""

    def _scene(self):
        rng = np.random.default_rng(7)
        t = np.linspace(-4, 4, 81)
        line = t[:, None] * np.array([0.2, 1.0, 0.1])
        line += rng.normal(scale=1e-3, size=line.shape)
        g = np.stack(np.meshgrid(np.linspace(-5, 5, 31),
                                 np.linspace(-5, 5, 31)), -1).reshape(-1, 2)
        plane = np.concatenate([g, rng.normal(scale=1e-3,
                                              size=(len(g), 1))], -1)
        return line, plane, rng

    def test_rows_match_candidate_path_at_fit_pose(self):
        from lidar_feature_extraction_tpu.ops import voxel_grid as vg

        line, plane, rng = self._scene()
        e_origin, e_dims = vg.grid_for_bounds(line.min(0), line.max(0), 1.0)
        s_origin, s_dims = vg.grid_for_bounds(plane.min(0), plane.max(0),
                                              1.0)
        eg_map = vg.build_voxel_grid(jnp.asarray(line),
                                     jnp.ones(len(line), bool), 1.0,
                                     e_origin, e_dims, 16)
        sg_map = vg.build_voxel_grid(jnp.asarray(plane),
                                     jnp.ones(len(plane), bool), 1.0,
                                     s_origin, s_dims, 16)

        e_scan = jnp.asarray(line[5:70:9] + rng.normal(scale=0.01,
                                                       size=(8, 3)))
        s_scan = jnp.asarray(plane[10:800:37] + rng.normal(
            scale=0.01, size=(22, 3)))
        e_valid = jnp.ones(e_scan.shape[0], bool)
        s_valid = jnp.ones(s_scan.shape[0], bool)
        pose = Pose(quat.quat_normalize(jnp.asarray([1.0, 0.01, -0.02,
                                                     0.015])),
                    jnp.asarray([0.05, -0.03, 0.02]))

        ce, oe = vg.neighborhood_candidates(eg_map, pose.apply(e_scan))
        cs, os_ = vg.neighborhood_candidates(sg_map, pose.apply(s_scan))

        ref_e = R.edge_residuals_from_candidates(ce, oe, e_scan, e_valid,
                                                 pose, 8)
        ref_s = R.surface_residuals_from_candidates(cs, os_, s_scan,
                                                    s_valid, pose, 8)

        geo_e = R.fit_edge_geometry(ce, oe, e_scan, e_valid, pose, 8)
        geo_s = R.fit_surface_geometry(cs, os_, s_scan, s_valid, pose, 8)
        got_e = R.edge_rows_from_geometry(geo_e, e_scan, pose)
        got_s = R.surface_rows_from_geometry(geo_s, s_scan, pose)

        np.testing.assert_allclose(np.asarray(got_e.jacobian),
                                   np.asarray(ref_e.jacobian), atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_e.residual),
                                   np.asarray(ref_e.residual), atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_s.jacobian),
                                   np.asarray(ref_s.jacobian), atol=1e-12)
        np.testing.assert_allclose(np.asarray(got_s.residual),
                                   np.asarray(ref_s.residual), atol=1e-12)
        np.testing.assert_array_equal(np.asarray(got_e.valid),
                                      np.asarray(ref_e.valid))
        np.testing.assert_array_equal(np.asarray(got_s.valid),
                                      np.asarray(ref_s.valid))
