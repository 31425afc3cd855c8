"""Dense voxel grid: build/kNN correctness, equivalence with the hash
map, candidate caching contract."""

import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.ops import voxel_grid as vg
from lidar_feature_extraction_tpu.ops import voxel_map as vh

jax.config.update("jax_enable_x64", True)


def build_both(pts, voxel_size=2.0, slots=16):
    lo, hi = pts.min(0), pts.max(0)
    origin, dims = vg.grid_for_bounds(lo, hi, voxel_size)
    grid = vg.build_voxel_grid(jnp.asarray(pts), jnp.ones(len(pts), bool),
                               voxel_size, origin, dims, slots)
    hmap = vh.build_voxel_map(jnp.asarray(pts), jnp.ones(len(pts), bool),
                              voxel_size, 1 << 14, slots)
    return grid, hmap


def test_grid_knn_matches_hash_knn():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-20, 20, size=(3000, 3))
    grid, hmap = build_both(pts)
    q = jnp.asarray(rng.uniform(-18, 18, size=(128, 3)))
    gn_, gsq, gva = vg.knn(grid, q, 8)
    hn_, hsq, hva = vh.knn(hmap, q, 8)
    np.testing.assert_array_equal(np.asarray(gva), np.asarray(hva))
    np.testing.assert_allclose(np.asarray(gsq)[np.asarray(gva)],
                               np.asarray(hsq)[np.asarray(hva)], rtol=1e-9)


def test_grid_knn_exact_vs_bruteforce():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 10, size=(600, 3))
    grid, _ = build_both(pts, voxel_size=2.5, slots=64)
    q = rng.uniform(1, 9, size=(32, 3))
    nbrs, sq, valid = vg.knn(grid, jnp.asarray(q), 4)
    nbrs, sq, valid = map(np.asarray, (nbrs, sq, valid))
    for i in range(32):
        d = np.linalg.norm(pts - q[i], axis=-1)
        want = np.sort(d[d <= 2.5])[:4]
        got = np.sqrt(sq[i][valid[i]])
        m = min(len(want), len(got))
        assert m >= 1
        np.testing.assert_allclose(got[:m], want[:m], rtol=1e-9)


def test_out_of_grid_queries_yield_invalid():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 10, size=(200, 3))
    grid, _ = build_both(pts)
    _, _, valid = vg.knn(grid, jnp.asarray([[500.0, 500.0, 500.0]]), 4)
    assert not bool(valid.any())


def test_candidate_caching_matches_direct_knn():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-15, 15, size=(2000, 3))
    grid, _ = build_both(pts)
    q = jnp.asarray(rng.uniform(-12, 12, size=(64, 3)))
    cand, ok = vg.neighborhood_candidates(grid, q)
    n1, s1, v1 = vg.topk_from_candidates(cand, ok, q, 6)
    n2, s2, v2 = vg.knn(grid, q, 6)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(s1)[np.asarray(v1)],
                               np.asarray(s2)[np.asarray(v2)], rtol=1e-12)


def test_hash_candidates_match_grid_candidates():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-15, 15, size=(1500, 3))
    grid, hmap = build_both(pts)
    q = jnp.asarray(rng.uniform(-12, 12, size=(32, 3)))
    ch, okh = vh.neighborhood_candidates(hmap, q)
    n1, s1, v1 = vg.topk_from_candidates(ch, okh, q, 5)
    n2, s2, v2 = vg.knn(grid, q, 5)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(s1)[np.asarray(v1)],
                               np.asarray(s2)[np.asarray(v2)], rtol=1e-9)


def test_slot_overflow_keeps_first_points():
    pts = np.zeros((10, 3)) + 0.5  # all in one voxel
    grid = vg.build_voxel_grid(jnp.asarray(pts), jnp.ones(10, bool), 1.0,
                               np.zeros(3, np.float32), (2, 2, 2), 4)
    assert int(grid.n_pts.max()) == 4


def test_smallalg_solve3x3_and_cholesky():
    from lidar_feature_extraction_tpu.ops import smallalg

    rng = np.random.default_rng(5)
    m = rng.normal(size=(64, 3, 3))
    a = np.einsum("nij,nkj->nik", m, m) + np.eye(3) * 0.1
    b = rng.normal(size=(64, 3))
    x = smallalg.solve3x3_sym(jnp.asarray(a), jnp.asarray(b))
    want = np.linalg.solve(a, b[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-8, atol=1e-9)

    m6 = rng.normal(size=(6, 6))
    a6 = m6 @ m6.T + np.eye(6)
    b6 = rng.normal(size=6)
    x6 = smallalg.cholesky_solve(jnp.asarray(a6), jnp.asarray(b6))
    np.testing.assert_allclose(np.asarray(x6), np.linalg.solve(a6, b6),
                               rtol=1e-9)


def test_smallalg_jacobi_eigvals():
    from lidar_feature_extraction_tpu.ops import smallalg

    rng = np.random.default_rng(6)
    m = rng.normal(size=(7, 7))
    a = (m + m.T) / 2
    w = np.sort(np.asarray(smallalg.jacobi_eigvalsh(jnp.asarray(a))))
    np.testing.assert_allclose(w, np.linalg.eigvalsh(a), rtol=1e-8,
                               atol=1e-10)


def test_smallalg_min_eigval_below():
    from lidar_feature_extraction_tpu.ops import smallalg

    rng = np.random.default_rng(8)
    for _ in range(20):
        j = rng.normal(size=(20, 7))
        d = j.T @ j  # PSD like the GN degeneracy matrix
        lam_min = np.linalg.eigvalsh(d)[0]
        for tau in [0.1, lam_min * 0.5, lam_min * 2.0 + 1e-6]:
            got = bool(smallalg.min_eigval_below(jnp.asarray(d), float(tau)))
            assert got == (lam_min < tau), (lam_min, tau)
    # Rank-deficient: lambda_min ~ 0 must trip the 0.1 threshold.
    j = rng.normal(size=(20, 6))
    d = np.zeros((7, 7))
    d[:6, :6] = j.T @ j
    assert bool(smallalg.min_eigval_below(jnp.asarray(d), 0.1))
