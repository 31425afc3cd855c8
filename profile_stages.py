"""Per-stage hot-path profiling on the real chip (host-stepped jits).

Times each stage of the SURVEY.md §3.1 hot path independently so
optimization effort goes where the milliseconds are. Uses the bench.py
scene and config.
"""

from __future__ import annotations

import os
import time

# This script profiles the POINT-map path (vg.neighborhood_candidates +
# per-point fits); force build_scene to build FeatureMaps, not the
# GeometryMaps default. profile_geom.py covers the geometry-map path.
os.environ["BENCH_MODE"] = "points"

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_scene
from lidar_feature_extraction_tpu.config import kitti_hdl64
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.ops import gauss_newton as gn
from lidar_feature_extraction_tpu.ops import voxel_grid as vg
from lidar_feature_extraction_tpu.ops.downsample import voxel_downsample
from lidar_feature_extraction_tpu.ops.extraction import (
    extract_features, label_range_image, compact_by_mask)
from lidar_feature_extraction_tpu.ops.residuals import (
    edge_residuals_from_candidates, surface_residuals_from_candidates,
    masked_mean_and_cov, fit_plane)
from lidar_feature_extraction_tpu.ops.eig3 import eigh3x3


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:42s} {1000 * dt:8.3f} ms", flush=True)
    return out


def main():
    cfg = kitti_hdl64()
    reg = cfg.registration
    rng = np.random.default_rng(0)
    maps, image = build_scene(cfg, rng)
    prior = Pose(q=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                 t=jnp.asarray([0.3, -0.2, 0.05], jnp.float32))

    feats = timeit("extract_features", jax.jit(
        lambda im: extract_features(im, cfg.extraction)), image)
    timeit("  label_range_image", jax.jit(
        lambda im: label_range_image(im, cfg.extraction)), image)

    surf_ds, surf_ds_valid = timeit("voxel_downsample(surface)", jax.jit(
        lambda p, v: voxel_downsample(p, v, reg.surface_downsample_leaf,
                                      reg.max_surface_points)),
        feats.surface_xyz, feats.surface_valid)

    pe = prior.apply(feats.edge_xyz)
    ps = prior.apply(surf_ds)

    cand_e, ok_e = timeit("gather edge candidates", jax.jit(
        lambda m, q: vg.neighborhood_candidates(m, q)), maps.edge, pe)
    cand_s, ok_s = timeit("gather surface candidates", jax.jit(
        lambda m, q: vg.neighborhood_candidates(m, q)), maps.surface, ps)
    print(f"  edge cand {cand_e.shape}  surf cand {cand_s.shape}")

    nbrs_e, _, nv_e = timeit("topk edge", jax.jit(
        lambda c, o, q: vg.topk_from_candidates(c, o, q, reg.n_neighbors)),
        cand_e, ok_e, pe)
    nbrs_s, _, nv_s = timeit("topk surface", jax.jit(
        lambda c, o, q: vg.topk_from_candidates(c, o, q, reg.n_neighbors)),
        cand_s, ok_s, ps)

    timeit("eigh3x3(edge cov)", jax.jit(
        lambda nb, v: eigh3x3(masked_mean_and_cov(nb, v)[1])),
        nbrs_e, nv_e)
    timeit("fit_plane(surface)", jax.jit(
        lambda nb, v: fit_plane(nb, v)), nbrs_s, nv_s)

    def full_step(ce, oe, cs, os_, pose):
        eb = edge_residuals_from_candidates(
            ce, oe, feats.edge_xyz, feats.edge_valid, pose, reg.n_neighbors)
        sb = surface_residuals_from_candidates(
            cs, os_, surf_ds, surf_ds_valid, pose, reg.n_neighbors)
        problem = gn.make_problem([eb, sb])
        return gn.gn_iteration(problem, pose, reg.huber_k,
                               reg.degeneracy_threshold)

    timeit("gn_iteration (rerank+fit+solve)", jax.jit(full_step),
           cand_e, ok_e, cand_s, ok_s, prior)

    def resid_only(ce, oe, cs, os_, pose):
        eb = edge_residuals_from_candidates(
            ce, oe, feats.edge_xyz, feats.edge_valid, pose, reg.n_neighbors)
        sb = surface_residuals_from_candidates(
            cs, os_, surf_ds, surf_ds_valid, pose, reg.n_neighbors)
        return gn.make_problem([eb, sb])

    problem = timeit("  residuals+make_problem only", jax.jit(resid_only),
                     cand_e, ok_e, cand_s, ok_s, prior)

    timeit("  scale+weights+solve only", jax.jit(
        lambda pr, pose: gn.gn_iteration(pr, pose, reg.huber_k,
                                         reg.degeneracy_threshold)),
        problem, prior)


if __name__ == "__main__":
    main()
