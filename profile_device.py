"""True device-time per stage: each stage runs N times inside ONE jit
(fori_loop with data dependence) so per-dispatch tunnel overhead is
amortized away. Compare with profile_stages.py to see the dispatch floor.
"""

from __future__ import annotations

import time

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
    extract_features, label_range_image)
from lidar_feature_extraction_tpu.ops.residuals import (
    fit_edge_geometry, fit_surface_geometry,
    edge_rows_from_geometry, surface_rows_from_geometry,
    masked_mean_and_cov, fit_plane)
from lidar_feature_extraction_tpu.ops.eig3 import eigh3x3

N = 50


def timeit_fused(name, body, init, n=N):
    """body(carry) -> carry, looped n times in one program."""
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)

    out = prog(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = prog(init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:44s} {1000 * dt:8.3f} ms/iter", flush=True)
    return out


def main():
    cfg = kitti_hdl64()
    reg = cfg.registration
    rng = np.random.default_rng(0)
    maps, image = build_scene(cfg, rng)
    prior = Pose(q=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                 t=jnp.asarray([0.3, -0.2, 0.05], jnp.float32))

    feats = jax.jit(lambda im: extract_features(im, cfg.extraction))(image)
    surf_ds, surf_ds_valid = jax.jit(
        lambda p, v: voxel_downsample(p, v, reg.surface_downsample_leaf,
                                      reg.max_surface_points))(
        feats.surface_xyz, feats.surface_valid)
    jax.block_until_ready(surf_ds)

    # Perturb the carried tensor slightly each iter to keep a data
    # dependence (prevents loop-invariant hoisting).
    def ext_body(c):
        im, acc = c
        f = extract_features(im, cfg.extraction)
        return im._replace(xyz=im.xyz + 1e-12), acc + f.curvature[0, 0]

    timeit_fused("extract_features", ext_body,
                 (image, jnp.float32(0)))

    def lab_body(c):
        im, acc = c
        lab, curv = label_range_image(im, cfg.extraction)
        return im._replace(xyz=im.xyz + 1e-12), acc + curv[0, 0]

    timeit_fused("  label_range_image", lab_body, (image, jnp.float32(0)))

    def ds_body(c):
        pts, acc = c
        out, ok = voxel_downsample(pts, feats.surface_valid,
                                   reg.surface_downsample_leaf,
                                   reg.max_surface_points)
        return pts + 1e-12, acc + out[0, 0]

    timeit_fused("voxel_downsample(surface)", ds_body,
                 (feats.surface_xyz, jnp.float32(0)))

    pe = prior.apply(feats.edge_xyz)
    ps = prior.apply(surf_ds)

    def gat_e(c):
        q, acc = c
        cand, ok = vg.neighborhood_candidates(maps.edge, q)
        return q + 1e-12, acc + cand[0, 0, 0]

    timeit_fused("gather edge candidates", gat_e, (pe, jnp.float32(0)))

    def gat_s(c):
        q, acc = c
        cand, ok = vg.neighborhood_candidates(maps.surface, q)
        return q + 1e-12, acc + cand[0, 0, 0]

    timeit_fused("gather surface candidates", gat_s, (ps, jnp.float32(0)))

    cand_e, ok_e = jax.jit(vg.neighborhood_candidates)(maps.edge, pe)
    cand_s, ok_s = jax.jit(vg.neighborhood_candidates)(maps.surface, ps)
    jax.block_until_ready(cand_s)

    def topk_e(c):
        q, acc = c
        nb, sq, v = vg.topk_from_candidates(cand_e, ok_e, q,
                                            reg.n_neighbors)
        return q + 1e-12, acc + nb[0, 0, 0]

    timeit_fused("topk edge [2048,216]", topk_e, (pe, jnp.float32(0)))

    def topk_s(c):
        q, acc = c
        nb, sq, v = vg.topk_from_candidates(cand_s, ok_s, q,
                                            reg.n_neighbors)
        return q + 1e-12, acc + nb[0, 0, 0]

    timeit_fused("topk surface [4096,216]", topk_s, (ps, jnp.float32(0)))

    nbrs_e, _, nv_e = jax.jit(lambda c, o, q: vg.topk_from_candidates(
        c, o, q, reg.n_neighbors))(cand_e, ok_e, pe)
    nbrs_s, _, nv_s = jax.jit(lambda c, o, q: vg.topk_from_candidates(
        c, o, q, reg.n_neighbors))(cand_s, ok_s, ps)
    jax.block_until_ready(nbrs_s)

    def eig_body(c):
        nb, acc = c
        _, vecs = eigh3x3(masked_mean_and_cov(nb, nv_e)[1])
        return nb + 1e-12, acc + vecs[0, 0, 0]

    timeit_fused("mean/cov + eigh3x3 (edge)", eig_body,
                 (nbrs_e, jnp.float32(0)))

    def pl_body(c):
        nb, acc = c
        w = fit_plane(nb, nv_s)
        return nb + 1e-12, acc + w[0, 0]

    timeit_fused("fit_plane (surface)", pl_body, (nbrs_s, jnp.float32(0)))

    eg = jax.jit(lambda: fit_edge_geometry(
        cand_e, ok_e, feats.edge_xyz, feats.edge_valid, prior,
        reg.n_neighbors))()
    sg = jax.jit(lambda: fit_surface_geometry(
        cand_s, ok_s, surf_ds, surf_ds_valid, prior, reg.n_neighbors))()
    jax.block_until_ready(sg)

    def light_body(c):
        pose, acc = c
        eb = edge_rows_from_geometry(eg, feats.edge_xyz, pose)
        sb = surface_rows_from_geometry(sg, surf_ds, pose)
        problem = gn.make_problem([eb, sb])
        step = gn.gn_iteration(problem, pose, reg.huber_k,
                               reg.degeneracy_threshold)
        return step.pose, acc + step.error

    timeit_fused("light GN iteration (rows+solve)", light_body,
                 (prior, jnp.float32(0)))

    def rows_body(c):
        pose, acc = c
        eb = edge_rows_from_geometry(eg, feats.edge_xyz, pose)
        sb = surface_rows_from_geometry(sg, surf_ds, pose)
        problem = gn.make_problem([eb, sb])
        return Pose(pose.q, pose.t + 1e-12), acc + problem.errors[0]

    timeit_fused("  rows+make_problem only", rows_body,
                 (prior, jnp.float32(0)))

    eb = edge_rows_from_geometry(eg, feats.edge_xyz, prior)
    sb = surface_rows_from_geometry(sg, surf_ds, prior)
    problem = jax.jit(lambda: gn.make_problem([eb, sb]))()
    jax.block_until_ready(problem)

    def solve_body(c):
        pose, acc = c
        step = gn.gn_iteration(problem, pose, reg.huber_k,
                               reg.degeneracy_threshold)
        return step.pose, acc + step.error

    timeit_fused("  scale+weights+solve only", solve_body,
                 (prior, jnp.float32(0)))

    from lidar_feature_extraction_tpu.core import stats

    def mad_body(c):
        e, acc = c
        s = stats.masked_scale_bisect(e, problem.valid)
        return e + 1e-12, acc + s

    timeit_fused("    masked_scale_bisect only", mad_body,
                 (problem.errors, jnp.float32(0)))


if __name__ == "__main__":
    import sys as _sys
    if "--geometry" in _sys.argv:
        profile_geometry_mode()
        raise SystemExit
    main()


def profile_geometry_mode():
    """Per-stage device times of the geometry-map hot path (the bench
    default since the precomputed-voxel-geometry redesign)."""
    from bench import build_scene
    from lidar_feature_extraction_tpu.ops import geometry_grid as ggr
    from lidar_feature_extraction_tpu.pipeline.localization import (
        build_geometry_maps)

    cfg = kitti_hdl64()
    reg = cfg.registration
    rng = np.random.default_rng(0)
    import bench as bench_mod
    import os
    os.environ["BENCH_MODE"] = ""  # geometry default
    maps, image = build_scene(cfg, rng)
    prior = Pose(q=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                 t=jnp.asarray([0.3, -0.2, 0.05], jnp.float32))

    feats = jax.jit(lambda im: extract_features(im, cfg.extraction))(image)
    surf_ds, surf_ds_valid = jax.jit(
        lambda p, v: voxel_downsample(p, v, reg.surface_downsample_leaf,
                                      reg.max_surface_points))(
        feats.surface_xyz, feats.surface_valid)
    jax.block_until_ready(surf_ds)

    def gath(c):
        q, acc = c
        rec_e, _ = ggr.gather_records(maps.edge, q)
        return q + 1e-12, acc + rec_e[0, 0]

    pe = prior.apply(feats.edge_xyz)
    timeit_fused("geometry gather (edge 2048)", gath, (pe, jnp.float32(0)))

    def rows_body(c):
        pose, acc = c
        eb = ggr.edge_rows_from_grid(maps.edge, feats.edge_xyz,
                                     feats.edge_valid, pose,
                                     reg.min_fit_points)
        sb = ggr.surface_rows_from_grid(maps.surface, surf_ds,
                                        surf_ds_valid, pose,
                                        reg.min_fit_points)
        problem = gn.make_problem([eb, sb])
        return Pose(pose.q, pose.t + 1e-12), acc + problem.errors[0]

    timeit_fused("geometry rows+make_problem", rows_body,
                 (prior, jnp.float32(0)))

    def full_iter(c):
        pose, acc = c
        eb = ggr.edge_rows_from_grid(maps.edge, feats.edge_xyz,
                                     feats.edge_valid, pose,
                                     reg.min_fit_points)
        sb = ggr.surface_rows_from_grid(maps.surface, surf_ds,
                                        surf_ds_valid, pose,
                                        reg.min_fit_points)
        problem = gn.make_problem([eb, sb])
        step = gn.gn_iteration(problem, pose, reg.huber_k,
                               reg.degeneracy_threshold)
        return step.pose, acc + step.error

    timeit_fused("geometry full GN iteration", full_iter,
                 (prior, jnp.float32(0)))

    eb = ggr.edge_rows_from_grid(maps.edge, feats.edge_xyz,
                                 feats.edge_valid, prior,
                                 reg.min_fit_points)
    sb = ggr.surface_rows_from_grid(maps.surface, surf_ds, surf_ds_valid,
                                    prior, reg.min_fit_points)
    problem = jax.jit(lambda: gn.make_problem([eb, sb]))()
    jax.block_until_ready(problem)

    def solve_body(c):
        pose, acc = c
        step = gn.gn_iteration(problem, pose, reg.huber_k,
                               reg.degeneracy_threshold)
        return step.pose, acc + step.error

    timeit_fused("  scale+weights+solve only", solve_body,
                 (prior, jnp.float32(0)))

    from lidar_feature_extraction_tpu.core import stats

    def mad_body(c):
        e, acc = c
        s = stats.masked_scale_bisect(e, problem.valid)
        return e + 1e-12, acc + s

    timeit_fused("    wide-median scale only", mad_body,
                 (problem.errors, jnp.float32(0)))
