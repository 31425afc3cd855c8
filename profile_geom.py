"""Device-time per stage for the GEOMETRY-MAP hot path (the bench.py
default). Each stage loops N times inside one jit with a carried data
dependence, so neither dispatch overhead nor loop-invariant hoisting
pollutes the numbers.
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

from bench import build_scene
from lidar_feature_extraction_tpu.config import kitti_hdl64
from lidar_feature_extraction_tpu.core.pose import Pose
from lidar_feature_extraction_tpu.ops import gauss_newton as gn
from lidar_feature_extraction_tpu.ops import geometry_grid as gg
from lidar_feature_extraction_tpu.ops.downsample import voxel_downsample
from lidar_feature_extraction_tpu.ops.extraction import (
    extract_features, label_range_image)
from lidar_feature_extraction_tpu.pipeline.localization import (
    localize_scan, register_scan_geometry)

N = 30


def timeit_fused(name, body, init, n=N):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)

    out = prog(init)
    jax.block_until_ready(out)
    # Best-of-3, chaining outputs: the tunnel adds ~25 ms per unique
    # dispatch and dedupes repeated identical ones.
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = prog(out)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / n)
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

    def full_body(c):
        im, t = c
        im2 = im._replace(xyz=image.xyz + 1e-3 * t[None, None, :])
        pr = Pose(q=prior.q, t=prior.t + 1e-3 * t)
        result, _ = localize_scan(maps, im2, pr, cfg)
        return im2, result.pose.t

    timeit_fused("FULL localize_scan", full_body, (image, prior.t))

    def ext_body(c):
        im, acc = c
        f = extract_features(im, cfg.extraction)
        return im._replace(xyz=image.xyz + 1e-9 * acc), \
            acc + f.curvature[0, 0] + f.edge_xyz[0, 0]

    timeit_fused("extract_features", ext_body, (image, jnp.float32(0)))

    def lab_body(c):
        im, acc = c
        lab, curv = label_range_image(im, cfg.extraction)
        return im._replace(xyz=image.xyz + 1e-9 * acc), acc + curv[0, 0]

    timeit_fused("  label_range_image", lab_body, (image, jnp.float32(0)))

    def ds_body(c):
        pts, acc = c
        out, ok = voxel_downsample(pts, feats.surface_valid,
                                   reg.surface_downsample_leaf,
                                   reg.max_surface_points)
        return feats.surface_xyz + 1e-9 * acc, acc + out[0, 0]

    timeit_fused("voxel_downsample(surface)", ds_body,
                 (feats.surface_xyz, jnp.float32(0)))

    def reg_body(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        result = register_scan_geometry(
            maps, feats.edge_xyz, feats.edge_valid,
            feats.surface_xyz, feats.surface_valid, pr, cfg)
        return prior.t + 1e-6 * result.pose.t, acc + result.iterations

    timeit_fused("register_scan_geometry (all iters)", reg_body,
                 (prior.t, jnp.asarray(0, jnp.int32)))

    def rows_body(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        eb = gg.edge_rows_from_grid(maps.edge, feats.edge_xyz,
                                    feats.edge_valid, pr,
                                    reg.min_fit_points)
        sb = gg.surface_rows_from_grid(maps.surface, surf_ds,
                                       surf_ds_valid, pr,
                                       reg.min_fit_points)
        problem = gn.make_problem([eb, sb])
        step = gn.gn_iteration(problem, pr, reg.huber_k,
                               reg.degeneracy_threshold)
        return prior.t + 1e-6 * step.pose.t, acc + 1

    timeit_fused("  one GN iteration (rows+solve)", rows_body,
                 (prior.t, jnp.asarray(0, jnp.int32)))

    def rows_only(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        eb = gg.edge_rows_from_grid(maps.edge, feats.edge_xyz,
                                    feats.edge_valid, pr,
                                    reg.min_fit_points)
        sb = gg.surface_rows_from_grid(maps.surface, surf_ds,
                                       surf_ds_valid, pr,
                                       reg.min_fit_points)
        problem = gn.make_problem([eb, sb])
        return prior.t + 1e-9 * problem.res_rows[0], acc + 1

    timeit_fused("    residual rows only", rows_only,
                 (prior.t, jnp.asarray(0, jnp.int32)))


if __name__ == "__main__" and not os.environ.get("PROFILE_COMPACT"):
    main()


def profile_compact():
    """Stage timings for the compact-extraction hot path."""
    from lidar_feature_extraction_tpu.ops.extraction import (
        extract_features_compact)

    cfg = kitti_hdl64()
    reg = cfg.registration
    rng = np.random.default_rng(0)
    maps, image = build_scene(cfg, rng)
    prior = Pose(q=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                 t=jnp.asarray([0.3, -0.2, 0.05], jnp.float32))

    def cmp_body(c):
        im, acc = c
        f = extract_features_compact(
            im, cfg.extraction, surface_leaf=reg.surface_downsample_leaf,
            edges_per_ring=cfg.extraction.edges_per_ring,
            surface_runs_per_ring=cfg.extraction.surface_runs_per_ring)
        return im._replace(xyz=image.xyz + 1e-9 * acc), \
            acc + f.curvature[0, 0] + f.edge_xyz[0, 0]

    timeit_fused("extract_features_compact", cmp_body,
                 (image, jnp.float32(0)))

    feats = jax.jit(lambda im: extract_features_compact(
        im, cfg.extraction, surface_leaf=reg.surface_downsample_leaf,
        edges_per_ring=cfg.extraction.edges_per_ring,
        surface_runs_per_ring=cfg.extraction.surface_runs_per_ring))(image)
    jax.block_until_ready(feats.edge_xyz)

    def reg_body(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        result = register_scan_geometry(
            maps, feats.edge_xyz, feats.edge_valid,
            feats.surface_xyz, feats.surface_valid, pr, cfg,
            pre_downsampled=True)
        return prior.t + 1e-6 * result.pose.t, acc + result.iterations

    out = timeit_fused("register (pre-downsampled, all iters)", reg_body,
                       (prior.t, jnp.asarray(0, jnp.int32)))
    print(f"  ({float(out[1]) / N:.1f} GN iters/scan)")

    def rows_body(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        eb, sb = gg.fused_rows_from_grids(
            maps.edge, maps.surface, maps.fused, feats.edge_xyz,
            feats.edge_valid, feats.surface_xyz, feats.surface_valid,
            pr, reg.min_fit_points)
        problem = gn.make_problem([eb, sb])
        step = gn.gn_iteration(problem, pr, reg.huber_k,
                               reg.degeneracy_threshold)
        return prior.t + 1e-6 * step.pose.t, acc + 1

    timeit_fused("  one GN iteration (fused rows+solve)", rows_body,
                 (prior.t, jnp.asarray(0, jnp.int32)))

    def gather_only(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        eb, sb = gg.fused_rows_from_grids(
            maps.edge, maps.surface, maps.fused, feats.edge_xyz,
            feats.edge_valid, feats.surface_xyz, feats.surface_valid,
            pr, reg.min_fit_points)
        return prior.t + 1e-9 * sb.residual[0, 0], acc + 1

    timeit_fused("    fused rows only", gather_only,
                 (prior.t, jnp.asarray(0, jnp.int32)))

    from lidar_feature_extraction_tpu.ops.extraction import (
        label_range_image as lri, curvature_kernel)

    def curv_body(c):
        im, acc = c
        r = jnp.where(im.mask, jnp.hypot(im.xyz[..., 0], im.xyz[..., 1]),
                      0.0)
        cv = curvature_kernel(r, im.count, cfg.extraction.padding)
        return im._replace(xyz=image.xyz + 1e-9 * acc), acc + cv[0, 0]

    timeit_fused("  curvature only", curv_body, (image, jnp.float32(0)))


if __name__ == "__main__" and os.environ.get("PROFILE_COMPACT"):
    profile_compact()
