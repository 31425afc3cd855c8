"""Headline benchmark: end-to-end extract+register scans/s on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/s", "vs_baseline": N}

The workload is the SURVEY.md §3.1 hot path on a KITTI-HDL64-sized
synthetic scene: 64x2048 range image -> feature extraction -> 40-iter
cap Gauss-Newton scan-to-map registration against a ~200k-point voxel
map. The baseline divisor is the single-core C++ reference-equivalent
pipeline measured by native/baseline_bench (see BASELINE.md); until that
number is recorded in baseline_measured.json a conservative estimate is
used and flagged in stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

# Persistent compilation cache: the axon remote-compile path takes
# minutes for the fused registration graph; cache it across runs.
# (Safe single-process; two processes must never share the one chip.)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def build_scene(cfg, rng):
    import jax.numpy as jnp

    from lidar_feature_extraction_tpu.core.scan import RangeImage
    from lidar_feature_extraction_tpu.pipeline.localization import (
        build_feature_maps, build_geometry_maps)

    ex = cfg.extraction
    R, P = ex.n_rings, ex.max_points_per_ring

    # Map: urban-canyon-like world — vertical pole lines (edges) and
    # ground/wall planes (surfaces).
    n_lines = 60
    line_xy = rng.uniform(-60, 60, size=(n_lines, 2))
    zs = np.linspace(-2, 6, 40)
    edge_pts = np.concatenate([
        np.repeat(line_xy, len(zs), axis=0),
        np.tile(zs, n_lines)[:, None]], axis=-1)
    edge_pts += rng.normal(scale=0.02, size=edge_pts.shape)

    g = rng.uniform(-80, 80, size=(150_000, 2))
    ground = np.concatenate([g, rng.normal(scale=0.03,
                                           size=(len(g), 1))], axis=-1)
    wall_y = rng.uniform(-80, 80, size=(30_000,))
    wall_z = rng.uniform(0, 8, size=(30_000,))
    walls = np.stack([np.full_like(wall_y, 25.0) +
                      rng.normal(scale=0.03, size=len(wall_y)),
                      wall_y, wall_z], axis=-1)
    surf_pts = np.concatenate([ground, walls])

    build = (build_feature_maps
             if os.environ.get("BENCH_MODE") == "points"
             else build_geometry_maps)
    maps = build(
        jnp.asarray(edge_pts, jnp.float32),
        jnp.ones(len(edge_pts), bool),
        jnp.asarray(surf_pts, jnp.float32),
        jnp.ones(len(surf_pts), bool), cfg)

    # Scan from a slightly offset pose: piecewise range bands with
    # discontinuities (foreground objects in front of walls) so the
    # extractor finds KITTI-realistic edge counts, plus smooth arcs for
    # surfaces.
    az = np.sort(rng.uniform(-np.pi, np.pi, size=(R, P)), axis=-1)
    elev = np.radians(np.linspace(2.0, -24.8, R))[:, None]
    n_seg = 48
    seg_base = rng.uniform(8.0, 20.0, size=(R, n_seg))
    seg_of = np.minimum((az + np.pi) / (2 * np.pi) * n_seg,
                        n_seg - 1).astype(int)
    rr = np.take_along_axis(seg_base, seg_of, axis=1) \
        + 0.5 * np.sin(7 * az) + rng.normal(scale=0.01, size=(R, P))
    xy = rr * np.cos(elev)
    xyz = np.stack([xy * np.cos(az), xy * np.sin(az),
                    rr * np.sin(elev)], axis=-1)
    image = RangeImage(
        xyz=jnp.asarray(xyz, jnp.float32),
        mask=jnp.ones((R, P), bool),
        count=jnp.full((R,), P, jnp.int32))
    return maps, image


def main():
    import jax
    import jax.numpy as jnp

    from lidar_feature_extraction_tpu.config import kitti_hdl64
    from lidar_feature_extraction_tpu.core.pose import Pose
    from lidar_feature_extraction_tpu.pipeline.localization import (
        localize_scan)

    cfg = kitti_hdl64()
    rng = np.random.default_rng(0)
    maps, image = build_scene(cfg, rng)
    prior = Pose(q=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                 t=jnp.asarray([0.3, -0.2, 0.05], jnp.float32))

    # Device-resident benchmark: N scans in ONE dispatch (fori_loop over
    # the fused localize_scan), one readback at the end. This tunnel's
    # device->host readbacks can stall for seconds, and a production TPU
    # pipeline streams scans without per-scan host sync anyway.
    #
    # Each iteration DEPENDS on the previous result (the scan is shifted
    # by the last estimated translation and the prior chains from it,
    # like a real sequential replay) — otherwise XLA hoists the entire
    # loop-invariant pipeline out of the fori_loop and the benchmark
    # measures nothing.
    n_iters = int(os.environ.get("BENCH_ITERS", "200"))

    def bench_loop(maps, image, prior):
        def body(i, carry):
            total_iters, t = carry
            im = image._replace(xyz=image.xyz + 1e-3 * t[None, None, :])
            pr = Pose(q=prior.q, t=prior.t + 1e-3 * t)
            result, _feats = localize_scan(maps, im, pr, cfg)
            return total_iters + result.iterations, result.pose.t
        return jax.lax.fori_loop(
            0, n_iters, body, (jnp.asarray(0, jnp.int32), prior.t))

    step = jax.jit(bench_loop)

    # Warmup / compile.
    out = step(maps, image, prior)
    jax.block_until_ready(out)

    # Best-of-5: the tunnel adds a flat ~25 ms round trip per UNIQUE
    # dispatch and serves repeated identical (program, args) calls from
    # a cache — so each sample must chain the previous output into its
    # input (a real execution every time), and n_iters is high enough
    # (default 200) that the round trip is <3% of the total.
    dt = float("inf")
    pr = prior
    for _ in range(5):
        t0 = time.perf_counter()
        out = step(maps, image, pr)
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
        pr = Pose(q=prior.q, t=prior.t + 1e-9 * out[1])
    scans_per_sec = n_iters / dt
    print(f"note: {float(out[0]) / n_iters:.1f} GN iterations/scan, "
          f"{1000 * dt / n_iters:.2f} ms/scan", file=sys.stderr)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "baseline_measured.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["cpp_single_core_scans_per_sec"]
    else:
        baseline = 10.0  # conservative estimate, see BASELINE.md
        print("warning: using estimated baseline 10 scans/s "
              "(native/baseline_bench not yet measured)", file=sys.stderr)

    print(json.dumps({
        "metric": "extract_register_scans_per_sec_single_chip",
        "value": round(scans_per_sec, 3),
        "unit": "scans/s",
        "vs_baseline": round(scans_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
