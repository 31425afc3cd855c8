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
    import jax
    import jax.numpy as jnp

    from lidar_feature_extraction_tpu.core.scan import RangeImage
    from lidar_feature_extraction_tpu.ops.extraction import extract_features
    from lidar_feature_extraction_tpu.pipeline.localization import (
        build_feature_maps, build_geometry_maps)

    ex = cfg.extraction
    R, P = ex.n_rings, ex.max_points_per_ring

    # Scan: piecewise range bands with discontinuities (foreground
    # objects in front of walls) so the extractor finds KITTI-realistic
    # edge counts, plus smooth arcs for surfaces.
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

    # Map: the feature map a mapping pass over this scene would have
    # produced — extracted features of the scan, transformed to several
    # nearby keyframe poses with sensor noise. The scan therefore
    # genuinely matches the map (the Gauss-Newton optimum is the true
    # pose, ~identity), so prior error is meaningful: the best-case
    # variant converges in a couple of iterations and the
    # realistic-prior variant has to work its way back. (Before r3 the
    # map was an unrelated synthetic world; registration cost per
    # iteration was measured correctly but iteration counts were not
    # interpretable.)
    feats = jax.jit(lambda im: extract_features(im, ex))(image)
    e = np.asarray(feats.edge_xyz)[np.asarray(feats.edge_valid)]
    s = np.asarray(feats.surface_xyz)[np.asarray(feats.surface_valid)]
    edge_pts, surf_pts = [], []
    for k in range(7):
        yaw = 0.0 if k == 0 else rng.uniform(-0.02, 0.02)
        off = np.zeros(3) if k == 0 else rng.uniform(-2.0, 2.0, size=3) \
            * np.array([1.0, 1.0, 0.05])
        rot = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                        [np.sin(yaw), np.cos(yaw), 0],
                        [0, 0, 1.0]])
        edge_pts.append(e @ rot.T + off
                        + rng.normal(scale=0.01, size=e.shape))
        surf_pts.append(s @ rot.T + off
                        + rng.normal(scale=0.01, size=s.shape))
    edge_pts = np.concatenate(edge_pts)
    surf_pts = np.concatenate(surf_pts)

    build = (build_feature_maps
             if os.environ.get("BENCH_MODE") == "points"
             else build_geometry_maps)
    maps = build(
        jnp.asarray(edge_pts, jnp.float32),
        jnp.ones(len(edge_pts), bool),
        jnp.asarray(surf_pts, jnp.float32),
        jnp.ones(len(surf_pts), bool), cfg)
    return maps, image


def main():
    import jax
    import jax.numpy as jnp

    from lidar_feature_extraction_tpu.config import kitti_hdl64
    from lidar_feature_extraction_tpu.core import quaternion as quat
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

    def make_loop(prior_noise_t: float, prior_noise_yaw: float):
        """prior_noise_*: per-scan prior error injected on top of the
        chained pose. (0, 0) is the best case (converged EKF prior);
        (0.2 m, 1 deg) models a realistic inter-scan prior error — the
        reference budgets 40 GN iterations for exactly that
        (localization/app/localization.cpp:54)."""

        def bench_loop(maps, image, prior):
            def body(i, carry):
                total_iters, t = carry
                im = image._replace(
                    xyz=image.xyz + 1e-3 * t[None, None, :])
                pr = Pose(q=prior.q, t=prior.t + 1e-3 * t)
                if prior_noise_t > 0.0 or prior_noise_yaw > 0.0:
                    key = jax.random.fold_in(jax.random.PRNGKey(7), i)
                    kt, ky = jax.random.split(key)
                    dt_dir = jax.random.normal(kt, (3,))
                    dt_dir = dt_dir / jnp.maximum(
                        jnp.linalg.norm(dt_dir), 1e-9)
                    yaw = prior_noise_yaw * jax.random.normal(ky, ())
                    dq = quat.exp_so3(jnp.stack(
                        [jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw]))
                    pr = Pose(q=quat.quat_multiply(pr.q, dq),
                              t=pr.t + prior_noise_t * dt_dir)
                result, _feats = localize_scan(maps, im, pr, cfg)
                return total_iters + result.iterations, result.pose.t
            return jax.lax.fori_loop(
                0, n_iters, body, (jnp.asarray(0, jnp.int32), prior.t))

        return jax.jit(bench_loop)

    def measure(step):
        # Best-of-5: the tunnel adds a flat ~25 ms round trip per UNIQUE
        # dispatch and serves repeated identical (program, args) calls
        # from a cache — so each sample must chain the previous output
        # into its input (a real execution every time), and n_iters is
        # high enough (default 200) that the round trip is <3% of the
        # total.
        out = step(maps, image, prior)   # warmup / compile
        jax.block_until_ready(out)
        dt = float("inf")
        pr = prior
        for _ in range(5):
            t0 = time.perf_counter()
            out = step(maps, image, pr)
            jax.block_until_ready(out)
            dt = min(dt, time.perf_counter() - t0)
            pr = Pose(q=prior.q, t=prior.t + 1e-9 * out[1])
        return n_iters / dt, float(out[0]) / n_iters, 1000 * dt / n_iters

    scans_per_sec, gn_iters, ms = measure(make_loop(0.0, 0.0))
    print(f"note: {gn_iters:.1f} GN iterations/scan, "
          f"{ms:.2f} ms/scan (best-case converged prior)",
          file=sys.stderr)

    # Realistic-prior variant: ~0.2 m + ~1 deg prior error per scan
    # (VERDICT r2 item 3). Reported alongside the headline; the
    # headline keeps the best-case number for cross-round continuity.
    real_sps, real_iters, real_ms = measure(
        make_loop(0.2, np.radians(1.0)))
    print(json.dumps({
        "metric": "realistic_prior_scans_per_sec_single_chip",
        "value": round(real_sps, 3),
        "unit": "scans/s",
        "gn_iterations_per_scan": round(real_iters, 2),
        "ms_per_scan": round(real_ms, 3),
    }), file=sys.stderr)

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
