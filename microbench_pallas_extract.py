"""Compile + time the fused Pallas extraction kernel on the TPU vs the
XLA plane path (chained dispatches, N-iteration fori_loop)."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

from bench import build_scene
from lidar_feature_extraction_tpu.config import kitti_hdl64
from lidar_feature_extraction_tpu.ops import extraction as ex
from lidar_feature_extraction_tpu.ops.extraction_pallas import (
    label_and_columns_pallas)

N = int(os.environ.get("PROFILE_N", "150"))
cfg = kitti_hdl64()
exc = cfg.extraction
rng = np.random.default_rng(0)
_, image = build_scene(cfg, rng)
leaf = cfg.registration.surface_downsample_leaf
ce, cs = exc.edges_per_ring, exc.surface_runs_per_ring
x = image.xyz[..., 0]
y = image.xyz[..., 1]
z = image.xyz[..., 2]


def timeit(name, body, init):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, N, lambda i, c: body(c), c)
    out = prog(init); jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); out = prog(out)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / N)
    print(f"{name:44s} {1e3*dt:8.3f} ms/iter", flush=True)
    return out


# Correctness on real hardware first (single dispatch).
labels, curv = jax.jit(
    lambda im: ex.label_range_image(im, exc))(image)
key = ex._voxel_run_key(image.xyz, leaf)
col, _, _, _ = jax.jit(
    lambda l, m, k: ex.compact_columns(l, m, k, ce, cs))(
        labels, image.mask, key)
for group in [8, 16, 32]:
    pl_labels, pl_curv, pl_col = label_and_columns_pallas(
        x, y, z, image.count, exc, leaf, ce, cs, ring_group=group)
    ok_l = bool((pl_labels == labels).all())
    ok_c = bool(jnp.allclose(pl_curv, curv, rtol=1e-5, atol=1e-4))
    ok_o = bool((pl_col == col).all())
    print(f"group={group}: labels={ok_l} curv={ok_c} col={ok_o}",
          flush=True)

def xla_body(c):
    xx, acc = c
    lab, cv = ex.label_planes(xx, y, image.mask, image.count, exc)
    k = ex._voxel_run_key_planes(xx, y, z, leaf)
    cl, _, _, _ = ex.compact_columns(lab, image.mask, k, ce, cs)
    return x + 1e-9 * acc, acc + cv[0, 0] + cl[0, 0]

timeit("XLA label+columns", xla_body, (x, jnp.float32(0)))

for group in [8, 16, 32]:
    def pl_body(c, group=group):
        xx, acc = c
        lab, cv, cl = label_and_columns_pallas(
            xx, y, z, image.count, exc, leaf, ce, cs, ring_group=group)
        return x + 1e-9 * acc, acc + cv[0, 0] + cl[0, 0].astype(
            jnp.float32)
    timeit(f"Pallas kernel (group={group})", pl_body,
           (x, jnp.float32(0)))
