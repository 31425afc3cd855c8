"""Microbenchmark: voxel_downsample stage costs on the real chip.

Findings so far: dense scan-local grids lose badly (scatter cost scales
with table size: 6.6 ms at 590k cells, 25 ms at 3.3M), so the sort
stays. This drills into the sort-based pipeline's stages.
Run: timeout 1800 python microbench_downsample.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.ops.downsample import voxel_downsample
from lidar_feature_extraction_tpu.ops.voxel_map import _pack_coords, _EMPTY

N = 32768
CAP = 4096
rng = np.random.default_rng(0)
xy = rng.uniform(-80, 80, size=(N, 2))
z = rng.uniform(-2, 6, size=(N, 1))
pts = jnp.asarray(np.concatenate([xy, z], -1), jnp.float32)
mask = jnp.asarray(rng.uniform(size=N) < 0.9)


def timeit(name, fn, iters=30):
    @jax.jit
    def prog(p):
        def body(i, carry):
            acc, p = carry
            out = fn(p)
            return acc + out, p + 1e-12
        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0), p))

    out = prog(pts)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = prog(pts)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {1000 * dt:8.3f} ms/iter", flush=True)


def keys_of(p):
    return jnp.where(mask, _pack_coords(p, 1.0, jnp.zeros(3)), _EMPTY)


timeit("full voxel_downsample",
       lambda p: voxel_downsample(p, mask, 1.0, CAP)[0][0, 0])

timeit("pack keys only", lambda p: keys_of(p).astype(jnp.float32)[0])

timeit("argsort(i32) only",
       lambda p: jnp.argsort(keys_of(p)).astype(jnp.float32)[0])

timeit("sort(i32) values only",
       lambda p: jnp.sort(keys_of(p)).astype(jnp.float32)[0])


def argsort_gather(p):
    k = keys_of(p)
    order = jnp.argsort(k)
    return p[order][0, 0] + k[order][0].astype(jnp.float32)


timeit("argsort + xyz gather", argsort_gather)


def multisort(p):
    k = keys_of(p)
    sk, sx, sy, sz = jax.lax.sort(
        (k, p[:, 0], p[:, 1], p[:, 2]), num_keys=1)
    return sx[0] + sk[0].astype(jnp.float32)


timeit("lax.sort 4-operand", multisort)


def seg_reduce(p):
    k = keys_of(p)
    order = jnp.argsort(k)
    skey = k[order]
    sxyz = p[order]
    valid = skey != _EMPTY
    first = jnp.concatenate([jnp.ones(1, bool), skey[1:] != skey[:-1]])
    first = first & valid
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg_c = jnp.minimum(jnp.where(valid & (seg >= 0), seg, CAP), CAP)
    sums = jnp.zeros((CAP + 1, 3), jnp.float32)
    sums = sums.at[seg_c].add(jnp.where(valid[:, None], sxyz, 0.0),
                              mode="drop")
    return sums[0, 0]


timeit("argsort+gather+scatter (full core)", seg_reduce)
