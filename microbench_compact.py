"""Microbench: fixed-capacity stream compaction variants on TPU.

The extraction hot path needs `[131072] bool mask -> positions of the
first `capacity` True lanes` twice per scan (edges cap 2048, surfaces
cap 32768). Candidates:

  a. jnp.nonzero(size=cap)             (current)
  b. cumsum + scatter (unique dests)
  c. argsort of (~mask, index), take first cap
  d. dense-grid scatter-add downsample + nonzero over cells
"""

from __future__ import annotations

import os
import time

import numpy as np
import jax
import jax.numpy as jnp

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

N = 64 * 2048
REPS = 30


def timeit_fused(name, body, init, n=REPS):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)

    out = prog(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = prog(init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:48s} {1000 * dt:8.3f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)
    base_mask = jnp.asarray(rng.uniform(size=N) < 0.25)

    for cap in (2048, 32768):
        def nonzero_body(c, cap=cap):
            m, acc = c
            (sel,) = jnp.nonzero(m, size=cap, fill_value=N)
            valid = sel < N
            out = jnp.where(valid[:, None],
                            pts[jnp.minimum(sel, N - 1)], 0.0)
            return m ^ (acc[0, 0] > 1e30), out
        timeit_fused(f"nonzero cap={cap}", nonzero_body,
                     (base_mask, jnp.zeros((cap, 3))))

        def scatter_body(c, cap=cap):
            m, acc = c
            pos = jnp.cumsum(m.astype(jnp.int32)) - 1
            # Non-selected lanes target index `cap` against a cap-row
            # buffer: out of bounds, so mode="drop" actually drops them
            # (no colliding duplicate writes skewing the timing).
            dest = jnp.where(m & (pos < cap), pos, cap)
            out = jnp.zeros((cap, 3), jnp.float32)
            out = out.at[dest].set(pts, mode="drop")
            return m ^ (acc[0, 0] > 1e30), out
        timeit_fused(f"cumsum+scatter cap={cap}", scatter_body,
                     (base_mask, jnp.zeros((cap, 3))))

        def argsort_body(c, cap=cap):
            m, acc = c
            key = jnp.where(m, jnp.arange(N), N)
            order = jnp.argsort(key)[:cap]
            valid = key[order] < N
            out = jnp.where(valid[:, None], pts[order], 0.0)
            return m ^ (acc[0, 0] > 1e30), out
        timeit_fused(f"argsort-take cap={cap}", argsort_body,
                     (base_mask, jnp.zeros((cap, 3))))

    # dense voxel downsample path: scatter-add into 160x160x16 cells,
    # then one nonzero over the cells.
    dims = (160, 160, 16)
    cells = dims[0] * dims[1] * dims[2]
    cap = 32768
    cell_ids = jnp.asarray(rng.integers(0, cells, size=N), jnp.int32)

    def dense_body(c):
        m, acc = c
        cid = jnp.where(m, cell_ids, cells)
        sums = jnp.zeros((cells + 1, 3), jnp.float32)
        sums = sums.at[cid].add(jnp.where(m[:, None], pts, 0.0),
                                mode="drop")
        cnts = jnp.zeros(cells + 1, jnp.float32)
        cnts = cnts.at[cid].add(m.astype(jnp.float32), mode="drop")
        occupied = cnts[:cells] > 0
        (sel,) = jnp.nonzero(occupied, size=cap, fill_value=cells)
        valid = sel < cells
        sel_c = jnp.minimum(sel, cells - 1)
        out = sums[sel_c] / jnp.maximum(cnts[sel_c, None], 1.0)
        return m ^ (acc[0, 0] > 1e30), jnp.where(valid[:, None], out, 0.0)
    timeit_fused("dense scatter-add + nonzero(409k cells)", dense_body,
                 (base_mask, jnp.zeros((cap, 3))))

    def scatter_only(c):
        m, acc = c
        cid = jnp.where(m, cell_ids, cells)
        sums = jnp.zeros((cells + 1, 3), jnp.float32)
        sums = sums.at[cid].add(jnp.where(m[:, None], pts, 0.0),
                                mode="drop")
        return m ^ (acc[0, 0] > 1e30), sums[:cap]
    timeit_fused("  scatter-add only", scatter_only,
                 (base_mask, jnp.zeros((cap, 3))))

    def cumsum_only(c):
        m, acc = c
        pos = jnp.cumsum(m.astype(jnp.int32))
        return m ^ (acc[0] > 10**9), pos[:2048]
    timeit_fused("  cumsum(131k) only", cumsum_only,
                 (base_mask, jnp.zeros(2048, jnp.int32)))


if __name__ == "__main__":
    main()
