"""Microbenchmark: formulations of the 27-voxel candidate gather.

The measured hot-path bottleneck is gathering [Q, 27] rows of [S, 3]
from the voxel table (~16 MB at ~5 GB/s effective through XLA's gather
lowering). Times each variant inside one fori_loop program (amortizes
the ~2 ms tunnel dispatch overhead).
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

Q = 4096
S = 8
C = 262144  # ~KITTI-sized dense grid cell count
N_IT = 50


def timeit_fused(name, body, init, n=N_IT):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, n, lambda i, c: body(c), c)

    out = prog(init)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = prog(init)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:52s} {1000 * dt:8.3f} ms/iter", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(C + 1, S, 3)), jnp.float32)
    table_flat = table.reshape(C + 1, S * 3)
    table_T = jnp.asarray(np.transpose(np.asarray(table_flat)))  # [24, C+1]
    cells_np = rng.integers(0, C - 2, size=(Q, 27)).astype(np.int32)
    cells = jnp.asarray(cells_np)
    # z-run starts: 9 runs of 3 consecutive cells each.
    runs = jnp.asarray(cells_np[:, ::3])  # [Q, 9] pretend run starts

    def v_current(c):
        cl, acc = c
        out = table[cl]                       # [Q, 27, S, 3]
        return cl, acc + out[0, 0, 0, 0]

    timeit_fused("rows [Q,27] from [C+1,S,3]", v_current,
                 (cells, jnp.float32(0)))

    def v_flatrow(c):
        cl, acc = c
        out = table_flat[cl]                  # [Q, 27, 24]
        return cl, acc + out[0, 0, 0]

    timeit_fused("rows [Q,27] from [C+1,24]", v_flatrow,
                 (cells, jnp.float32(0)))

    def v_flatrow_1d(c):
        cl, acc = c
        out = table_flat[cl.reshape(-1)]      # [Q*27, 24]
        return cl, acc + out[0, 0]

    timeit_fused("rows [Q*27] from [C+1,24]", v_flatrow_1d,
                 (cells, jnp.float32(0)))

    # Element gather, output-lane-major: idx [24, Q*27] into flat table
    flatT = table_T.reshape(-1)               # [24*(C+1)]
    lane_off = (jnp.arange(S * 3) * (C + 1))[:, None]  # [24, 1]

    def v_elem_T(c):
        cl, acc = c
        idx = lane_off + cl.reshape(-1)[None, :]        # [24, Q*27]
        out = flatT[idx]
        return cl, acc + out[0, 0]

    timeit_fused("elems [24, Q*27] from flat (SoA-T)", v_elem_T,
                 (cells, jnp.float32(0)))

    def v_elem(c):
        cl, acc = c
        idx = cl.reshape(-1)[:, None] * (S * 3) + jnp.arange(S * 3)[None, :]
        out = table_flat.reshape(-1)[idx]               # [Q*27, 24]
        return cl, acc + out[0, 0]

    timeit_fused("elems [Q*27, 24] from flat", v_elem,
                 (cells, jnp.float32(0)))

    def v_take(c):
        cl, acc = c
        out = jnp.take(table_flat, cl.reshape(-1), axis=0)
        return cl, acc + out[0, 0]

    timeit_fused("jnp.take rows [Q*27] axis0", v_take,
                 (cells, jnp.float32(0)))

    def v_take_T(c):
        cl, acc = c
        out = jnp.take(table_T, cl.reshape(-1), axis=1)  # [24, Q*27]
        return cl, acc + out[0, 0]

    timeit_fused("jnp.take cols [24, C+1] axis1", v_take_T,
                 (cells, jnp.float32(0)))

    def v_slice_runs(c):
        rs, acc = c
        def one(i):
            return jax.lax.dynamic_slice(table_flat, (i, 0), (3, S * 3))
        out = jax.vmap(jax.vmap(one))(rs)     # [Q, 9, 3, 24]
        return rs, acc + out[0, 0, 0, 0]

    timeit_fused("dynamic_slice z-runs [Q,9]x(3,24)", v_slice_runs,
                 (runs, jnp.float32(0)))

    # Reduced neighborhood: 8 nearest cells instead of 27.
    cells8 = jnp.asarray(cells_np[:, :8])

    def v_oct(c):
        cl, acc = c
        out = table_flat[cl]                  # [Q, 8, 24]
        return cl, acc + out[0, 0, 0]

    timeit_fused("rows [Q,8] from [C+1,24] (octant)", v_oct,
                 (cells8, jnp.float32(0)))


if __name__ == "__main__":
    main()
