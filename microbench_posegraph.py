"""Pose-graph optimize cost at mapping scales (VERDICT r4: the stage
table's optimize row). Dense [6K,6K] solver at K where the pipeline
selects it, matrix-free CG at large K — chained-carry timing on the
chip (tunnel rules, BASELINE.md)."""
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import numpy as np
import jax
import jax.numpy as jnp

from lidar_feature_extraction_tpu.parallel.pose_graph import (
    Constraints, PoseGraph, optimize_pose_graph, optimize_pose_graph_cg)


def make_graph(k, n_loops, rng):
    ident = np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (k, 1))
    t = np.cumsum(rng.normal(scale=[1.0, 0.2, 0.02], size=(k, 3)),
                  axis=0).astype(np.float32)
    graph = PoseGraph(poses_q=jnp.asarray(ident), poses_t=jnp.asarray(t))
    i = list(range(k - 1))
    j = list(range(1, k))
    li = rng.integers(0, k // 2, size=n_loops)
    lj = li + k // 3
    i += li.tolist()
    j += lj.tolist()
    m = len(i)
    cons = Constraints(
        i=jnp.asarray(i, jnp.int32), j=jnp.asarray(j, jnp.int32),
        z_q=jnp.asarray(np.tile([1.0, 0, 0, 0], (m, 1)), jnp.float32),
        z_t=jnp.asarray(rng.normal(scale=0.5, size=(m, 3)), jnp.float32),
        weight=jnp.ones(m, jnp.float32),
        info=jnp.asarray(np.tile(np.eye(6, dtype=np.float32),
                                 (m, 1, 1))))
    return graph, cons


def bench(fn, graph, cons, n_inner=20, n_reps=4):
    """ms per full optimize (10 GN iterations): ``n_inner`` optimizes
    amortized inside ONE dispatch with a carried data dependence
    (tunnel-honest timing, BASELINE.md), best of ``n_reps`` samples
    with host-fresh perturbations between samples."""

    def loop(t0_arr, cons):
        def body(i, carry):
            t_cur, acc = carry
            g = PoseGraph(poses_q=graph.poses_q,
                          poses_t=t_cur + 1e-5 * acc)
            out = fn(g, cons, n_iterations=10, robust_delta=0.5)
            return out.poses_t, acc + out.poses_t[0, 0]
        return jax.lax.fori_loop(
            0, n_inner, body, (t0_arr, jnp.float32(1.0)))

    run = jax.jit(loop)
    out = run(graph.poses_t, cons)
    jax.block_until_ready(out)
    dt = float("inf")
    rng = np.random.default_rng(1)
    for _ in range(n_reps):
        t0_arr = jnp.asarray(np.asarray(graph.poses_t)
                             + rng.normal(scale=0.01,
                                          size=graph.poses_t.shape)
                             .astype(np.float32))
        t0 = time.perf_counter()
        out = run(t0_arr, cons)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / n_inner)
    return dt


def main():
    rng = np.random.default_rng(0)
    rows = []
    for k, solver, fn in ((128, "dense", optimize_pose_graph),
                          (512, "cg", optimize_pose_graph_cg),
                          (2048, "cg", optimize_pose_graph_cg)):
        graph, cons = make_graph(k, max(k // 16, 4), rng)
        dt = bench(fn, graph, cons)
        rows.append({"K": k, "solver": solver,
                     "ms_per_optimize_10it": round(1000 * dt, 2)})
        print(json.dumps(rows[-1]), flush=True)
    with open("POSEGRAPH_BENCH.json", "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
