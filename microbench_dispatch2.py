"""Robust timing: chain outputs into inputs so no execution can be
deduped/cached; verify values change."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

R, P = 64, 2304
rng = np.random.default_rng(0)
aos = jnp.asarray(rng.uniform(5, 20, (R, P, 3)), jnp.float32)

def run(n, reps=6):
    @jax.jit
    def prog(c):
        def body(i, c):
            a, acc = c
            return a * 1.0000001, acc + jnp.hypot(a[..., 0],
                                                  a[..., 1])[0, 0]
        return jax.lax.fori_loop(0, n, body, c)
    c = (aos, jnp.float32(0))
    c = prog(c); jax.block_until_ready(c)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        c = prog(c)                      # feeds back: unique inputs
        jax.block_until_ready(c)
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(f"N={n:5d}  best={1e3*best:9.3f} ms  per-iter="
          f"{1e6*best/n:8.2f} us  acc={float(c[1]):.3e}  "
          f"all={[round(1e3*t,2) for t in times]}", flush=True)

for n in [1, 10, 100, 1000]:
    run(n)
