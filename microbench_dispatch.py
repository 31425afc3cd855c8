"""Is the slow-mode cost per-iteration or per-dispatch? us/iter vs N."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

R, P = 64, 2304
rng = np.random.default_rng(0)
aos = jnp.asarray(rng.uniform(5, 20, (R, P, 3)), jnp.float32)

def run(n):
    @jax.jit
    def prog(c):
        def body(i, c):
            a, acc = c
            return a * 1.0000001, acc + jnp.hypot(a[..., 0],
                                                  a[..., 1])[0, 0]
        return jax.lax.fori_loop(0, n, body, c)
    init = (aos, jnp.float32(0))
    out = prog(init); jax.block_until_ready(out)
    best = float("inf"); tot = []
    for _ in range(5):
        t0 = time.perf_counter(); out = prog(init)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        tot.append(dt)
        best = min(best, dt)
    print(f"N={n:5d}  total best={1e3*best:9.3f} ms  "
          f"per-iter={1e6*best/n:8.2f} us  all={[round(1e3*t,1) for t in tot]}",
          flush=True)

for n in [1, 10, 100, 1000]:
    run(n)
