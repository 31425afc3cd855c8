"""Does live device memory slow every dispatch on the axon tunnel?"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

N = 100
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(5, 20, (64, 2304)), jnp.float32)

@jax.jit
def prog(c):
    return jax.lax.fori_loop(0, N, lambda i, c: c * 1.0000001, c)

def measure(tag):
    out = prog(x); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); out = prog(x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / N)
    print(f"{tag:44s} {1e6*best:9.1f} us/iter", flush=True)

measure("baseline (x only live)")
hold = jnp.asarray(rng.uniform(size=(800_000, 8)), jnp.float32)  # 25MB
jax.block_until_ready(hold)
measure("with 25MB live buffer")
hold2 = jnp.asarray(rng.uniform(size=(800_000, 8)), jnp.float32)
jax.block_until_ready(hold2)
measure("with 50MB live buffers")
del hold, hold2
measure("after del")
