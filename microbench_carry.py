"""Which fori_loop carry/body pattern costs ~260us on axon?"""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

R, P = 64, 2304
N = 100
x = jnp.asarray(np.random.default_rng(0).uniform(5, 20, (R, P)), jnp.float32)

def timeit(name, body, init):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, N, lambda i, c: body(c), c)
    out = prog(init); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = prog(init)
    jax.block_until_ready(out); dt = (time.perf_counter() - t0) / N
    print(f"{name:52s} {1e6*dt:9.1f} us/iter", flush=True)

# 1. big + scalar carry, no interaction
timeit("tuple carry, independent",
       lambda c: (c[0] * 1.0000001, c[1] + 1.0),
       (x, jnp.float32(0)))
# 2. scalar -> big (broadcast into array)
timeit("scalar broadcast into big",
       lambda c: (c[0] + 1e-9 * c[1], c[1] + 1.0),
       (x, jnp.float32(0)))
# 3. big -> scalar via [0,0] slice
timeit("scalar slice from big",
       lambda c: (c[0] * 1.0000001, c[1] + c[0][0, 0] * 1e-12),
       (x, jnp.float32(0)))
# 4. big -> scalar via full reduction
timeit("scalar full-sum from big",
       lambda c: (c[0] * 1.0000001, c[1] + c[0].sum() * 1e-12),
       (x, jnp.float32(0)))
# 5. both directions
timeit("scalar slice + broadcast",
       lambda c: (c[0] + 1e-9 * c[1], c[1] + c[0][0, 0] * 1e-12),
       (x, jnp.float32(0)))
# 6. scalar kept as [1,1] array instead of 0-d
x11 = jnp.zeros((1, 1), jnp.float32)
timeit("[1,1]-array slice + broadcast",
       lambda c: (c[0] + 1e-9 * c[1], c[1] + c[0][:1, :1] * 1e-12),
       (x, x11))
# 7. [8,128]-array tile slice + broadcast
t8 = jnp.zeros((8, 128), jnp.float32)
timeit("[8,128]-tile slice + broadcast",
       lambda c: (c[0] + 1e-9 * c[1][0, 0], c[1] + c[0][:8, :128] * 1e-12),
       (x, t8))
