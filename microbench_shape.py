"""Shape/size dependence of trivial elementwise fori_loop bodies."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

N = 100
rng = np.random.default_rng(0)

def timeit(shape):
    x = jnp.asarray(rng.uniform(5, 20, shape), jnp.float32)
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, N, lambda i, c: c * 1.0000001, c)
    out = prog(x); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = prog(x)
    jax.block_until_ready(out); dt = (time.perf_counter() - t0) / N
    mb = np.prod(shape) * 4 / 1e6
    print(f"{str(shape):24s} {mb:8.2f} MB {1e6*dt:9.1f} us/iter", flush=True)

timeit((64, 2304))
timeit((128, 2304))
timeit((192, 2304))
timeit((256, 2304))
timeit((512, 2304))
timeit((2, 64, 2304))
timeit((3, 64, 2304))
timeit((64, 2304, 3))
timeit((64, 6912))
timeit((4096, 3))
timeit((3, 4096))
timeit((4096, 128))
