"""What makes a trivial fori_loop iteration cost 275us on this chip?"""
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
    print(f"{name:40s} {1e6*dt:9.1f} us/iter", flush=True)

timeit("scalar-only carry", lambda a: a * 1.0000001 + 1e-9,
       jnp.float32(1))
timeit("big elementwise, no scalar slice", lambda y: y * 1.0000001,
       x)
timeit("big elementwise + scalar slice",
       lambda c: (x + 1e-9 * c[1], c[0][0, 0]),
       (x, jnp.float32(0)))
timeit("xyz-sized elementwise",
       lambda y: y * 1.0000001,
       jnp.stack([x, x, x], -1))
timeit("hypot over [R,P,3]",
       lambda c: (c[0] * 1.0000001,
                  jnp.hypot(c[0][..., 0], c[0][..., 1]).sum() * 1e-12
                  + c[1]),
       (jnp.stack([x, x, x], -1), jnp.float32(0)))
