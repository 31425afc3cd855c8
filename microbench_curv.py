"""Isolate the cost of curvature_kernel vs the profile-loop carrier,
and compare roll vs pad-slice vs cumsum formulations on TPU."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

R, P, pad = 64, 2304, 2
N = 100
x = jnp.asarray(np.random.default_rng(0).uniform(5, 20, (R, P)), jnp.float32)
cnt = jnp.full((R,), P, jnp.int32)

def timeit(name, body):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, N, lambda i, c: body(c), c)
    out = prog((x, jnp.float32(0))); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = prog((x, jnp.float32(0)))
    jax.block_until_ready(out); dt = (time.perf_counter() - t0) / N
    print(f"{name:32s} {1e6*dt:9.1f} us/iter", flush=True)

def carrier(c):
    r, acc = c
    return x + 1e-9 * acc, acc + r[0, 0]

timeit("carrier only", carrier)

def curv_roll(c):
    r, acc = c
    a = -2.0 * pad * r
    for k in range(1, pad + 1):
        a = a + jnp.roll(r, k, axis=-1) + jnp.roll(r, -k, axis=-1)
    idx = jnp.arange(P)
    interior = (idx >= pad) & (idx < cnt[:, None] - pad)
    cv = jnp.where(interior, a * a, 0.0)
    return x + 1e-9 * acc, acc + cv[0, 0]

timeit("curvature (roll)", curv_roll)

def shift(r, k):
    if k > 0:
        return jnp.pad(r, ((0, 0), (k, 0)))[:, :P]
    return jnp.pad(r, ((0, 0), (0, -k)))[:, -k:]

def curv_pad(c):
    r, acc = c
    a = -2.0 * pad * r
    for k in range(1, pad + 1):
        a = a + shift(r, k) + shift(r, -k)
    idx = jnp.arange(P)
    interior = (idx >= pad) & (idx < cnt[:, None] - pad)
    cv = jnp.where(interior, a * a, 0.0)
    return x + 1e-9 * acc, acc + cv[0, 0]

timeit("curvature (pad+slice)", curv_pad)

def curv_cumsum(c):
    r, acc = c
    cs = jnp.cumsum(r, axis=-1)
    hi = shift(cs, -pad)
    lo = shift(cs, pad + 1)
    a = hi - lo - (2 * pad + 1.0) * r
    idx = jnp.arange(P)
    interior = (idx >= pad) & (idx < cnt[:, None] - pad)
    cv = jnp.where(interior, a * a, 0.0)
    return x + 1e-9 * acc, acc + cv[0, 0]

timeit("curvature (cumsum)", curv_cumsum)

def curv_transpose(c):
    r, acc = c
    rt = r.T  # [P, R]: shifts along sublanes
    a = -2.0 * pad * rt
    for k in range(1, pad + 1):
        a = a + jnp.pad(rt, ((k, 0), (0, 0)))[:P] \
              + jnp.pad(rt, ((0, k), (0, 0)))[k:]
    a = a.T
    idx = jnp.arange(P)
    interior = (idx >= pad) & (idx < cnt[:, None] - pad)
    cv = jnp.where(interior, a * a, 0.0)
    return x + 1e-9 * acc, acc + cv[0, 0]

timeit("curvature (transpose)", curv_transpose)
