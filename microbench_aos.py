"""Cost of component access patterns on [R,P,3] vs SoA planes."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

R, P = 64, 2304
N = 100
rng = np.random.default_rng(0)
aos = jnp.asarray(rng.uniform(5, 20, (R, P, 3)), jnp.float32)
x_p = jnp.asarray(np.asarray(aos)[..., 0])
y_p = jnp.asarray(np.asarray(aos)[..., 1])
pts = jnp.asarray(rng.uniform(-50, 50, (4096, 3)), jnp.float32)

def timeit(name, body, init):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, N, lambda i, c: body(c), c)
    out = prog(init); jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter(); out = prog(init)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / N)
    print(f"{name:48s} {1e6*dt:9.1f} us/iter", flush=True)

timeit("hypot(aos[...,0], aos[...,1])",
       lambda c: (c[0] * 1.0000001,
                  c[1] + jnp.hypot(c[0][..., 0], c[0][..., 1])[0, 0]),
       (aos, jnp.float32(0)))
timeit("hypot(x_plane, y_plane)",
       lambda c: (c[0] * 1.0000001, c[1] + jnp.hypot(c[0], y_p)[0, 0]),
       (x_p, jnp.float32(0)))
timeit("moveaxis(aos, -1, 0) then hypot",
       lambda c: (c[0] * 1.0000001,
                  c[1] + jnp.hypot(*jnp.moveaxis(c[0], -1, 0)[:2])[0, 0]),
       (aos, jnp.float32(0)))
timeit("sum over last axis (aos)",
       lambda c: (c[0] * 1.0000001, c[1] + jnp.sum(c[0], axis=-1)[0, 0]),
       (aos, jnp.float32(0)))
timeit("[4096,3] slice components",
       lambda c: (c[0] * 1.0000001,
                  c[1] + jnp.hypot(c[0][:, 0], c[0][:, 1])[0]),
       (pts, jnp.float32(0)))
timeit("[4096,3] cross with const",
       lambda c: (c[0] * 1.0000001,
                  c[1] + jnp.cross(c[0], jnp.asarray([1., 2., 3.]))[0, 0]),
       (pts, jnp.float32(0)))
# floor/int cell computation, AoS vs planes
timeit("cell_of on [4096,3] (floor+int32)",
       lambda c: (c[0] * 1.0000001,
                  c[1] + jnp.floor(c[0] / 1.0).astype(jnp.int32)[0, 0]
                  .astype(jnp.float32)),
       (pts, jnp.float32(0)))
# ravel: c0*s0+c1*s1+c2 from AoS int cells
def ravel_aos(c):
    p, acc = c
    cc = jnp.floor(p / 1.0).astype(jnp.int32)
    cell = (cc[:, 0] * 1024 + cc[:, 1]) * 32 + cc[:, 2]
    return p * 1.0000001, acc + cell[0].astype(jnp.float32)
timeit("ravel cells from [4096,3]", ravel_aos, (pts, jnp.float32(0)))
