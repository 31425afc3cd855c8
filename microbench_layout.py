"""AoS [.., 3] vs SoA [3, ..] point layout cost on this TPU."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

R, P = 64, 2304
N = 100
rng = np.random.default_rng(0)
aos = jnp.asarray(rng.uniform(5, 20, (R, P, 3)), jnp.float32)
soa = jnp.asarray(np.moveaxis(np.asarray(aos), -1, 0))   # [3, R, P]
pts_aos = jnp.asarray(rng.uniform(-50, 50, (4096, 3)), jnp.float32)
pts_soa = jnp.asarray(np.asarray(pts_aos).T)             # [3, 4096]
q = jnp.asarray([0.9999, 0.01, 0.01, 0.0], jnp.float32)

def timeit(name, body, init):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, N, lambda i, c: body(c), c)
    out = prog(init); jax.block_until_ready(out)
    t0 = time.perf_counter(); out = prog(init)
    jax.block_until_ready(out); dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {1e6*dt:9.1f} us/iter", flush=True)

timeit("elementwise [R,P,3] (AoS)", lambda y: y * 1.0000001, aos)
timeit("elementwise [3,R,P] (SoA)", lambda y: y * 1.0000001, soa)
timeit("hypot from AoS",
       lambda c: (c[0] * 1.0000001,
                  jnp.hypot(c[0][..., 0], c[0][..., 1]).sum() * 1e-12 + c[1]),
       (aos, jnp.float32(0)))
timeit("hypot from SoA",
       lambda c: (c[0] * 1.0000001,
                  jnp.hypot(c[0][0], c[0][1]).sum() * 1e-12 + c[1]),
       (soa, jnp.float32(0)))

def rot_aos(c):
    p, acc = c
    w, xyz = q[0], q[1:]
    t = 2 * jnp.cross(jnp.broadcast_to(xyz, p.shape), p)
    out = p + w * t + jnp.cross(jnp.broadcast_to(xyz, p.shape), t)
    return p * 1.0000001, acc + out[0, 0]

timeit("quat rotate [4096,3] (AoS)", rot_aos, (pts_aos, jnp.float32(0)))

def cross_soa(a, b):
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]])

def rot_soa(c):
    p, acc = c
    w, v = q[0], q[1:, None]
    vb = jnp.broadcast_to(v, p.shape)
    t = 2 * cross_soa(vb, p)
    out = p + w * t + cross_soa(vb, t)
    return p * 1.0000001, acc + out[0, 0]

timeit("quat rotate [3,4096] (SoA)", rot_soa, (pts_soa, jnp.float32(0)))

# gather of records [C,8] by 6k indices — the GN inner-iteration op
table = jnp.asarray(rng.uniform(size=(800_000, 8)), jnp.float32)
idx = jnp.asarray(rng.integers(0, 800_000, 6144), jnp.int32)

def gather8(c):
    i, acc = c
    rec = table[i]
    return i, acc + rec.sum() * 1e-12

timeit("gather [6144, 8] from 800k x 8", gather8, (idx, jnp.float32(0)))

tableT = jnp.asarray(np.asarray(table).T)  # [8, C]
def gather8T(c):
    i, acc = c
    rec = tableT[:, i]
    return i, acc + rec.sum() * 1e-12

timeit("gather [8, 6144] from 8 x 800k", gather8T, (idx, jnp.float32(0)))
