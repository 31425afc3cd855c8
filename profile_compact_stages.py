"""Device-time for the internals of extract_features_compact, best-of-3,
each stage fused into a carried-dependence fori_loop."""
import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")
import numpy as np, jax, jax.numpy as jnp

from bench import build_scene
from lidar_feature_extraction_tpu.config import kitti_hdl64
from lidar_feature_extraction_tpu.ops import extraction as ex

N = int(os.environ.get("PROFILE_N", "150"))
cfg = kitti_hdl64()
rng = np.random.default_rng(0)
_, image = build_scene(cfg, rng)
exc = cfg.extraction
R, P = exc.n_rings, exc.max_points_per_ring
ce, cs = exc.edges_per_ring, exc.surface_runs_per_ring
leaf = cfg.registration.surface_downsample_leaf


def timeit(name, body, init):
    @jax.jit
    def prog(c):
        return jax.lax.fori_loop(0, N, lambda i, c: body(c), c)
    out = prog(init); jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(3):
        # Chain: the tunnel dedupes repeated identical dispatches.
        t0 = time.perf_counter(); out = prog(out)
        jax.block_until_ready(out)
        dt = min(dt, (time.perf_counter() - t0) / N)
    print(f"{name:44s} {1e3*dt:8.3f} ms/iter", flush=True)
    return out


def full(c):
    im, acc = c
    f = ex.extract_features_compact(im, exc, surface_leaf=leaf,
                                    edges_per_ring=ce,
                                    surface_runs_per_ring=cs)
    return im._replace(xyz=image.xyz + 1e-9 * acc), \
        acc + f.edge_xyz[0, 0] + f.surface_xyz[0, 0]

timeit("extract_features_compact (full)", full, (image, jnp.float32(0)))


def label_only(c):
    im, acc = c
    labels, curv = ex.label_range_image(im, exc)
    return im._replace(xyz=image.xyz + 1e-9 * acc), \
        acc + curv[0, 0] + labels[0, 0]

timeit("  label_range_image", label_only, (image, jnp.float32(0)))

labels, curv = jax.jit(lambda im: ex.label_range_image(im, exc))(image)
jax.block_until_ready(labels)
edge_mask = np.asarray((labels == ex.EDGE) & image.mask)
surf_mask_np = np.asarray((labels == ex.SURFACE) & image.mask)
print(f"  ({edge_mask.sum()} edges, {surf_mask_np.sum()} surface pts)",
      flush=True)
em = jnp.asarray(edge_mask)
sm = jnp.asarray(surf_mask_np)
xyz = image.xyz
dtype = xyz.dtype


def run_sums(c):
    sm_, acc = c
    key = ex._voxel_run_key(xyz + 1e-9 * acc, leaf)
    cs_xyz = jnp.cumsum(jnp.where(sm_[..., None], xyz, 0.0), axis=1)
    cs_cnt = jnp.cumsum(sm_.astype(dtype), axis=1)
    csum4 = jnp.concatenate([cs_xyz, cs_cnt[..., None]], axis=-1)
    prv_surf = jnp.concatenate([jnp.zeros((R, 1), bool), sm_[:, :-1]],
                               axis=-1)
    prv_key = jnp.roll(key, 1, axis=-1)
    run_start = sm_ & (~prv_surf | (prv_key != key))
    own4 = jnp.concatenate(
        [jnp.where(sm_[..., None], xyz, 0.0),
         sm_.astype(dtype)[..., None]], axis=-1)
    base = ex._propagate_from_flag(run_start, csum4 - own4, axis=1)
    return sm_, acc + (csum4 - base)[0, 0, 0] * 1e-12

timeit("  surface run sums (cumsum+assoc_scan)", run_sums,
       (sm, jnp.float32(0)))


def onehot_mm(c):
    colv, acc = c
    onehot = (colv[..., None]
              == jnp.arange(ce + cs)[None, None, :]).astype(dtype)
    feat = jnp.concatenate([xyz + 1e-9 * acc,
                            jnp.ones((R, P, 1), dtype)], axis=-1)
    out = jnp.einsum("rpc,rpf->rcf", onehot, feat,
                     preferred_element_type=dtype)
    return colv, acc + out[0, 0, 0] * 1e-12

col0 = jnp.where(em, 0, ce + cs)
timeit("  one-hot einsum [R,P,96]x[R,P,4]", onehot_mm,
       (col0, jnp.float32(0)))


def onehot_mm_dotgen(c):
    colv, acc = c
    onehot = (colv[..., None]
              == jnp.arange(ce + cs)[None, None, :]).astype(jnp.bfloat16)
    feat = jnp.concatenate([xyz + 1e-9 * acc,
                            jnp.ones((R, P, 1), dtype)], axis=-1)
    out = jnp.einsum("rpc,rpf->rcf", onehot.astype(dtype), feat,
                     preferred_element_type=dtype)
    return colv, acc + out[0, 0, 0] * 1e-12

timeit("  one-hot einsum (bf16 onehot->f32)", onehot_mm_dotgen,
       (col0, jnp.float32(0)))


# --- registration side (run after the extraction stages above) --------
def registration_stages():
    from lidar_feature_extraction_tpu.core.pose import Pose
    from lidar_feature_extraction_tpu.ops import gauss_newton as gn
    from lidar_feature_extraction_tpu.ops import geometry_grid as gg
    from bench import build_scene as _bs
    from lidar_feature_extraction_tpu.pipeline.localization import (
        register_scan_geometry, localize_scan)

    maps, _ = _bs(cfg, np.random.default_rng(0))
    reg = cfg.registration
    prior = Pose(q=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
                 t=jnp.asarray([0.3, -0.2, 0.05], jnp.float32))
    feats = jax.jit(lambda im: ex.extract_features_compact(
        im, exc, surface_leaf=leaf, edges_per_ring=ce,
        surface_runs_per_ring=cs))(image)
    jax.block_until_ready(feats.edge_xyz)

    def full(c):
        im, t = c
        im2 = im._replace(xyz=image.xyz + 1e-3 * t[None, None, :])
        pr = Pose(q=prior.q, t=prior.t + 1e-3 * t)
        result, _f = localize_scan(maps, im2, pr, cfg)
        return im2, result.pose.t

    timeit("FULL localize_scan (compact)", full, (image, prior.t))

    def reg_body(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        result = register_scan_geometry(
            maps, feats.edge_xyz, feats.edge_valid,
            feats.surface_xyz, feats.surface_valid, pr, cfg,
            pre_downsampled=True)
        return prior.t + 1e-6 * result.pose.t, acc + result.iterations

    out = timeit("register (all iters)", reg_body,
                 (prior.t, jnp.asarray(0, jnp.int32)))
    print(f"  ({float(out[1]) / N:.1f} GN iters/scan)", flush=True)

    def one_iter(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        eb, sb = gg.fused_rows_from_grids(
            maps.edge, maps.surface, maps.fused, feats.edge_xyz,
            feats.edge_valid, feats.surface_xyz, feats.surface_valid,
            pr, reg.min_fit_points)
        problem = gn.make_problem([eb, sb])
        step = gn.gn_iteration(problem, pr, reg.huber_k,
                               reg.degeneracy_threshold)
        return prior.t + 1e-6 * step.pose.t, acc + 1

    timeit("  one GN iteration (rows+solve)", one_iter,
           (prior.t, jnp.asarray(0, jnp.int32)))

    def rows_only(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        eb, sb = gg.fused_rows_from_grids(
            maps.edge, maps.surface, maps.fused, feats.edge_xyz,
            feats.edge_valid, feats.surface_xyz, feats.surface_valid,
            pr, reg.min_fit_points)
        return prior.t + 1e-9 * sb.residual[0, 0] + 1e-9 * eb.residual[
            0, 0], acc + 1

    timeit("    fused rows only", rows_only,
           (prior.t, jnp.asarray(0, jnp.int32)))

    def gather_only(c):
        pr_t, acc = c
        pr = Pose(q=prior.q, t=pr_t)
        pe = pr.apply(feats.edge_xyz)
        ps = pr.apply(feats.surface_xyz)
        cells_e = gg._ravel(gg._cell_of(pe, maps.edge.voxel_size,
                                        maps.edge.origin), maps.edge.dims)
        cells_s = gg._ravel(gg._cell_of(ps, maps.surface.voxel_size,
                                        maps.surface.origin),
                            maps.surface.dims)
        idx = jnp.concatenate([jnp.minimum(cells_e, maps.edge.capacity),
                               maps.edge.capacity + jnp.minimum(
                                   cells_s, maps.surface.capacity)])
        rec = maps.fused[idx]
        return prior.t + 1e-9 * rec[0, 0], acc + 1

    timeit("      transform+cells+gather only", gather_only,
           (prior.t, jnp.asarray(0, jnp.int32)))


if os.environ.get("PROFILE_REG"):
    registration_stages()
