"""Coherence sort-key A/B for BOUNCE traces on the terrain scene.

The cluster kernel's MT work is proportional to the SUM of per-tile
visit counts after the per-lane cull, so sort keys can be ranked by
cull statistics alone — no kernel runs.  Variants:

  cur      octant(3b) << 21 | morton7(origin 21b)     [shipped key]
  morton   morton7(origin) only
  scent    entry-supercluster id (argmin near over hit SCs) << 24
           | octant << 21 | coarse origin morton
  scoct    entry-supercluster id << 3 | octant (no origin bits)
  scfar    entry SC | exit SC (first+last supercluster on the ray)

Usage: python benchmarks/sim_sortkey.py [grid]
"""

import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def _sc_boxes(pc, cm, cx):
    C = cm.shape[0]
    G = pc._SC_GROUP
    S = -(-C // G)
    pad = S * G - C
    cmin = jnp.pad(cm, ((0, pad), (0, 0)), constant_values=pc._INF)
    cmax = jnp.pad(cx, ((0, pad), (0, 0)), constant_values=-pc._INF)
    return (cmin.reshape(S, G, 3).min(axis=1),
            cmax.reshape(S, G, 3).max(axis=1), S)


def _entry_exit_sc(sc_min, sc_max, rays, want_mid=False, want_count=False):
    """Per-ray (first, last[, mid][, live-count]) supercluster on the ray
    (by slab near) — componentwise to avoid the 3->128 lane pad."""
    o, d = rays.origin, rays.direction
    safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv = 1.0 / safe
    near = None
    far = None
    for a in range(3):
        t0 = (sc_min[None, :, a] - o[:, a:a + 1]) * inv[:, a:a + 1]
        t1 = (sc_max[None, :, a] - o[:, a:a + 1]) * inv[:, a:a + 1]
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        near = lo if near is None else jnp.maximum(near, lo)
        far = hi if far is None else jnp.minimum(far, hi)
    hit = (near <= far) & (far > 0.0)
    big = jnp.float32(3e38)
    near_h = jnp.where(hit, jnp.maximum(near, 0.0), big)
    first = jnp.argmin(near_h, axis=-1).astype(jnp.int32)
    last = jnp.argmax(jnp.where(hit, jnp.maximum(near, 0.0), -1.0),
                      axis=-1).astype(jnp.int32)
    nohit = ~jnp.any(hit, axis=-1)
    out = [jnp.where(nohit, jnp.int32(1 << 15), first),
           jnp.where(nohit, jnp.int32(0), last)]
    if want_mid:
        # supercluster whose near is closest to the corridor midpoint
        n0 = jnp.min(near_h, axis=-1, keepdims=True)
        n1 = jnp.max(jnp.where(hit, jnp.maximum(near, 0.0), -1.0),
                     axis=-1, keepdims=True)
        midt = 0.5 * (n0 + n1)
        dist = jnp.where(hit, jnp.abs(jnp.maximum(near, 0.0) - midt), big)
        mid = jnp.argmin(dist, axis=-1).astype(jnp.int32)
        out.append(jnp.where(nohit, jnp.int32(0), mid))
    if want_count:
        out.append(jnp.sum(hit, axis=-1).astype(jnp.int32))
    return tuple(out)


def main():
    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.core import math as cm_
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si, _coherence_keys, _morton7
    from optix_renderer_tpu.core.types import Ray
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 708
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.PATH,
                 path_depth=4, bvh_cache_dir="/tmp/bvhcache-bench")
    ds, bvh = r.device_scene, r.bvh
    C = bvh.cluster_min.shape[0]
    W = H = 1024
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    # scene pytrees as jit ARGS, not closure constants: baked-constant
    # HLO exceeds the axon remote-compile request cap (HTTP 413)
    si, _ = jax.jit(lambda d, b, ry: trace_closest_si(d, b, ry))(ds, bvh, rays)
    rs, u1 = rnglib.lcg_randomf(rs)
    rs, u2 = rnglib.lcg_randomf(rs)
    to_l, to_w = cm_.orthonormal_basis(si.n_geom)
    wi = cm_.cosine_sample_hemisphere_concentric(u1, u2)
    dirs = cm_.normalize(cm_.apply_mat(to_w, wi), eps=1e-30)
    borig = si.p + si.n_geom * 1e-3
    alive = si.hit & ~si.is_light
    # match trace_closest_si's inert-lane rewrite: dead lanes point up
    # from above the scene so they cull to nothing and sort together
    out_o = bvh.cluster_max.max(axis=0) + 1.0
    up = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    borig = jnp.where(alive[:, None], borig, out_o[None, :])
    dirs = jnp.where(alive[:, None], dirs, up[None, :])
    brays = Ray(origin=borig, direction=dirs)
    brays = jax.block_until_ready(brays)
    print(f"tris={bvh.tri_v0.shape[0]} clusters={C} alive={int(alive.sum())}")

    lo = bvh.cluster_min.min(axis=0)
    hi = bvh.cluster_max.max(axis=0)
    sc_min, sc_max, S = _sc_boxes(pc, bvh.cluster_min, bvh.cluster_max)
    tile = pc.TILE
    n_pad = -(-n // tile) * tile
    maxv = pc._pad128(min(pc._SC_KEEP * pc._SC_GROUP, C))

    def key_cur(ry):
        return _coherence_keys(ry, lo, hi)

    def key_morton(ry):
        extent = jnp.maximum(hi - lo, 1e-20)
        q = jnp.clip((ry.origin - lo) / extent * 127.0, 0.0, 127.0
                     ).astype(jnp.int32)
        return _morton7(q)

    def _octant(ry):
        dd = ry.direction
        return ((dd[:, 0] < 0).astype(jnp.int32) * 4
                + (dd[:, 1] < 0).astype(jnp.int32) * 2
                + (dd[:, 2] < 0).astype(jnp.int32))

    def key_scent(ry):
        first, _ = _entry_exit_sc(sc_min, sc_max, ry)
        extent = jnp.maximum(hi - lo, 1e-20)
        q = jnp.clip((ry.origin - lo) / extent * 7.0, 0.0, 7.0
                     ).astype(jnp.int32)
        m9 = (q[:, 0] << 6) | (q[:, 1] << 3) | q[:, 2]
        return (first << 12) | (_octant(ry) << 9) | m9

    def key_scoct(ry):
        first, _ = _entry_exit_sc(sc_min, sc_max, ry)
        return (first << 3) | _octant(ry)

    def key_scfar(ry):
        first, last = _entry_exit_sc(sc_min, sc_max, ry)
        return (first << 12) | last

    def key_scfaroct(ry):
        first, last = _entry_exit_sc(sc_min, sc_max, ry)
        return (first << 15) | (last << 3) | _octant(ry)

    def key_scfml(ry):
        first, last, mid = _entry_exit_sc(sc_min, sc_max, ry, want_mid=True)
        return (first << 18) | (mid << 9) | last

    def key_sclfirst(ry):
        first, last = _entry_exit_sc(sc_min, sc_max, ry)
        return (last << 12) | first

    # per-lane live-SC count: lower-bound context for union sizes
    _, _, cnt = _entry_exit_sc(sc_min, sc_max, brays, want_count=True)
    cnt = np.asarray(cnt)
    print(f"per-lane live SCs (of {S}): mean={cnt.mean():.1f} "
          f"p50={np.percentile(cnt,50):.0f} p95={np.percentile(cnt,95):.0f}")

    # morton/scent/scoct measured flat vs cur (sum 1045k/825k/814k vs
    # 835k); corridor keys are the live ones
    for name, kf in [("cur", key_cur), ("scfar", key_scfar),
                     ("scfaroct", key_scfaroct), ("scfml", key_scfml),
                     ("sclfirst", key_sclfirst)]:
        f_key = jax.jit(kf)
        res_k, keys = timeit(f_key, brays, iters=3, warmup=1)
        perm = jnp.argsort(keys)
        od = jnp.concatenate([brays.origin, brays.direction], axis=1)
        od_s = jnp.take(od, perm, axis=0)
        srays = Ray(origin=od_s[:, 0:3], direction=od_s[:, 3:6])
        t_eff = jax.jit(lambda cm, cx, ry: pc.ray_t_bounds(
            cm, cx, ry, pc._INF))(bvh.cluster_min, bvh.cluster_max, srays)
        f_cull = jax.jit(lambda cm, cx, ry, te: pc.cull_clusters_per_lane(
            cm, cx, ry, te, n_pad, maxv, tile))
        res_c, cull_out = timeit(f_cull, bvh.cluster_min, bvh.cluster_max,
                                 srays, t_eff, iters=3, warmup=1)
        cnts = np.asarray(cull_out[1])
        ov = (np.asarray(cull_out[3]) > 0).sum()
        print(f"{name:7s} key={res_k['amortized_s']*1e3:6.1f}ms "
              f"cull={res_c['amortized_s']*1e3:6.1f}ms "
              f"visits sum={cnts.sum():8d} mean={cnts.mean():6.0f} "
              f"p50={np.percentile(cnts,50):5.0f} "
              f"p95={np.percentile(cnts,95):5.0f} max={cnts.max():5d} "
              f"overflow_tiles={ov}", flush=True)


if __name__ == "__main__":
    main()
