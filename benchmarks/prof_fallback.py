"""Bounce-trace pass-1 vs overflow-fallback split on the terrain.

The round-4 corridor sort key cut the bounce closest trace from 2390 to
1616 ms, but cull (142) + t_bounds (12) leave ~1460 ms in "kernel +
fallback".  This times them separately:

  * pass-1 packed kernel only (cull lists fed straight to run()),
  * the full checked trace (pass-1 + fallback cond),
  * sweeps OPTIX_TPU_SC_KEEP / OPTIX_TPU_FB_TILES via subprocess-free
    env reading (set the env before launching for A/Bs).

Usage: python benchmarks/prof_fallback.py [grid]
"""

import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def main():
    import functools

    from jax.experimental import pallas as pl

    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.core import math as cm
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.core.types import Ray
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 708
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    W = H = 1024
    r = Renderer(scene, width=W, height=H, mode=RendererType.PATH,
                 path_depth=4, bvh_cache_dir="/tmp/bvhcache-bench")
    ds, bvh = r.device_scene, r.bvh
    C = bvh.cluster_min.shape[0]
    print(f"tris={bvh.tri_v0.shape[0]} clusters={C} "
          f"SC_KEEP={pc._SC_KEEP} FB_TILES={pc._FB_TILES} "
          f"VISIT_GROUP={pc._VISIT_GROUP}")

    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    f_prim = jax.jit(lambda d_, b_, ry: trace_closest_si(d_, b_, ry))
    si, _ = f_prim(ds, bvh, rays)
    rs, u1 = rnglib.lcg_randomf(rs)
    rs, u2 = rnglib.lcg_randomf(rs)
    to_l, to_w = cm.orthonormal_basis(si.n_geom)
    wi = cm.cosine_sample_hemisphere_concentric(u1, u2)
    dirs = cm.normalize(cm.apply_mat(to_w, wi), eps=1e-30)
    brays = Ray(origin=si.p + si.n_geom * 1e-3, direction=dirs)

    # corridor sort (what the refine path does)
    keys, t_eff_u = jax.jit(pc.corridor_keys_and_t_bounds)(
        bvh.cluster_min, bvh.cluster_max, brays)
    perm = jnp.argsort(keys)
    od = jnp.concatenate([brays.origin, brays.direction,
                          t_eff_u[:, None]], axis=1)
    od_s = jnp.take(od, perm, axis=0)
    srays = Ray(origin=od_s[:, 0:3], direction=od_s[:, 3:6])
    t_eff = od_s[:, 6]
    srays, t_eff = jax.block_until_ready((srays, t_eff))

    tile = pc.TILE
    grid_n = -(-n // tile)
    n_pad = grid_n * tile
    maxv = pc._pad128(min(pc._SC_KEEP * pc._SC_GROUP, C))
    cb = pc._cid_bits(C)

    # ---- stage 1: per-lane cull ----
    f_cull = jax.jit(lambda ry, te: pc.cull_clusters_per_lane(
        bvh.cluster_min, bvh.cluster_max, ry, te, n_pad, maxv, tile))
    res, cull_out = timeit(f_cull, srays, t_eff, iters=3, warmup=1)
    lists, counts, scales, overflow, near_dropped = cull_out
    cnts = np.asarray(counts)
    print(f"cull: {res['amortized_s']*1e3:.1f} ms  visits/tile "
          f"mean={cnts.mean():.0f} p95={np.percentile(cnts, 95):.0f} "
          f"sum={cnts.sum()} overflow_tiles={(np.asarray(overflow) > 0).sum()}")

    # ---- stage 2: pass-1 kernel ONLY (no fallback) ----
    planes_fn = jax.jit(lambda ry, te: pc._planes(ry, te, n_pad))
    planes = jax.block_until_ready(planes_fn(srays, t_eff))
    tb = jax.lax.bitcast_convert_type(planes[-1], jnp.int32)
    key_cold = jax.block_until_ready((tb & ~pc._LOCAL_MASK) | pc._LOCAL_MASK)
    cid_cold = jnp.full(tb.shape, -1, jnp.int32)
    out_shape = [jax.ShapeDtypeStruct((grid_n * pc.TILE_ROWS, pc.LANES),
                                      jnp.int32)] * 2

    def pass1(lsts, cnts_, scls, pls, k0, c0):
        o = pl.pallas_call(
            functools.partial(pc._closest_cluster_kernel, cb, maxv, False),
            grid_spec=pc._grid_spec(grid_n, maxv, 2, False, pc.TILE_ROWS,
                                    False),
            out_shape=out_shape,
        )(cnts_, scls, lsts.reshape(grid_n * 8, maxv // 8), bvh.tri_tab,
          *pls, k0, c0)
        return o[0].sum() + o[1].sum()

    f_p1 = jax.jit(pass1)
    res, _ = timeit(f_p1, lists, counts, scales, planes, key_cold, cid_cold,
                    iters=3, warmup=1)
    print(f"pass-1 kernel only: {res['amortized_s']*1e3:.1f} ms")

    # ---- full checked trace (pass-1 + fallback) ----
    f_full = jax.jit(lambda ry, te: pc.trace_closest_clusters_packed(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, ry,
        refine=True, t_eff=te)[0].sum())
    res, _ = timeit(f_full, srays, t_eff, iters=3, warmup=1)
    print(f"full trace (cull+kernel+fallback): {res['amortized_s']*1e3:.1f} ms")

    # stats from one run
    key1, _, _, stats = jax.jit(
        lambda ry, te: pc.trace_closest_clusters_packed(
            bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, ry,
            refine=True, t_eff=te))(srays, t_eff)
    print(f"stats: overflow={int(stats['overflow'])} "
          f"retraced={int(stats['retraced'])} "
          f"unresolved_tiles={int(stats['unresolved_tiles'])}")

    # ---- fallback BATCH decomposition: one _FB_TILES batch of real
    # unresolved tiles, re-cull vs full-width kernel ----
    def pass1_out(lsts, cnts_, scls, pls, k0, c0):
        return pl.pallas_call(
            functools.partial(pc._closest_cluster_kernel, cb, maxv, False),
            grid_spec=pc._grid_spec(grid_n, maxv, 2, False, pc.TILE_ROWS,
                                    False),
            out_shape=out_shape,
        )(cnts_, scls, lsts.reshape(grid_n * 8, maxv // 8), bvh.tri_tab,
          *pls, k0, c0)

    outs1 = jax.block_until_ready(jax.jit(pass1_out)(
        lists, counts, scales, planes, key_cold, cid_cold))
    t_tile = pc._key_t_up(outs1[0]).reshape(grid_n, -1).max(axis=1)
    unresolved = (overflow > 0) & (t_tile > near_dropped)
    order = np.argsort(np.where(np.asarray(unresolved), 0, 1))
    fb = min(grid_n, pc._FB_TILES)
    sel = jnp.asarray(order[:fb], jnp.int32)
    ro_g = srays.origin.reshape(grid_n, tile, 3)
    rd_g = srays.direction.reshape(grid_n, tile, 3)
    rfb = Ray(origin=jnp.take(ro_g, sel, axis=0).reshape(fb * tile, 3),
              direction=jnp.take(rd_g, sel, axis=0).reshape(fb * tile, 3))
    t_up = jnp.minimum(pc._key_t_up(outs1[0]).reshape(-1),
                       t_eff.reshape(-1) if t_eff.ndim else t_eff)
    t2 = jnp.take(t_up.reshape(grid_n, tile), sel, axis=0).reshape(fb * tile)
    rfb, t2 = jax.block_until_ready((rfb, t2))
    maxv_full = pc._pad128(C)

    f_c2 = jax.jit(lambda ry, t: pc.cull_clusters_per_lane(
        bvh.cluster_min, bvh.cluster_max, ry, t, fb * tile, maxv_full,
        tile, single_level=True))
    res, c2out = timeit(f_c2, rfb, t2, iters=3, warmup=1)
    c2cnt = np.asarray(c2out[1])
    print(f"fallback batch re-cull ({fb} tiles, full width): "
          f"{res['amortized_s']*1e3:.1f} ms  counts mean={c2cnt.mean():.0f} "
          f"p95={np.percentile(c2cnt, 95):.0f} sum={c2cnt.sum()}")

    l2, c2, s2 = c2out[0], c2out[1], c2out[2]
    pl_fb = jax.jit(lambda ry, t: pc._planes(ry, t, fb * tile))(rfb, t2)
    k0 = jnp.take(outs1[0].reshape(grid_n, pc.TILE_ROWS, pc.LANES), sel,
                  axis=0).reshape(fb * pc.TILE_ROWS, pc.LANES)
    c0 = jnp.take(outs1[1].reshape(grid_n, pc.TILE_ROWS, pc.LANES), sel,
                  axis=0).reshape(fb * pc.TILE_ROWS, pc.LANES)

    def fbk(lsts, cnts_, scls, pls, kk0, cc0):
        o = pl.pallas_call(
            functools.partial(pc._closest_cluster_kernel, cb, maxv_full,
                              False),
            grid_spec=pc._grid_spec(fb, maxv_full, 2, False, pc.TILE_ROWS,
                                    False),
            out_shape=[jax.ShapeDtypeStruct((fb * pc.TILE_ROWS, pc.LANES),
                                            jnp.int32)] * 2,
        )(cnts_, scls, lsts.reshape(fb * 8, maxv_full // 8), bvh.tri_tab,
          *pls, kk0, cc0)
        return o[0].sum() + o[1].sum()

    res, _ = timeit(jax.jit(fbk), l2, c2, s2, pl_fb, k0, c0,
                    iters=3, warmup=1)
    print(f"fallback batch kernel ({fb} tiles, warm): "
          f"{res['amortized_s']*1e3:.1f} ms")

    # ---- per-lane resolved masking: a lane with t_up <= near_dropped is
    # already EXACT (every dropped cluster has near >= near_dropped), so
    # the re-cull can treat it as dead (t=0); only the lanes that keep
    # the tile unresolved contribute clusters ----
    nd_t = jnp.take(near_dropped, sel, axis=0)  # (fb,)
    t2m = jnp.where(
        (t2.reshape(fb, tile) <= nd_t[:, None]).reshape(fb * tile), 0.0, t2)
    t2m = jax.block_until_ready(t2m)
    unres_lanes = int((np.asarray(t2m) > 0).sum())
    print(f"unresolved lanes in batch: {unres_lanes} / {fb * tile}")
    res, c2mout = timeit(f_c2, rfb, t2m, iters=3, warmup=1)
    c2mc = np.asarray(c2mout[1])
    print(f"fallback batch re-cull (lane-masked): "
          f"{res['amortized_s']*1e3:.1f} ms  counts mean={c2mc.mean():.0f} "
          f"p95={np.percentile(c2mc, 95):.0f} sum={c2mc.sum()}")
    pl_fbm = jax.jit(lambda ry, t: pc._planes(ry, t, fb * tile))(rfb, t2m)
    res, _ = timeit(jax.jit(fbk), c2mout[0], c2mout[1], c2mout[2], pl_fbm,
                    k0, c0, iters=3, warmup=1)
    print(f"fallback batch kernel (lane-masked, warm): "
          f"{res['amortized_s']*1e3:.1f} ms")


if __name__ == "__main__":
    main()
