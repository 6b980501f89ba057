"""How much does the per-lane cull shrink when the t bound is the
ACHIEVED hit distance instead of the conservative supercluster sweep?

Motivation: the bounce-trace pass-1 kernel costs ~1.4 us/visit x 555k
visits (786 ms); per-lane demand is only ~5 live superclusters.  If a
cheap greedy pass gives most lanes a real hit t, a warm re-cull's lists
collapse to "clusters with near < t_hit".  This measures that collapse:

  cull A: t = ray_t_bounds (what pass 1 uses today)
  cull B: t = min(exact hit t * (1+eps), bound)   (oracle warm re-cull)
  cull C: t after a CAPPED pass-1 (the k-nearest maxv1 lists) -- the
          achievable warm bound, not the oracle one

Usage: python benchmarks/sim_warmcull.py [grid] [maxv1]
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

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    grid = int(args[0]) if args else 708
    maxv1 = int(args[1]) if len(args) > 1 else 256
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    W = H = 1024
    r = Renderer(scene, width=W, height=H, mode=RendererType.PATH,
                 path_depth=4, bvh_cache_dir="/tmp/bvhcache-bench")
    ds, bvh = r.device_scene, r.bvh
    C = bvh.cluster_min.shape[0]
    print(f"tris={bvh.tri_v0.shape[0]} clusters={C} maxv1={maxv1}")

    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    si, _ = jax.jit(lambda d_, b_, ry: trace_closest_si(d_, b_, ry))(ds, bvh, rays)
    rs, u1 = rnglib.lcg_randomf(rs)
    rs, u2 = rnglib.lcg_randomf(rs)
    to_l, to_w = cm.orthonormal_basis(si.n_geom)
    wi = cm.cosine_sample_hemisphere_concentric(u1, u2)
    dirs = cm.normalize(cm.apply_mat(to_w, wi), eps=1e-30)
    brays = Ray(origin=si.p + si.n_geom * 1e-3, direction=dirs)

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
    cb = pc._cid_bits(C)

    def cull_counts(te, mv, label):
        f = jax.jit(lambda ry, t: pc.cull_clusters_per_lane(
            bvh.cluster_min, bvh.cluster_max, ry, t, n_pad, mv, tile))
        res, out = timeit(f, srays, te, iters=3, warmup=1)
        cnts = np.asarray(out[1])
        ov = (np.asarray(out[3]) > 0).sum()
        print(f"{label}: cull {res['amortized_s']*1e3:.0f} ms  "
              f"counts mean={cnts.mean():.0f} p50={np.percentile(cnts,50):.0f} "
              f"p95={np.percentile(cnts,95):.0f} sum={cnts.sum()} "
              f"overflow_tiles={ov}")
        return out

    maxv = pc._pad128(min(pc._SC_KEEP * pc._SC_GROUP, C))
    cull_counts(t_eff, maxv, "A t=sweep-bound   ")

    # exact hit t via the full checked trace
    key, cid, _, _ = jax.jit(lambda ry, te: pc.trace_closest_clusters_packed(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, ry, refine=True,
        t_eff=te))(srays, t_eff)
    t_up_oracle = jnp.minimum(pc._key_t_up(key).reshape(-1)[:n], t_eff)
    hit_frac = float((jnp.asarray(cid) >= 0).mean())
    print(f"hit fraction after full trace: {hit_frac:.3f}")
    cull_counts(jax.block_until_ready(t_up_oracle), maxv, "B t=oracle hit t  ")

    # achievable: capped greedy pass-1, then its achieved t
    mv1 = pc._pad128(min(maxv1, C))
    lists1, counts1, scales1, _, _ = jax.jit(
        lambda ry, te: pc.cull_clusters_per_lane(
            bvh.cluster_min, bvh.cluster_max, ry, te, n_pad, mv1, tile)
    )(srays, t_eff)
    planes = jax.jit(lambda ry, te: pc._planes(ry, te, n_pad))(srays, t_eff)
    tb = jax.lax.bitcast_convert_type(planes[-1], jnp.int32)
    key_cold = (tb & ~pc._LOCAL_MASK) | pc._LOCAL_MASK
    cid_cold = jnp.full(tb.shape, -1, jnp.int32)
    out_shape = [jax.ShapeDtypeStruct((grid_n * pc.TILE_ROWS, pc.LANES),
                                      jnp.int32)] * 2

    def pass1(lsts, cnts_, scls, pls, k0, c0):
        return pl.pallas_call(
            functools.partial(pc._closest_cluster_kernel, cb, mv1, False),
            grid_spec=pc._grid_spec(grid_n, mv1, 2, False, pc.TILE_ROWS,
                                    False),
            out_shape=out_shape,
        )(cnts_, scls, lsts.reshape(grid_n * 8, mv1 // 8), bvh.tri_tab,
          *pls, k0, c0)

    f_p1 = jax.jit(pass1)
    res, outs1 = timeit(f_p1, lists1, counts1, scales1, planes, key_cold,
                        cid_cold, iters=3, warmup=1)
    print(f"greedy pass-1 (maxv={mv1}) kernel: {res['amortized_s']*1e3:.0f} ms"
          f"  visits sum={int(np.asarray(counts1).sum())}")
    t_up_g = jnp.minimum(pc._key_t_up(outs1[0]).reshape(-1)[:n], t_eff)
    hit1 = float((jnp.asarray(outs1[1]).reshape(-1)[:n] >= 0).mean())
    print(f"hit fraction after greedy pass: {hit1:.3f}")
    cull_counts(jax.block_until_ready(t_up_g), maxv, "C t=greedy pass-1 ")


if __name__ == "__main__":
    main()
