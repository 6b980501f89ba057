"""Stage-level decomposition of the TWO-LEVEL cull (cull_clusters) and
the shade step on the terrain scene: L1 slab / L1 topk / box gather /
L2 slab / pack+topk, then trace_closest_si minus trace (the SI cost).

Usage: python benchmarks/prof_cull2.py [grid]
"""

import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit


def main():
    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import (
        build_surface_interaction_fused,
    )
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 708
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS,
                 bvh_cache_dir="/tmp/bvhcache-bench")
    bvh = r.bvh
    C = bvh.cluster_min.shape[0]
    print(f"tris={bvh.tri_v0.shape[0]} clusters={C}")

    W = H = 1024
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)

    tiles = -(-n // pc.TILE)
    n_pad = tiles * pc.TILE
    maxv = pc._pad128(min(pc.DEFAULT_MAX_VISITS, C))
    cm, cx = bvh.cluster_min, bvh.cluster_max
    t_eff = jax.jit(pc.ray_t_bounds)(cm, cx, rays, pc._INF)
    t_eff = jax.block_until_ready(t_eff)

    G = pc._SC_GROUP
    S = -(-C // G)
    padc = S * G - C
    cmin = jnp.pad(cm, ((0, padc), (0, 0)), constant_values=pc._INF)
    cmax = jnp.pad(cx, ((0, padc), (0, 0)), constant_values=-pc._INF)
    sc_min = cmin.reshape(S, G, 3).min(axis=1)
    sc_max = cmax.reshape(S, G, 3).max(axis=1)
    sb = pc._cid_bits(S)
    cb = pc._cid_bits(C)
    K1 = min(pc._SC_CAND, S)

    # stage 0: tile bounds
    f_tb = jax.jit(lambda ry, te: pc._tile_bounds(ry, te, n_pad, pc.TILE))
    res, tbounds = timeit(f_tb, rays, t_eff)
    print(f"tile bounds: {res['amortized_s']*1e3:.2f} ms")
    o_lo, o_hi, d_lo, d_hi, t_hi = jax.block_until_ready(tbounds)

    # stage 1: L1 slab over superclusters
    sc_comps = ([sc_min[:, a][None, :] for a in range(3)]
                + [sc_max[:, a][None, :] for a in range(3)])
    f_l1 = jax.jit(lambda *b: pc._tile_slab(list(b[:6]), *b[6:]))
    res, (sc_near, sc_far) = timeit(f_l1, *sc_comps, o_lo, o_hi, d_lo, d_hi, t_hi)
    print(f"L1 slab ({tiles}x{S}): {res['amortized_s']*1e3:.2f} ms")

    # stage 2: L1 pack+topk
    sc_live = sc_near <= sc_far
    f_l1k = jax.jit(lambda nr, lv: pc._pack_topk_lists(
        nr, lv,
        jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], nr.shape),
        sb, K1))
    res, sc_out = timeit(f_l1k, sc_near, sc_live)
    print(f"L1 pack+topk (k={K1}): {res['amortized_s']*1e3:.2f} ms")
    sc_lists, sc_counts = sc_out[0], sc_out[1]

    # stage 3: candidate box gather
    sc_ids = sc_lists & ((1 << sb) - 1)

    def gather(ids):
        return [jnp.take(cmin[:, a].reshape(S, G), ids, axis=0).reshape(tiles, K1 * G)
                for a in range(3)] + \
               [jnp.take(cmax[:, a].reshape(S, G), ids, axis=0).reshape(tiles, K1 * G)
                for a in range(3)]

    res, box_comps = timeit(jax.jit(gather), sc_ids)
    print(f"box gather ({tiles}x{K1*G}): {res['amortized_s']*1e3:.2f} ms")

    # stage 4: L2 slab
    f_l2 = jax.jit(lambda *b: pc._tile_slab(list(b[:6]), *b[6:]))
    res, (near, far) = timeit(f_l2, *box_comps, o_lo, o_hi, d_lo, d_hi, t_hi)
    print(f"L2 slab ({tiles}x{K1*G}): {res['amortized_s']*1e3:.2f} ms")

    # stage 5: L2 pack+topk
    slot = jax.lax.broadcasted_iota(jnp.int32, (tiles, K1), 1)
    cand_valid = slot < sc_counts[:, None]
    cand_cid_raw = (sc_ids[:, :, None] * G
                    + jnp.arange(G, dtype=jnp.int32)[None, None, :]
                    ).reshape(tiles, K1 * G)
    live = (near <= far) & jnp.repeat(cand_valid, G, axis=1) & (cand_cid_raw < C)
    cand_cid = jnp.minimum(cand_cid_raw, C - 1)
    f_l2k = jax.jit(lambda nr, lv, ci: pc._pack_topk_lists(nr, lv, ci, cb, maxv))
    res, _ = timeit(f_l2k, near, live, cand_cid)
    print(f"L2 pack+topk (k={maxv}): {res['amortized_s']*1e3:.2f} ms")

    # full cull reference
    f_cull = jax.jit(lambda ry, te: pc.cull_clusters(cm, cx, ry, te, n_pad, maxv))
    res, _ = timeit(f_cull, rays, t_eff)
    print(f"cull full: {res['amortized_s']*1e3:.2f} ms")

    # shade-only: fused SI build on fixed packed kernel outputs
    f_tr = jax.jit(lambda ry: pc.trace_closest_clusters_packed(
        bvh.tri_tab, cm, cx, ry)[:2])
    key, cid = jax.block_until_ready(f_tr(rays))
    f_si = jax.jit(lambda k, c: build_surface_interaction_fused(
        r.device_scene, rays, k, c, bvh.shade_tab).n_geom.sum())
    res, _ = timeit(f_si, key, cid)
    print(f"SI build (fused decode+shade): {res['amortized_s']*1e3:.2f} ms")
    tid = jnp.where(cid >= 0, cid * pc.GROUP_CLUSTER + (key & pc._LOCAL_MASK), 0)
    f_si2 = jax.jit(lambda i: sum(jnp.take(
        t, i, axis=0).sum() for t in bvh.shade_tab))
    res, _ = timeit(f_si2, tid)
    widths = "+".join(str(t.shape[1]) for t in bvh.shade_tab)
    print(f"SI shade_tab row gathers alone (N,{widths}): "
          f"{res['amortized_s']*1e3:.2f} ms")


if __name__ == "__main__":
    main()
