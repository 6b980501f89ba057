"""Decompose the cluster-tier trace into kernel vs gather costs.

Measures, on the 1M-tri terrain primary workload:
  * the Pallas closest kernel alone (lists precomputed),
  * _decode_hits alone (the (N, 16) geom row gather + MT recompute),
  * build_surface_interaction_fused alone (the (N, 20) fused shade row
    gather + exact MT recompute + mesh one-hot),
  * the raw row gathers alone (isolating gather cost from arithmetic).

Usage: python benchmarks/prof_phase2.py [grid]
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def main():
    import functools
    import tempfile

    from jax.experimental import pallas as pl

    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine import shade as shlib
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 708
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS)
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
    rays = jax.block_until_ready(rays)

    tile = pc.TILE
    tiles = -(-n // tile)
    n_pad = tiles * tile
    maxv = pc._pad128(min(pc.DEFAULT_MAX_VISITS, C))
    cb = pc._cid_bits(C)

    # precompute t bounds + lists once
    t_eff = jax.jit(pc.ray_t_bounds)(bvh.cluster_min, bvh.cluster_max, rays, pc._INF)
    cull = jax.jit(lambda ry, te: pc.cull_clusters(
        bvh.cluster_min, bvh.cluster_max, ry, te, n_pad, maxv))
    lists, counts, scales, overflow, near_dropped = cull(rays, t_eff)
    lists = jax.block_until_ready(lists.reshape(tiles * 8, maxv // 8))

    planes = pc._planes(rays, t_eff, n_pad)
    tmax_plane = planes[-1]
    tb = jax.lax.bitcast_convert_type(tmax_plane, jnp.int32)
    key_cold = (tb & ~pc._LOCAL_MASK) | pc._LOCAL_MASK
    cid_cold = jnp.full(tb.shape, -1, jnp.int32)
    out_shape = [jax.ShapeDtypeStruct((tiles * pc.TILE_ROWS, pc.LANES), jnp.int32)] * 2

    @jax.jit
    def kernel_only(lsts, cnts, scls, key0, cid0, pls):
        return pl.pallas_call(
            functools.partial(pc._closest_cluster_kernel, cb, maxv, False),
            grid_spec=pc._grid_spec(tiles, maxv, 2, False, pc.TILE_ROWS, False),
            out_shape=out_shape,
        )(cnts, scls, lsts, bvh.tri_tab, *pls, key0, cid0)

    res, outs = timeit(kernel_only, lists, counts, scales, key_cold, cid_cold, planes)
    print(f"pallas closest kernel alone: {res['amortized_s']*1e3:.2f} ms")
    key, cid = outs

    decode = jax.jit(lambda k, c: pc._decode_hits(k, c, bvh.geom_tab, rays, t_eff, n))
    res, hit = timeit(decode, key, cid)
    print(f"_decode_hits (row gather (N,{bvh.geom_tab.shape[1]}) + MT): "
          f"{res['amortized_s']*1e3:.2f} ms")

    # componentwise variant of the decode gather
    tri_sorted = jnp.where(cid.reshape(-1)[:n] >= 0,
                           cid.reshape(-1)[:n] * 64 + (key.reshape(-1)[:n] & pc._LOCAL_MASK), 0)

    @jax.jit
    def gather_row(idx):
        return jnp.take(bvh.geom_tab, idx, axis=0)

    res, _ = timeit(gather_row, tri_sorted)
    print(f"  geom row gather (N,{bvh.geom_tab.shape[1]}) alone: {res['amortized_s']*1e3:.2f} ms")

    # fused SI build (ONE shade_a row gather + exact MT + mesh one-hot)
    kf = key.reshape(-1)[:n]
    cf = cid.reshape(-1)[:n]
    si_fn = jax.jit(lambda k, c: shlib.build_surface_interaction_fused(
        r.device_scene, rays, k, c, bvh.shade_tab))
    res, _ = timeit(si_fn, kf, cf)
    print(f"build_SI_fused (shade (N,{bvh.shade_tab[0].shape[1]}) gather + "
          f"MT recompute + mesh one-hot): {res['amortized_s']*1e3:.2f} ms")

    @jax.jit
    def gather_shade_row(idx):
        return jnp.take(bvh.shade_tab[0], idx, axis=0)

    res, _ = timeit(gather_shade_row, tri_sorted)
    print(f"  shade_a row gather alone: {res['amortized_s']*1e3:.2f} ms")


if __name__ == "__main__":
    main()
