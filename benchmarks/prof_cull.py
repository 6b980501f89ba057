"""Component-level profile of the big-scene cull + kernel (terrain).

Splits cull_clusters into slab / pack / top_k and the cluster kernel
into DMA+loop / pretest / MT portions, with the honest scalar-fetch
sync.  Exploration tool for ranking perf work; see docs/ROADMAP.md.

Usage: python benchmarks/prof_cull.py [grid]
"""

import os
import sys
import tempfile
import time

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
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    grid = int(pos[0]) if pos else 708
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

    kernel_only = "--kernel-only" in sys.argv

    tb = jax.jit(pc.ray_t_bounds)
    res, t_eff = timeit(tb, bvh.cluster_min, bvh.cluster_max, rays, pc._INF)
    if not kernel_only:
        print(f"ray_t_bounds: {res['amortized_s']*1e3:.2f} ms")

    cm, cx = bvh.cluster_min, bvh.cluster_max

    # --- slab-only: reproduce cull's overlap matrix, return its popcount
    def slab_only(ry, te):
        o = ry.origin.reshape(tiles, pc.TILE, 3)
        dd = ry.direction.reshape(tiles, pc.TILE, 3)
        tmax = jnp.broadcast_to(te, (n,)).reshape(tiles, pc.TILE)
        o_lo, o_hi = o.min(axis=1), o.max(axis=1)
        d_lo, d_hi = dd.min(axis=1), dd.max(axis=1)
        t_hi = tmax.max(axis=1)
        near = jnp.zeros((tiles, C), jnp.float32)
        far = jnp.broadcast_to(t_hi[:, None], near.shape)
        for a in range(3):
            bmin = cm[None, :, a]
            bmax = cx[None, :, a]
            n_lo = bmin - o_hi[:, a:a + 1]
            n_hi = bmax - o_lo[:, a:a + 1]
            dl, dh = d_lo[:, a:a + 1], d_hi[:, a:a + 1]
            strad = (dl <= 0.0) & (dh >= 0.0)
            rdl = 1.0 / jnp.where(jnp.abs(dl) < 1e-20, 1e-20, dl)
            rdh = 1.0 / jnp.where(jnp.abs(dh) < 1e-20, 1e-20, dh)
            q1, q2, q3, q4 = n_lo * rdl, n_lo * rdh, n_hi * rdl, n_hi * rdh
            na = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
            fa = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
            na = jnp.where(strad, -pc._INF, na)
            fa = jnp.where(strad, pc._INF, fa)
            near = jnp.maximum(near, na)
            far = jnp.minimum(far, fa)
        return (near <= far).sum(), near

    if not kernel_only:
        res, (cnt_pairs, near_mat) = timeit(jax.jit(slab_only), rays, t_eff)
        print(f"slab only: {res['amortized_s']*1e3:.2f} ms  pairs={int(cnt_pairs)}")

        # --- top_k alone on the packed matrix, several k
        packed = jnp.where(near_mat <= 1e30, near_mat, pc._INF)
        packed_i = packed.astype(jnp.int32) | jnp.arange(C, dtype=jnp.int32)[None, :]
        for k in (129, 385, 1025):
            f = jax.jit(lambda p, k=k: jax.lax.top_k(-p, k)[0].sum())
            res, _ = timeit(f, packed_i)
            print(f"top_k k={k}: {res['amortized_s']*1e3:.2f} ms")

    # --- full cull for reference
    cull = jax.jit(lambda ry, te: pc.cull_clusters(cm, cx, ry, te, n_pad, maxv))
    res, cull_out = timeit(cull, rays, t_eff)
    if not kernel_only:
        print(f"cull full: {res['amortized_s']*1e3:.2f} ms")

    # --- kernel with forced variants
    lists, counts, scales, overflow, near_dropped = cull_out
    cb = pc._cid_bits(C)
    lists_r = lists.reshape(tiles * 8, maxv // 8)
    planes = pc._planes(rays, t_eff, n_pad)
    tmax_plane = planes[-1]
    tbi = jax.lax.bitcast_convert_type(tmax_plane, jnp.int32)
    key_cold = (tbi & ~pc._LOCAL_MASK) | pc._LOCAL_MASK
    cid_cold = jnp.full(tbi.shape, -1, jnp.int32)
    out_shape = [jax.ShapeDtypeStruct((tiles * 8, pc.LANES), jnp.int32)] * 2

    import functools as ft

    from jax.experimental import pallas as pl

    def run_kernel():
        return pl.pallas_call(
            ft.partial(pc._closest_cluster_kernel, cb, maxv),
            grid_spec=pc._grid_spec(tiles, maxv, 2, False, 8),
            out_shape=out_shape,
        )(counts, scales, lists_r, bvh.tri_tab, *planes, key_cold, cid_cold)

    res, _ = timeit(jax.jit(run_kernel))
    visits = int(np.asarray(counts).sum())
    print(f"kernel: {res['amortized_s']*1e3:.2f} ms  visits={visits}  "
          f"us/visit={res['amortized_s']*1e6/max(visits,1):.3f}")


if __name__ == "__main__":
    main()
