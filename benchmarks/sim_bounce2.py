"""Supercluster-union structure of REAL bounce-1/2/3 rays on the terrain.

The in-frame depth sweep showed unresolved tiles exploding with depth
(265 -> 1198 -> 2261 -> 3288): each later bounce pushes ~1000 tiles into
the full-width fallback, and the fallback (~2.4 ms/tile) dominates the
frame.  Overflow there is SUPERCLUSTER overflow — the per-lane cull
keeps only the _SC_CAND_LANE=64 nearest live SCs per TILE (union over
its 1024 corridor-sorted lanes).  This measures, per bounce depth, the
per-tile SC-union histogram and the per-lane live-SC stats, to size K1
(or motivate restructuring) from data.

Usage: python benchmarks/sim_bounce2.py [grid]
"""

import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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
    G = pc._SC_GROUP
    S = -(-C // G)
    print(f"tris={bvh.tri_v0.shape[0]} clusters={C} superclusters={S}")

    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    # scene pytrees as jit ARGS, not closure constants: the axon
    # remote-compile request caps body size (HTTP 413)
    f_tr = jax.jit(lambda d_, b_, ry, act: trace_closest_si(
        d_, b_, ry, coherent=False, active=act))

    si, _ = jax.jit(trace_closest_si)(ds, bvh, rays)
    alive = si.hit & ~si.is_light

    # analysis fn: corridor-sorted per-tile SC-union histogram
    @jax.jit
    def sc_stats(cmin_, cmax_, ry: Ray, act):
        out_o = cmax_.max(axis=0) + 1.0
        up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
        m = act[:, None]
        ry = Ray(origin=jnp.where(m, ry.origin, out_o[None, :]),
                 direction=jnp.where(m, ry.direction, up[None, :]))
        keys, t_eff = pc.corridor_keys_and_t_bounds(cmin_, cmax_, ry)
        perm = jnp.argsort(keys)
        od = jnp.concatenate([ry.origin, ry.direction, t_eff[:, None]],
                             axis=1)
        od_s = jnp.take(od, perm, axis=0)
        sry = Ray(origin=od_s[:, 0:3], direction=od_s[:, 3:6])
        te = od_s[:, 6]
        # per-lane live SCs within the t bound
        near, far, hit = pc._sc_slab_sweep(cmin_, cmax_, sry)
        live = hit & (jnp.maximum(near, 0.0) < te[:, None])  # (N, S)
        per_lane = live.sum(axis=1)
        tiles = n // pc.TILE
        union = live.reshape(tiles, pc.TILE, -1).any(axis=1).sum(axis=1)
        return per_lane, union, te

    def report(tag, ry, act):
        per_lane, union, _ = jax.block_until_ready(
            sc_stats(bvh.cluster_min, bvh.cluster_max, ry, act))
        pl_ = np.asarray(per_lane)
        un = np.asarray(union)
        print(f"{tag}: per-lane live SCs mean={pl_.mean():.1f} "
              f"p50={np.percentile(pl_, 50):.0f} p95={np.percentile(pl_, 95):.0f} "
              f"max={pl_.max()}")
        print(f"    per-tile SC union p50={np.percentile(un, 50):.0f} "
              f"p95={np.percentile(un, 95):.0f} max={un.max()}  "
              f"tiles>64: {(un > 64).sum()}  >96: {(un > 96).sum()}  "
              f">128: {(un > 128).sum()}  >192: {(un > 192).sum()} of {len(un)}")

    cur_p, cur_n, cur_alive = si.p, si.n_geom, alive
    for depth in (1, 2, 3):
        rs, u1 = rnglib.lcg_randomf(rs)
        rs, u2 = rnglib.lcg_randomf(rs)
        to_l, to_w = cm.orthonormal_basis(cur_n)
        wi = cm.cosine_sample_hemisphere_concentric(u1, u2)
        dirs = cm.normalize(cm.apply_mat(to_w, wi), eps=1e-30)
        bry = Ray(origin=cur_p + cur_n * 1e-3, direction=dirs)
        report(f"bounce-{depth} (alive={int(cur_alive.sum())})",
               bry, cur_alive)
        if depth < 3:
            bsi, _ = f_tr(ds, bvh, bry, cur_alive)
            cur_alive = cur_alive & bsi.hit & ~bsi.is_light
            cur_p, cur_n = bsi.p, bsi.n_geom


if __name__ == "__main__":
    main()
