"""Isolate the incoherent (bounce) cluster-kernel cost on the terrain.

prof_path times the end-to-end bounce trace; this profiler precomputes
REAL bounce rays (primary hits + cosine directions), sorts them, runs
the per-lane cull once, and then times the closest kernel ALONE on the
frozen lists — both with the Moller-Trumbore body live and with it
force-skipped (pc._X_SKIP_MT monkeypatched after the primary trace, so
the floor uses the same real lists unlike an env-level skip which would
corrupt the primary hits).  The gap between the two is pure MT compute;
the floor is DMA + loop + pretest machinery.

Usage: python benchmarks/prof_bounce.py [grid]
"""

import functools
import os
import sys
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def main():
    from jax.experimental import pallas as pl

    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.core import math as cm
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.core.types import Ray
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si, _coherence_keys
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 708
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS,
                 bvh_cache_dir="/tmp/bvhcache-bench")
    ds, bvh = r.device_scene, r.bvh
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
    si, _ = jax.jit(lambda ry: trace_closest_si(ds, bvh, ry))(rays)

    rs, u1 = rnglib.lcg_randomf(rs)
    rs, u2 = rnglib.lcg_randomf(rs)
    _, to_w = cm.orthonormal_basis(si.n_geom)
    wi = cm.cosine_sample_hemisphere_concentric(u1, u2)
    dirs = cm.normalize(cm.apply_mat(to_w, wi), eps=1e-30)
    brays = Ray(origin=si.p + si.n_geom * 1e-3, direction=dirs)
    print(f"primary hits: {int(si.hit.sum())}")

    # sort exactly like trace_closest_si(coherent=False)
    lo = bvh.cluster_min.min(axis=0)
    hi = bvh.cluster_max.max(axis=0)
    perm = jnp.argsort(_coherence_keys(brays, lo, hi))
    od = jnp.concatenate([brays.origin, brays.direction], axis=1)
    od_s = jnp.take(od, perm, axis=0)
    srays = Ray(origin=od_s[:, 0:3], direction=od_s[:, 3:6])
    srays = jax.block_until_ready(srays)

    tile = pc.TILE
    tiles = -(-n // tile)
    n_pad = tiles * tile
    maxv = pc._pad128(min(pc._SC_KEEP * pc._SC_GROUP, C))
    cb = pc._cid_bits(C)

    t_eff = jax.jit(pc.ray_t_bounds)(bvh.cluster_min, bvh.cluster_max, srays, pc._INF)
    cull = jax.jit(lambda ry, te: pc.cull_clusters_per_lane(
        bvh.cluster_min, bvh.cluster_max, ry, te, n_pad, maxv))
    lists, counts, scales, overflow, near_dropped = cull(srays, t_eff)
    cnts = np.asarray(counts)
    print(f"visits/tile mean={cnts.mean():.0f} p95={np.percentile(cnts, 95):.0f} "
          f"sum={cnts.sum()} overflow_tiles={(np.asarray(overflow) > 0).sum()}")
    lists = jax.block_until_ready(lists.reshape(tiles * 8, maxv // 8))

    planes = pc._planes(srays, t_eff, n_pad)
    tmax_plane = planes[-1]
    tb = jax.lax.bitcast_convert_type(tmax_plane, jnp.int32)
    key_cold = (tb & ~pc._LOCAL_MASK) | pc._LOCAL_MASK
    cid_cold = jnp.full(tb.shape, -1, jnp.int32)
    out_shape = [jax.ShapeDtypeStruct((tiles * pc.TILE_ROWS, pc.LANES), jnp.int32)] * 2

    def make_kernel():
        @jax.jit
        def kernel_only(lsts, cnts_, scls, key0, cid0, pls):
            return pl.pallas_call(
                functools.partial(pc._closest_cluster_kernel, cb, maxv, False),
                grid_spec=pc._grid_spec(tiles, maxv, 2, False, pc.TILE_ROWS, False),
                out_shape=out_shape,
            )(cnts_, scls, lsts, bvh.tri_tab, *pls, key0, cid0)
        return kernel_only

    f = make_kernel()
    args = (lists, counts, scales, key_cold, cid_cold, planes)
    res, out = timeit(lambda: f(*args)[0], iters=4, warmup=1)
    full_ms = res["amortized_s"] * 1e3
    print(f"bounce closest kernel (MT live): {full_ms:6.1f} ms "
          f"({full_ms*1e3/max(cnts.sum(),1):.3f} us/listed visit)")

    pc._X_SKIP_MT = True  # floor: DMA + loop + pretest only (results WRONG)
    f2 = make_kernel()
    res, _ = timeit(lambda: f2(*args)[0], iters=4, warmup=1)
    floor_ms = res["amortized_s"] * 1e3
    pc._X_SKIP_MT = False
    print(f"bounce closest kernel (MT skipped): {floor_ms:6.1f} ms "
          f"({floor_ms*1e3/max(cnts.sum(),1):.3f} us/listed visit)")
    print(f"MT compute share: {full_ms - floor_ms:.1f} ms")


if __name__ == "__main__":
    main()
