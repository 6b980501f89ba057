"""Profiling harness for the big-scene cluster tier on the terrain scene.

Breaks the primary-ray trace into phases (t-bound sweep, cull, kernel)
and reports visit statistics, so kernel/cull changes can be A/B'd fast.

IMPORTANT: all timed sections run BEFORE any MB-scale device->host read;
big D2H over the axon tunnel is flaky and can degrade every subsequent
dispatch by ~30 ms (measured), poisoning the numbers.

Usage:  python benchmarks/prof_terrain.py [grid]   (default 708 ~ 1M tris)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(f, *args, n=5, warmup=2):
    from optix_renderer_tpu.utils.timing import timeit as _timeit
    res, out = _timeit(f, *args, iters=n, warmup=warmup)
    return res["amortized_s"], out


def main():
    import tempfile

    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.core import rng as rnglib
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
    t0 = time.perf_counter()
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS,
                 bvh_cache_dir="/tmp/bvhcache-bench")
    print(f"load+build: {time.perf_counter()-t0:.1f}s  tris={r.bvh.tri_v0.shape[0]}"
          f"  clusters={r.bvh.cluster_min.shape[0]}")

    W = H = 1024
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    rays = jax.block_until_ready(rays)

    bvh = r.bvh
    C = bvh.cluster_min.shape[0]
    tiles = -(-n // pc.TILE)
    n_pad = tiles * pc.TILE
    maxv = pc._pad128(min(pc.DEFAULT_MAX_VISITS, C))

    # ---- timed phases (no big D2H before this point) ----
    tb = jax.jit(pc.ray_t_bounds)
    t_tb, t_eff = timeit(tb, bvh.cluster_min, bvh.cluster_max, rays, pc._INF)

    cull = jax.jit(lambda cm_, cx_, ry, te: pc.cull_clusters(cm_, cx_, ry, te, n_pad, maxv))
    t_c, cull_out = timeit(cull, bvh.cluster_min, bvh.cluster_max, rays, t_eff)

    # pass the scene pytrees as jit ARGUMENTS (closures bake them into
    # the HLO as constants, and the axon remote-compile request rejects
    # bodies past ~300 MB of baked scene tables)
    trace = jax.jit(lambda b, ry: pc.trace_closest_clusters(
        b.tri_tab, b.geom_tab, b.cluster_min, b.cluster_max, ry))
    t_tr, (hit, stats) = timeit(trace, bvh, rays)

    ts_fn = jax.jit(lambda d, b, ry: trace_closest_si(d, b, ry))
    t_si, _ = timeit(ts_fn, r.device_scene, bvh, rays)

    # oracle: re-cull with the converged t (the two-pass/occlusion ceiling)
    t_conv = jnp.where(hit.tri_id >= 0, hit.t * 1.02, t_eff)
    _, cull2 = timeit(cull, bvh.cluster_min, bvh.cluster_max, rays, t_conv, n=2, warmup=1)

    # ---- reporting (D2H allowed now) ----
    print(f"ray_t_bounds: {t_tb*1e3:.2f} ms")
    cnts = np.asarray(cull_out[1])
    print(f"cull (slab+topk): {t_c*1e3:.2f} ms   visits/tile mean={cnts.mean():.1f} "
          f"p50={np.percentile(cnts,50):.0f} p95={np.percentile(cnts,95):.0f} "
          f"max={cnts.max()}  overflow_tiles={(np.asarray(cull_out[3])>0).sum()}")
    hits = np.asarray(hit.tri_id >= 0)
    print(f"trace total: {t_tr*1e3:.2f} ms  -> {n/t_tr/1e6:.2f} Mrays/s   "
          f"hit_frac={hits.mean():.3f}  stats={jax.tree.map(lambda x: np.asarray(x).item(), stats)}")
    print(f"trace+shade: {t_si*1e3:.2f} ms  -> {n/t_si/1e6:.2f} Mrays/s")
    cnts2 = np.asarray(cull2[1])
    print(f"oracle re-cull visits/tile: mean={cnts2.mean():.1f} "
          f"p50={np.percentile(cnts2,50):.0f} p95={np.percentile(cnts2,95):.0f} "
          f"max={cnts2.max()}")


if __name__ == "__main__":
    main()
