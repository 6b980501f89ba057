"""Profiling harness for the big-scene cluster tier on the terrain scene.

Breaks the primary-ray trace into phases (cull slab, top_k, kernel) and
reports visit statistics, so kernel/cull changes can be A/B'd quickly.

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
    for _ in range(warmup):
        jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = jax.block_until_ready(f(*args))
    return (time.perf_counter() - t0) / n, out


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
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS)
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

    # phase timings
    clamp = jax.jit(pc.clamp_t_exit)
    t_cull, t_eff = timeit(clamp, bvh.cluster_min, bvh.cluster_max, rays, pc._INF)
    print(f"clamp_t_exit: {t_cull*1e3:.2f} ms")

    cull = jax.jit(lambda cm_, cx_, ry, te: pc.cull_clusters(cm_, cx_, ry, te, n_pad, maxv))
    t_c, cull_out = timeit(cull, bvh.cluster_min, bvh.cluster_max, rays, t_eff)
    lists, counts, scales, overflow, near_dropped = cull_out
    cnts = np.asarray(counts)
    print(f"cull (slab+topk): {t_c*1e3:.2f} ms   visits/tile mean={cnts.mean():.1f} "
          f"p50={np.percentile(cnts,50):.0f} p95={np.percentile(cnts,95):.0f} "
          f"max={cnts.max()}  overflow_tiles={(np.asarray(overflow)>0).sum()}")

    # full trace
    trace = jax.jit(lambda ry: pc.trace_closest_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, ry))
    t_tr, (hit, stats) = timeit(trace, rays)
    hits = np.asarray(hit.tri_id >= 0)
    print(f"trace total: {t_tr*1e3:.2f} ms  -> {n/t_tr/1e6:.2f} Mrays/s   "
          f"hit_frac={hits.mean():.3f}  stats={jax.tree.map(lambda x: np.asarray(x).item(), stats)}")

    # trace + shade (the production path)
    ts = jax.jit(lambda ry: trace_closest_si(r.device_scene, bvh, ry))
    t_si, _ = timeit(ts, rays)
    print(f"trace+shade: {t_si*1e3:.2f} ms  -> {n/t_si/1e6:.2f} Mrays/s")

    # ORACLE: visits if the cull knew the converged per-ray t (two-pass
    # ceiling): re-cull with t_max = final hit t (+2%), report visit stats.
    t_conv = jnp.where(hit.tri_id >= 0, hit.t * 1.02, t_eff)
    _, cull2 = timeit(cull, bvh.cluster_min, bvh.cluster_max, rays, t_conv)
    cnts2 = np.asarray(cull2[1])
    print(f"oracle re-cull visits/tile: mean={cnts2.mean():.1f} "
          f"p50={np.percentile(cnts2,50):.0f} p95={np.percentile(cnts2,95):.0f} "
          f"max={cnts2.max()}")


if __name__ == "__main__":
    main()
