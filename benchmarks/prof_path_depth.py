"""In-frame PATH cost by depth on the terrain: times the REAL
``path_color`` (the jitted fori_loop the Renderer runs) at depth 1..4
plus the primary trace, so per-bounce in-frame cost is the successive
difference — the representative-bounce numbers in prof_path consistently
sum to far less than the measured frame, and this pins down where the
rest goes.

Usage: python benchmarks/prof_path_depth.py [grid] [depths...]
"""

import os
import sys
import tempfile

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def main():
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.core.types import Ray
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si
    from optix_renderer_tpu.integrators.path import path_color
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    grid = int(args[0]) if args else 708
    depths = [int(a) for a in args[1:]] or [1, 2, 3, 4]
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    W = H = 1024
    r = Renderer(scene, width=W, height=H, mode=RendererType.PATH,
                 path_depth=4, bvh_cache_dir="/tmp/bvhcache-bench")
    ds, bvh = r.device_scene, r.bvh
    print(f"tris={bvh.tri_v0.shape[0]} clusters={bvh.cluster_min.shape[0]}")

    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)

    f_prim = jax.jit(lambda d_, b_, ry: trace_closest_si(d_, b_, ry))
    res, (si, _) = timeit(f_prim, ds, bvh, rays, iters=3, warmup=1)
    print(f"primary trace+shade: {res['amortized_s']*1e3:.1f} ms")
    si = jax.block_until_ready(si)
    rays = jax.block_until_ready(rays)
    rs = jax.block_until_ready(rs)

    prev = res["amortized_s"]
    for dep in depths:
        f = jax.jit(
            lambda d_, b_, ry, s_, rg, _dep=dep: path_color(
                d_, b_, ry, s_, rg, max_depth=_dep)[0].sum()
        )
        res, out = timeit(f, ds, bvh, rays, si, rs, iters=1, warmup=1)
        t = res["amortized_s"]
        print(f"path_color depth={dep}: {t:.2f} s  (delta {t - prev:+.2f} s)")
        prev = t
        # alive counts at this depth (one extra eval, amortized irrelevant)
        _, _, counts, stats = jax.jit(
            lambda d_, b_, ry, s_, rg, _dep=dep: path_color(
                d_, b_, ry, s_, rg, max_depth=_dep))(ds, bvh, rays, si, rs)
        print(f"  alive/bounce={list(map(int, counts))} "
              f"overflow={int(stats['overflow'])} "
              f"unresolved_tiles={int(stats['unresolved_tiles'])}")


if __name__ == "__main__":
    main()
