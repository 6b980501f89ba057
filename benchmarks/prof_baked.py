"""Hardware A/B: shared-origin baked Moller-Trumbore (round-4 lever).

Times the 1M-tri terrain primary trace+shade at 1024^2 with and without
``baked_tab`` (accel/pallas_cluster.bake_shared_origin_tab) and checks
the winning hits agree — the lever landed in round 4 with interpret-mode
coverage only (ADVICE r4 medium; docs/ROADMAP.md 'hardware A/B pending').

Also times the bake itself (one elementwise pass over the (C*8,128)
table, paid once per camera move).

Usage: python benchmarks/prof_baked.py [grid]
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
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS,
                 bvh_cache_dir="/tmp/bvhcache-bench")
    bvh = r.bvh
    print(f"tris={bvh.tri_v0.shape[0]} clusters={bvh.cluster_min.shape[0]}")

    W = H = 1024
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    rays = jax.block_until_ready(rays)

    f_bake = jax.jit(pc.bake_shared_origin_tab)
    res, baked = timeit(f_bake, bvh.tri_tab, r.state.camera.pos, iters=8)
    print(f"bake_shared_origin_tab: {res['amortized_s']*1e3:.2f} ms "
          f"(cold {res['cold_s']*1e3:.1f})")

    f_off = jax.jit(lambda d_, b, ry: trace_closest_si(d_, b, ry)[0])
    res, si_off = timeit(f_off, r.device_scene, bvh, rays, iters=8)
    t_off = res["amortized_s"]
    print(f"trace+shade baked OFF: {t_off*1e3:6.2f} ms -> {n/t_off/1e6:6.2f} Mrays/s")

    f_on = jax.jit(lambda d_, b, ry, bt: trace_closest_si(d_, b, ry, baked_tab=bt)[0])
    res, si_on = timeit(f_on, r.device_scene, bvh, rays, baked, iters=8)
    t_on = res["amortized_s"]
    print(f"trace+shade baked ON:  {t_on*1e3:6.2f} ms -> {n/t_on/1e6:6.2f} Mrays/s"
          f"   speedup x{t_off/t_on:.3f}")

    dp = np.abs(np.asarray(si_on.p) - np.asarray(si_off.p)).max()
    dh = int((np.asarray(si_on.hit) != np.asarray(si_off.hit)).sum())
    print(f"hit agreement: max|dp|={dp:.4g}  hit-flag diffs={dh}/{n}")


if __name__ == "__main__":
    main()
