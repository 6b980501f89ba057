"""Decompose the headline bench (Cornell PATH 1024^2 depth-4) into stages.

The frame is 1 primary + depth x (1 NEE any-hit + 1 bounce closest) trace
dispatches over 1M rays on the brute Pallas tier, plus integrator math.
This profiler times each trace kind alone and the full frame, so the
headline Mrays/s number can be attributed before optimizing.

Usage: python benchmarks/prof_cornell.py [--res 1024] [--depth 4]
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def main():
    from optix_renderer_tpu.accel.traverse import trace_any_with_stats, trace_closest
    from optix_renderer_tpu.core import math as cm
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.core.types import Ray
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si
    from optix_renderer_tpu.scene.config import parse_scene

    res = 1024
    depth = 4
    for i, a in enumerate(sys.argv):
        if a == "--res":
            res = int(sys.argv[i + 1])
        if a == "--depth":
            depth = int(sys.argv[i + 1])

    here = os.path.dirname(os.path.abspath(__file__))
    scene = parse_scene(os.path.join(here, "..", "scenes", "cornell", "scene.json"))
    r = Renderer(scene, width=res, height=res, mode=RendererType.PATH,
                 path_depth=depth)
    ds, bvh = r.device_scene, r.bvh
    W = H = res
    n = W * H
    print(f"tris={bvh.tri_v0.shape[0]} rays/frame={n}")

    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    rays = jax.block_until_ready(rays)

    # raw closest kernel (Hit decode included), primary rays
    f_cl = jax.jit(lambda ry: trace_closest(bvh, ry).t.sum())
    res_t, _ = timeit(f_cl, rays, iters=8, warmup=1)
    print(f"closest trace (kernel+decode): {res_t['amortized_s']*1e3:6.2f} ms "
          f"({n/res_t['amortized_s']/1e6:.0f} Mrays/s)")

    # trace + SurfaceInteraction
    f_si = jax.jit(lambda ry: trace_closest_si(ds, bvh, ry)[0].p.sum())
    res_t, _ = timeit(f_si, rays, iters=8, warmup=1)
    print(f"closest trace + shade (SI):    {res_t['amortized_s']*1e3:6.2f} ms")

    # any-hit shadow-style trace (uniform t_max)
    f_any = jax.jit(lambda ry: trace_any_with_stats(
        bvh, ry, t_max=jnp.full((n,), 1e3, jnp.float32))[0].sum())
    res_t, _ = timeit(f_any, rays, iters=8, warmup=1)
    print(f"any-hit trace:                 {res_t['amortized_s']*1e3:6.2f} ms")

    # full PATH frame via the renderer's jitted step (chained, one sync)
    box = {"s": r.state}

    def step():
        s, _gb, _aux = r._frame(box["s"], r.device_scene, r.bvh)
        box["s"] = s
        return s.accum

    res_t, _ = timeit(step, iters=8, warmup=1)
    per = res_t["amortized_s"]
    # honest ray count: primary + 2 per alive lane per bounce; approximate
    # with the metrics of one rendered frame
    print(f"FULL PATH depth-{depth} frame:     {per*1e3:6.2f} ms "
          f"({depth * 2 + 1} trace dispatches; naive {n*(depth*2+1)/per/1e6:.0f} "
          f"Mrays/s if all lanes alive)")


if __name__ == "__main__":
    main()
