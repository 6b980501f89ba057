"""Decompose BASELINE configs 1 (LTC) and 3 (RATIO) into stages.

The VERDICT-r3 ask: config 3 sat at ~49 Mrays/s while the code claimed
batched-shadow wins — nobody had split the frame the way LTC config 1
was split.  This profiler times, on the config-3 scene (3-light Cornell
at 512^2) and the config-1 scene (Cornell at 512^2):

  * primary rays + closest trace + SurfaceInteraction build,
  * the analytic LTC stage (ltc_direct),
  * the 4-sample stochastic direct stage WITHOUT the shadow trace,
  * the batched (4N,) any-hit shadow trace alone,
  * the full RATIO / LTC frames (the end-to-end per-frame cost).

Usage: python benchmarks/prof_ratio.py
"""

import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def stage_times(scene_path, size=512):
    from optix_renderer_tpu.accel.traverse import trace_any_with_stats
    from optix_renderer_tpu.core import math as cm
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.core.types import Ray
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si
    from optix_renderer_tpu.integrators import ratio as ratiolib
    from optix_renderer_tpu.integrators.ltc_direct import ltc_direct
    from optix_renderer_tpu.scene.config import parse_scene

    scene = parse_scene(scene_path)
    r = Renderer(scene, width=size, height=size, mode=RendererType.RATIO)
    ds, bvh = r.device_scene, r.bvh
    n = size * size

    lin = jnp.arange(n, dtype=jnp.uint32)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, size, size, ju, jv, lin=lin)
    rays = jax.block_until_ready(rays)

    tsi = jax.jit(lambda ry: trace_closest_si(ds, bvh, ry))
    res, (si, _) = timeit(tsi, rays)
    print(f"  primary trace + SI:      {res['amortized_s']*1e3:6.2f} ms")

    ltc = jax.jit(lambda ry, s: ltc_direct(ds, ry, s))
    res, _ = timeit(ltc, rays, si)
    print(f"  ltc_direct ({ds.num_lights} lights):   {res['amortized_s']*1e3:6.2f} ms")

    def sto_notrace(ry, s, rst):
        wo = cm.normalize(ry.origin - s.p, eps=1e-30)
        to_local, _ = cm.orthonormal_basis(s.n_geom)
        wo_local = cm.normalize(cm.apply_mat(to_local, wo), eps=1e-30)
        rng = rst
        outs = []
        for _ in range(4):
            c, ldir, dist, rng = ratiolib._stochastic_direct_sample(
                ds, s, wo_local, to_local, rng, 1e-3
            )
            outs.append((c, ldir, dist))
        return outs

    res, outs = timeit(jax.jit(sto_notrace), rays, si, rs)
    print(f"  4x light sample + BSDF:  {res['amortized_s']*1e3:6.2f} ms")

    shadow_origin = si.p + si.n_geom * 1e-3
    all_rays = Ray(
        origin=jnp.tile(shadow_origin, (4, 1)),
        direction=jnp.concatenate([o[1] for o in outs], axis=0),
    )
    all_dist = jnp.concatenate([o[2] for o in outs], axis=0)
    sh = jax.jit(lambda ar, ad: trace_any_with_stats(bvh, ar, t_max=ad * (1.0 - 1e-3), refine=True))
    res, _ = timeit(sh, all_rays, all_dist)
    print(f"  batched shadow trace 4N: {res['amortized_s']*1e3:6.2f} ms")

    full = jax.jit(lambda ry, s, rst: ratiolib.ratio_color(ds, bvh, ry, s, rst))
    res, _ = timeit(full, rays, si, rs)
    print(f"  ratio_color (ltc+sto):   {res['amortized_s']*1e3:6.2f} ms")

    from benchmarks.run_configs import time_frame
    res = time_frame(r)
    print(f"  FULL RATIO frame:        {res['amortized_s']*1e3:6.2f} ms "
          f"(cold {res['cold_s']*1e3:.1f})")
    rl = Renderer(scene, width=size, height=size, mode=RendererType.LTC_BASELINE)
    res = time_frame(rl)
    print(f"  FULL LTC frame:          {res['amortized_s']*1e3:6.2f} ms "
          f"(cold {res['cold_s']*1e3:.1f})")


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    print("config 3 scene (cornell3, 3 area lights), 512^2:")
    stage_times(os.path.join(here, "..", "scenes", "cornell3", "scene.json"))
    print("config 1 scene (cornell), 512^2:")
    stage_times(os.path.join(here, "..", "scenes", "cornell", "scene.json"))


if __name__ == "__main__":
    main()
