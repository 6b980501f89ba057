"""Gallery (config 6) PATH frame decomposition — VERDICT r4 weak #5.

The gallery is the realistic reference workload shape (37 meshes, 4
textures, 5,670 tris — the Model.cpp:164-242 loader output class), yet
config 6 recorded 5.6 Mrays/s vs Cornell's 242.  This profiler splits a
512^2 PATH frame into its stages to find where the 2.33 s goes:

  * primary closest trace (packed cluster kernel) vs trace+shade
    (attr gather + texture bilinear),
  * texture sampling alone,
  * representative bounce closest trace (sorted, per-lane cull),
  * representative NEE shadow any-hit trace,
  * the full depth-4 frame via the Renderer (the recorded metric),
    amortized over chained dispatches.

Usage: python benchmarks/prof_gallery.py [--res 512] [--cpu]
"""

import os
import sys
import time

if "--cpu" in sys.argv:  # env alone is overridden by the axon sitecustomize
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.accel.traverse import trace_any_with_stats
    from optix_renderer_tpu.core import math as cm
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.core.types import Ray
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.textures import sample_bilinear

    res_wh = 512
    for i, a in enumerate(sys.argv):
        if a == "--res":
            res_wh = int(sys.argv[i + 1])
    interp = "--cpu" in sys.argv

    scene = parse_scene(os.path.join(HERE, "..", "scenes", "gallery", "scene.json"))
    r = Renderer(scene, width=res_wh, height=res_wh, mode=RendererType.PATH,
                 path_depth=4)
    ds, bvh = r.device_scene, r.bvh
    C = bvh.cluster_min.shape[0]
    print(f"tris={bvh.tri_v0.shape[0]} clusters={C} textures={ds.has_textures}")

    W = H = res_wh
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    rays = jax.block_until_ready(rays)

    # trace ONLY (packed kernel incl. its cull): winning (key, cid)
    f_tr = jax.jit(lambda b, ry: pc.trace_closest_clusters_packed(
        b.tri_tab, b.cluster_min, b.cluster_max, ry, interpret=interp)[0].sum())
    res, _ = timeit(f_tr, bvh, rays, iters=8, warmup=2)
    t_trace = res["amortized_s"]
    print(f"primary packed trace only:   {t_trace*1e3:6.2f} ms")

    # cull alone (the packed trace's internal stage, timed separately)
    tiles = -(-n // pc.TILE)
    n_pad = tiles * pc.TILE
    maxv = pc._pad128(min(pc.DEFAULT_MAX_VISITS, C))
    f_tb = jax.jit(lambda b, ry: pc.ray_t_bounds(
        b.cluster_min, b.cluster_max, ry, pc._INF))
    res, t_eff = timeit(f_tb, bvh, rays, iters=8, warmup=2)
    print(f"  ray_t_bounds:              {res['amortized_s']*1e3:6.2f} ms")
    f_cull = jax.jit(lambda b, ry, te: pc.cull_clusters(
        b.cluster_min, b.cluster_max, ry, te, n_pad, maxv))
    res, cull_out = timeit(f_cull, bvh, rays, t_eff, iters=8, warmup=2)
    cnts = np.asarray(cull_out[1])
    print(f"  cull (slab+topk):          {res['amortized_s']*1e3:6.2f} ms  "
          f"visits/tile mean={cnts.mean():.1f} p95={np.percentile(cnts, 95):.0f}")

    # trace + shade (adds the attr gather + texture bilinear)
    f_prim = jax.jit(lambda d, b, ry: trace_closest_si(d, b, ry)[0].p.sum())
    res, _ = timeit(f_prim, ds, bvh, rays, iters=8, warmup=2)
    t_si = res["amortized_s"]
    print(f"primary trace+shade:         {t_si*1e3:6.2f} ms  "
          f"(shade = {(t_si - t_trace)*1e3:.2f} ms)")

    # texture bilinear alone, at the same lane count
    if ds.has_textures:
        tex_id = jnp.zeros((n,), jnp.int32)
        uu = jnp.linspace(0.0, 1.0, n)
        f_tex = jax.jit(lambda u: sample_bilinear(
            ds.textures, tex_id, u, 1.0 - u).sum())
        res, _ = timeit(f_tex, uu, iters=8, warmup=2)
        print(f"texture bilinear x{n} lanes: {res['amortized_s']*1e3:6.2f} ms")

    # full SI (for bounce inputs)
    si, _ = jax.jit(lambda d, b, ry: trace_closest_si(d, b, ry))(ds, bvh, rays)

    rs, u1 = rnglib.lcg_randomf(rs)
    rs, u2 = rnglib.lcg_randomf(rs)
    to_l, to_w = cm.orthonormal_basis(si.n_geom)
    wi = cm.cosine_sample_hemisphere_concentric(u1, u2)
    dirs = cm.normalize(cm.apply_mat(to_w, wi), eps=1e-30)
    borig = si.p + si.n_geom * 1e-3
    brays = Ray(origin=borig, direction=dirs)
    alive = si.hit & ~si.is_light
    brays = jax.block_until_ready(brays)
    print(f"alive after primary: {int(np.asarray(alive.sum()))}/{n}")

    f_bounce = jax.jit(lambda d, b, ry, act: trace_closest_si(
        d, b, ry, coherent=False, active=act)[0].hit.sum())
    res, nb = timeit(f_bounce, ds, bvh, brays, alive, iters=8, warmup=2)
    print(f"bounce trace+shade (sorted): {res['amortized_s']*1e3:6.2f} ms  "
          f"hits={int(nb)}")

    # NEE shadow any-hit toward the first light's centroid
    lp = jnp.asarray(np.asarray(ds.light_cg[0]), jnp.float32)
    to_light = lp[None, :] - borig
    dist = jnp.sqrt(jnp.sum(to_light**2, axis=-1))
    sdir = to_light / jnp.maximum(dist, 1e-30)[:, None]
    f_sh = jax.jit(lambda b, o, sd, tm: trace_any_with_stats(
        b, Ray(origin=o, direction=sd), t_max=tm, refine=True,
        coherent=False)[0].sum())
    tm = jnp.where(alive, dist * 0.999, 0.0)
    res, _ = timeit(f_sh, bvh, borig, sdir, tm, iters=8, warmup=2)
    print(f"NEE shadow any-hit (sorted): {res['amortized_s']*1e3:6.2f} ms")

    # the recorded metric: full depth-4 frame, warm, amortized
    r.render(1)  # compile + warm
    state = r.state
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        state, _gb, _aux = r._frame(state, r.device_scene, r.bvh)
    float(state.accum[0, 0, 0])
    dt = (time.perf_counter() - t0) / iters
    alive_c = np.asarray(r.aux["path_alive_counts"], np.int64)
    rays_f = n + int(alive_c[:, 1:].sum())
    print(f"PATH depth-4 frame:          {dt*1e3:6.1f} ms amortized  "
          f"({rays_f} rays -> {rays_f/dt/1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
