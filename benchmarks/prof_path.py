"""Terrain PATH depth-4 frame breakdown (the round-2/3/4 'big scene,
incoherent rays' gate).

Times, at 1024^2 on the 1M-tri terrain:
  * the primary trace+shade,
  * one representative BOUNCE closest trace (cosine-sampled directions
    from the primary hits, traced incoherent = sort + per-lane cull +
    kernel) and its cull/kernel split,
  * one representative NEE shadow any-hit trace (points toward the
    emissive sky-panel light),
  * the full PATH depth-4 frame via the Renderer (the recorded metric).

Usage: python benchmarks/prof_path.py [grid] [--skip-frame]
"""

import os
import sys
import tempfile

if "--cpu" in sys.argv:  # env alone is overridden by the axon sitecustomize
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def main():
    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.accel.traverse import trace_any_with_stats
    from optix_renderer_tpu.core import math as cm
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.core.types import Ray
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si, _coherence_keys
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    argv = sys.argv[:]
    if "--res" in argv:
        i = argv.index("--res"); del argv[i:i + 2]
    pos = [a for a in argv[1:] if not a.startswith("-")]
    grid = int(pos[0]) if pos else 708
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    res_wh = 1024
    for i, a in enumerate(sys.argv):
        if a == "--res":
            res_wh = int(sys.argv[i + 1])
    r = Renderer(scene, width=res_wh, height=res_wh, mode=RendererType.PATH,
                 path_depth=4, bvh_cache_dir="/tmp/bvhcache-bench")
    ds, bvh = r.device_scene, r.bvh
    C = bvh.cluster_min.shape[0]
    print(f"tris={bvh.tri_v0.shape[0]} clusters={C}")

    W = H = res_wh
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)

    # primary trace + shade (scene pytrees as jit args, not closure
    # constants: the axon remote-compile request caps body size)
    f_prim = jax.jit(lambda d, b, ry: trace_closest_si(d, b, ry))
    res, (si, _) = timeit(f_prim, ds, bvh, rays, iters=3, warmup=1)
    print(f"primary trace+shade: {res['amortized_s']*1e3:.1f} ms")

    # representative bounce rays: cosine hemisphere at the primary hits
    rs, u1 = rnglib.lcg_randomf(rs)
    rs, u2 = rnglib.lcg_randomf(rs)
    to_l, to_w = cm.orthonormal_basis(si.n_geom)
    wi = cm.cosine_sample_hemisphere_concentric(u1, u2)
    dirs = cm.normalize(cm.apply_mat(to_w, wi), eps=1e-30)
    borig = si.p + si.n_geom * 1e-3
    brays = Ray(origin=borig, direction=dirs)
    alive = si.hit & ~si.is_light
    brays = jax.block_until_ready(brays)

    f_bounce = jax.jit(lambda d, b, ry, act: trace_closest_si(
        d, b, ry, coherent=False, active=act)[0].hit.sum())
    res, nb_hits = timeit(f_bounce, ds, bvh, brays, alive, iters=3, warmup=1)
    print(f"bounce closest trace+shade (sorted, per-lane cull): "
          f"{res['amortized_s']*1e3:.1f} ms  hits={int(nb_hits)}")

    # cull/kernel split for the bounce trace (sorted rays, refine path)
    lo = bvh.cluster_min.min(axis=0)
    hi = bvh.cluster_max.max(axis=0)
    keys, _te = jax.jit(lambda cm2, cx2, ry: pc.corridor_keys_and_t_bounds(
        cm2, cx2, ry))(bvh.cluster_min, bvh.cluster_max, brays)
    perm = jnp.argsort(keys)
    od = jnp.concatenate([brays.origin, brays.direction], axis=1)
    od_s = jnp.take(od, perm, axis=0)
    srays = Ray(origin=od_s[:, 0:3], direction=od_s[:, 3:6])
    srays = jax.block_until_ready(srays)

    # match the refine path's actual granularity (row mode by default)
    row = pc._ROW_BOUNCE
    tile = pc.LANES if row else pc.TILE
    n_pad = -(-n // (8 * pc.LANES)) * (8 * pc.LANES)
    maxv = (pc._pad128(min(pc._ROW_MAX_VISITS, C)) if row
            else pc._pad128(min(pc._SC_KEEP * pc._SC_GROUP, C)))
    f_tb = jax.jit(lambda ry: pc.ray_t_bounds(
        bvh.cluster_min, bvh.cluster_max, ry, pc._INF))
    res, t_eff = timeit(f_tb, srays, iters=3, warmup=1)
    print(f"  bounce ray_t_bounds: {res['amortized_s']*1e3:.1f} ms")
    f_cull = jax.jit(lambda ry, te: pc.cull_clusters_per_lane(
        bvh.cluster_min, bvh.cluster_max, ry, te, n_pad, maxv, tile))
    res, cull_out = timeit(f_cull, srays, t_eff, iters=3, warmup=1)
    cnts = np.asarray(cull_out[1])
    unit = "row" if row else "tile"
    print(f"  bounce per-lane cull: {res['amortized_s']*1e3:.1f} ms  "
          f"visits/{unit} mean={cnts.mean():.0f} p95={np.percentile(cnts,95):.0f} "
          f"overflow_{unit}s={(np.asarray(cull_out[3])>0).sum()}")
    interp = "--cpu" in sys.argv  # CPU smoke: Pallas needs interpret mode
    f_tr = jax.jit(lambda ry: pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, ry,
        refine=True, interpret=interp)[0].t.sum())
    res, _ = timeit(f_tr, srays, iters=3, warmup=1)
    print(f"  bounce trace total (cull+kernel+fallback): "
          f"{res['amortized_s']*1e3:.1f} ms")

    # representative NEE shadow trace: toward the light panel center
    lp = jnp.asarray([0.0, float(hi[1]) * 1.2, 0.0], jnp.float32)
    to_light = lp[None, :] - borig
    dist = jnp.sqrt(jnp.sum(to_light**2, axis=-1))
    sdir = to_light / jnp.maximum(dist, 1e-30)[:, None]
    f_sh = jax.jit(lambda: trace_any_with_stats(
        bvh, Ray(origin=borig, direction=sdir),
        t_max=jnp.where(alive, dist * 0.999, 0.0), refine=True)[0].sum())
    res, _ = timeit(f_sh, iters=3, warmup=1)
    print(f"NEE shadow any-hit trace (unsorted): {res['amortized_s']*1e3:.1f} ms")
    f_shs = jax.jit(lambda: trace_any_with_stats(
        bvh, Ray(origin=borig, direction=sdir),
        t_max=jnp.where(alive, dist * 0.999, 0.0), refine=True,
        coherent=False)[0].sum())
    res, _ = timeit(f_shs, iters=3, warmup=1)
    print(f"NEE shadow any-hit trace (corridor-sorted): "
          f"{res['amortized_s']*1e3:.1f} ms")

    if "--skip-frame" not in sys.argv:
        import time as _t
        t0 = _t.perf_counter()
        r.render(1)  # cold: includes jit compile of the depth-4 graph
        cold = _t.perf_counter() - t0
        t0 = _t.perf_counter()
        r.render(1)  # warm: the recorded per-frame cost
        dt = _t.perf_counter() - t0
        print(f"PATH depth-4 full frame: {dt:.2f} s warm "
              f"({n/dt/1e6:.2f} Mpaths/s; cold incl. compile {cold:.2f} s)")


if __name__ == "__main__":
    main()
