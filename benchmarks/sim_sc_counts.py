"""Measure per-tile SUPERCLUSTER live counts on terrain (primary +
bounce rays) to size the two-level cull's candidate cap.  Offline
exploration tool; results recorded in docs/ROADMAP.md.
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
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS)
    bvh = r.bvh
    C = bvh.cluster_min.shape[0]
    G = 1 if C <= 512 else pc._SC_GROUP
    S = -(-C // G)
    print(f"tris={bvh.tri_v0.shape[0]} clusters={C} superclusters={S}")

    W = H = 1024
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)

    # supercluster AABBs (as in ray_t_bounds)
    pad = S * G - C
    cmin = jnp.pad(bvh.cluster_min, ((0, pad), (0, 0)), constant_values=pc._INF)
    cmax = jnp.pad(bvh.cluster_max, ((0, pad), (0, 0)), constant_values=-pc._INF)
    sc_min = cmin.reshape(S, G, 3).min(axis=1)
    sc_max = cmax.reshape(S, G, 3).max(axis=1)

    tiles = -(-n // pc.TILE)

    def tile_sc_counts(ry, te):
        o = ry.origin.reshape(tiles, pc.TILE, 3)
        dd = ry.direction.reshape(tiles, pc.TILE, 3)
        tmax = jnp.broadcast_to(te, (n,)).reshape(tiles, pc.TILE)
        o_lo, o_hi = o.min(axis=1), o.max(axis=1)
        d_lo, d_hi = dd.min(axis=1), dd.max(axis=1)
        t_hi = tmax.max(axis=1)
        near = jnp.zeros((tiles, S), jnp.float32)
        far = jnp.broadcast_to(t_hi[:, None], near.shape)
        for a in range(3):
            bmin = sc_min[None, :, a]
            bmax = sc_max[None, :, a]
            n_lo = bmin - o_hi[:, a:a + 1]
            n_hi = bmax - o_lo[:, a:a + 1]
            dl, dh = d_lo[:, a:a + 1], d_hi[:, a:a + 1]
            strad = (dl <= 0.0) & (dh >= 0.0)
            rdl = 1.0 / jnp.where(jnp.abs(dl) < 1e-20, 1e-20, dl)
            rdh = 1.0 / jnp.where(jnp.abs(dh) < 1e-20, 1e-20, dh)
            q1, q2, q3, q4 = n_lo * rdl, n_lo * rdh, n_hi * rdl, n_hi * rdh
            na = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
            fa = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
            na = jnp.where(strad, -pc._INF, na)
            fa = jnp.where(strad, pc._INF, fa)
            near = jnp.maximum(near, na)
            far = jnp.minimum(far, fa)
        return (near <= far).sum(axis=1)

    t_eff = pc.ray_t_bounds(bvh.cluster_min, bvh.cluster_max, rays, pc._INF)
    cnt = np.asarray(jax.jit(tile_sc_counts)(rays, t_eff))
    print(f"PRIMARY  sc/tile: mean={cnt.mean():.1f} p50={np.percentile(cnt,50):.0f} "
          f"p95={np.percentile(cnt,95):.0f} p99={np.percentile(cnt,99):.0f} max={cnt.max()}")

    # bounce rays: cosine hemisphere from primary hits, coherence-sorted
    si, _ = trace_closest_si(r.device_scene, bvh, rays)
    rs, b1 = rnglib.lcg_randomf(rs)
    rs, b2 = rnglib.lcg_randomf(rs)
    nrm = si.n_geom
    t = jnp.where(jnp.abs(nrm[:, 2:3]) < 0.9,
                  jnp.array([[0.0, 0.0, 1.0]]), jnp.array([[1.0, 0.0, 0.0]]))
    tang = jnp.cross(nrm, jnp.broadcast_to(t, nrm.shape))
    tang = tang / jnp.maximum(jnp.linalg.norm(tang, axis=-1, keepdims=True), 1e-8)
    bit = jnp.cross(nrm, tang)
    r_ = jnp.sqrt(b1)
    phi = 2 * np.pi * b2
    ld = (tang * (r_ * jnp.cos(phi))[:, None] + bit * (r_ * jnp.sin(phi))[:, None]
          + nrm * jnp.sqrt(jnp.maximum(1 - b1, 0.0))[:, None])
    alive = si.hit
    borig = si.p + nrm * 1e-3
    brays = Ray(origin=jnp.where(alive[:, None], borig, 0.0),
                direction=jnp.where(alive[:, None], ld, jnp.array([[0., 0., 1.]])))
    # coherence sort as trace_closest_si(coherent=False) does
    from optix_renderer_tpu.engine.shade import _coherence_keys
    out_o = bvh.cluster_max.max(axis=0) + 1.0
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    m = alive[:, None]
    brays = Ray(origin=jnp.where(m, brays.origin, out_o[None, :]),
                direction=jnp.where(m, brays.direction, up[None, :]))
    lo = bvh.cluster_min.min(axis=0)
    hi = bvh.cluster_max.max(axis=0)
    order = jnp.argsort(_coherence_keys(brays, lo, hi))
    brays = Ray(origin=brays.origin[order], direction=brays.direction[order])
    t_eff_b = pc.ray_t_bounds(bvh.cluster_min, bvh.cluster_max, brays, pc._INF)
    cntb = np.asarray(jax.jit(tile_sc_counts)(brays, t_eff_b))
    print(f"BOUNCE   sc/tile: mean={cntb.mean():.1f} p50={np.percentile(cntb,50):.0f} "
          f"p95={np.percentile(cntb,95):.0f} p99={np.percentile(cntb,99):.0f} max={cntb.max()}")


if __name__ == "__main__":
    main()
