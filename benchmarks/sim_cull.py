"""CPU simulation of the cluster-tier cull + kernel visit behavior.

The TPU tunnel in this environment stalls for minutes at a time, so
kernel A/B design runs on a model instead: replicate the cull math in
numpy, use the CPU walk tier for ground-truth hit distances, and count
(visits, MT-executed visits, MT ray-tests) per configuration:

* tile size (rays per kernel tile): 1024 / 512 / 256 / 128
* per-ray t bound: root-box exit | supercluster sweep | converged t (oracle)
* front-to-back early-out at tile granularity (what the kernel does)
* per-lane AABB pretest (skips the MT block, keeps DMA + control)

Cost model (calibrated on v5e measurements at tile=1024):
    kernel_ms = visits * T_CTRL + mt_visits * rays_tile * T_TEST * 64
with T_CTRL ~ per-visit control+DMA overhead and T_TEST per tri-ray test.

Usage: python benchmarks/sim_cull.py [grid]   (default 354 ~ 250k tris)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T_CTRL_US = 0.35   # per-visit while-loop control + DMA wait (measured class)
T_TEST_NS = 0.0011 * 1e3 / 64 / 1024 * 1e3  # from 1.5us/visit @1024 rays, 64 tris


def slab_tiles(cmin, cmax, o, d, tmax, tile):
    """Per-tile conservative frustum-vs-cluster slab test (cull_clusters
    math, numpy).  Returns (near (tiles, C), overlap (tiles, C))."""
    n = o.shape[0]
    tiles = n // tile
    ot = o.reshape(tiles, tile, 3)
    dt = d.reshape(tiles, tile, 3)
    o_lo = ot.min(1)[:, None, :]
    o_hi = ot.max(1)[:, None, :]
    d_lo = dt.min(1)[:, None, :]
    d_hi = dt.max(1)[:, None, :]
    t_hi = tmax.reshape(tiles, tile).max(1)

    near = np.zeros((tiles, cmin.shape[0]), np.float32)
    far = np.broadcast_to(t_hi[:, None], near.shape).copy()
    for a in range(3):
        bmin = cmin[None, :, a]
        bmax = cmax[None, :, a]
        n_lo = bmin - o_hi[:, :, a]
        n_hi = bmax - o_lo[:, :, a]
        dl = d_lo[:, :, a]
        dh = d_hi[:, :, a]
        straddle = (dl <= 0) & (dh >= 0)
        sdl = np.where(np.abs(dl) < 1e-20, 1e-20, dl)
        sdh = np.where(np.abs(dh) < 1e-20, 1e-20, dh)
        q = np.stack([n_lo / sdl, n_lo / sdh, n_hi / sdl, n_hi / sdh])
        na = np.where(straddle, -3e38, q.min(0))
        fa = np.where(straddle, 3e38, q.max(0))
        near = np.maximum(near, na)
        far = np.minimum(far, fa)
    return near, near <= far


def lane_slab(cmin, cmax, o, d, eps=1e-20):
    """Per-ray slab near/far vs every cluster: (n, C) — memory-heavy;
    callers chunk."""
    inv = 1.0 / np.where(np.abs(d) < eps, eps, d)
    t0 = (cmin[None, :, :] - o[:, None, :]) * inv[:, None, :]
    t1 = (cmax[None, :, :] - o[:, None, :]) * inv[:, None, :]
    near = np.minimum(t0, t1).max(-1)
    far = np.maximum(t0, t1).min(-1)
    return near, far


def simulate(cmin, cmax, o, d, t_bound, t_final, tile, label):
    """Count visits under tile-granular front-to-back early-out with the
    converged per-lane t (steady-state optimistic model) + per-lane
    pretest MT skip."""
    n = o.shape[0]
    tiles = n // tile
    near, overlap = slab_tiles(cmin, cmax, o, d, t_bound, tile)
    key = np.where(overlap, np.maximum(near, 0.0), np.inf)

    # per-lane effective t: converged hit t, or the ray's t bound on miss
    t_lane = np.where(np.isfinite(t_final), np.minimum(t_final, t_bound), t_bound)

    visits = 0
    mt_visits = 0
    C = cmin.shape[0]
    # bound the lane_slab working set: rays_chunk * C * 3 floats ~ 200MB
    chunk = max(1, (1 << 24) // (C * tile))
    for t0i in range(0, tiles, chunk):
        t1i = min(tiles, t0i + chunk)
        sl = slice(t0i * tile, t1i * tile)
        k = key[t0i:t1i]
        order = np.argsort(k, axis=1)
        ks = np.take_along_axis(k, order, axis=1)
        tl = t_lane[sl].reshape(t1i - t0i, tile)
        t_tile = tl.max(1)
        # early-out: visit while near_k < max t (steady state)
        nvis = (ks < t_tile[:, None]).sum(1)
        visits += int(nvis.sum())
        # per-lane pretest: MT runs if any lane's own near < its t
        ln, lf = lane_slab(cmin, cmax, o[sl], d[sl])
        ln = ln.reshape(t1i - t0i, tile, C)
        lf = lf.reshape(t1i - t0i, tile, C)
        live = (ln <= lf) & (lf > 0) & (ln < tl[:, :, None])
        any_live = live.any(1)  # (tiles_chunk, C)
        vis_mask = np.take_along_axis(
            np.arange(C)[None, :] < nvis[:, None], np.argsort(order, axis=1), axis=1
        )  # clusters actually visited (unsorted indexing)
        mt_visits += int((any_live & vis_mask).sum())

    ms = visits * T_CTRL_US / 1e3 + mt_visits * tile * 64 * T_TEST_NS / 1e6
    print(f"{label:52s} tile={tile:5d} visits={visits:8d} mt={mt_visits:8d} "
          f"visits/tile={visits/tiles:6.1f}  pred_kernel={ms:7.1f} ms")
    return visits, mt_visits, ms


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import tempfile

    import jax.numpy as jnp

    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.accel.traverse import trace_closest_bvh
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    grid = int(sys.argv[1]) if len(sys.argv) > 1 else 354
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    dpath = os.path.join(tempfile.gettempdir(), f"sim_terrain_{grid}")
    if not os.path.exists(os.path.join(dpath, "scene.json")):
        write_terrain_scene(dpath, grid=grid)
    scene = parse_scene(os.path.join(dpath, "scene.json"))
    r = Renderer(scene, width=res, height=res, mode=RendererType.NORMALS)
    W = H = res
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    o = np.asarray(rays.origin)
    d = np.asarray(rays.direction)
    bvh = r.bvh
    cmin = np.asarray(bvh.cluster_min)
    cmax = np.asarray(bvh.cluster_max)
    print(f"tris={bvh.tri_v0.shape[0]} clusters={cmin.shape[0]} rays={n}")

    t0 = time.time()
    hit = trace_closest_bvh(bvh, rays)
    t_final = np.where(np.asarray(hit.tri_id) >= 0, np.asarray(hit.t), np.inf)
    print(f"CPU ground-truth trace: {time.time()-t0:.1f}s  hit_frac={np.isfinite(t_final).mean():.3f}")

    # t bounds
    t_root = np.asarray(pc.clamp_t_exit(bvh.cluster_min, bvh.cluster_max, rays, pc._INF))
    t_sc = np.asarray(pc.ray_t_bounds(bvh.cluster_min, bvh.cluster_max, rays, pc._INF))
    t_oracle = np.where(np.isfinite(t_final), t_final * 1.0001, t_sc)

    for tile in (1024, 512, 256, 128):
        simulate(cmin, cmax, o, d, t_root, t_final, tile, "root-box exit clamp")
        simulate(cmin, cmax, o, d, t_sc, t_final, tile, "supercluster per-ray bound")
        simulate(cmin, cmax, o, d, t_oracle, t_final, tile, "oracle converged t (2-pass ceiling)")
        print()

    # --- cluster-size sweep under the pair-queue cost model -------------
    # (grid-step-per-(tile, cluster) kernel: no while loop, no pretest
    # sync; cost = pairs * (tile*csize*T_TEST + T_GRID))
    T_GRID_US = 0.06
    smin = np.asarray(bvh.tri_v0)
    e1 = np.asarray(bvh.tri_e1)
    e2 = np.asarray(bvh.tri_e2)
    v1 = smin + e1
    v2 = smin + e2
    tlo = np.minimum(np.minimum(smin, v1), v2)
    thi = np.maximum(np.maximum(smin, v1), v2)
    T = len(smin)
    print("pair-queue model sweep (csize x tile):")
    for csize in (64, 32, 16, 8):
        Cc = -(-T // csize)
        pad = Cc * csize - T
        lo = np.concatenate([tlo, np.full((pad, 3), np.inf, np.float32)])
        hi = np.concatenate([thi, np.full((pad, 3), -np.inf, np.float32)])
        cmin_c = lo.reshape(Cc, csize, 3).min(1)
        cmax_c = hi.reshape(Cc, csize, 3).max(1)
        for tile in (1024, 512, 256, 128):
            n_r = o.shape[0]
            tiles = n_r // tile
            near, overlap = slab_tiles(cmin_c, cmax_c, o, d, t_sc, tile)
            key = np.where(overlap, np.maximum(near, 0.0), np.inf)
            t_lane = np.where(np.isfinite(t_final), np.minimum(t_final, t_sc), t_sc)
            t_tile = t_lane.reshape(tiles, tile).max(1)
            pairs = int((key < t_tile[:, None]).sum())
            ms = pairs * (tile * csize * T_TEST_NS / 1e6 + T_GRID_US / 1e3)
            print(f"  csize={csize:3d} tile={tile:5d} C={Cc:6d} pairs={pairs:9d} "
                  f"pairs/tile={pairs/tiles:7.1f} pred={ms:7.1f} ms")
        print()


if __name__ == "__main__":
    main()
