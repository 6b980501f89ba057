"""Measure row-level liveness of the per-tile cluster lists (terrain).

The cluster kernel tests every listed cluster against ALL 8 rows (1024
rays) of its tile.  If a listed cluster overlaps only a few of the 8
per-row frusta, a row-masked MT (skip dead rows with scalar branches)
cuts the VPU work proportionally.  This sim prints the distribution of
live rows per (tile, list entry) for primary and one-bounce rays, i.e.
the expected row-mask speedup of the Moller-Trumbore work.

Usage: python benchmarks/sim_rows.py [grid]   (CPU ok; chunked)
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from optix_renderer_tpu.accel import pallas_cluster as pc
    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
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

    W = H = 1024
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)

    tiles = -(-n // pc.TILE)
    n_pad = tiles * pc.TILE
    maxv = pc._pad128(min(pc.DEFAULT_MAX_VISITS, C))

    t_eff = jax.jit(pc.ray_t_bounds)(bvh.cluster_min, bvh.cluster_max, rays, pc._INF)
    lists, counts, scale, overflow, near_dropped = jax.jit(
        lambda ry, te: pc.cull_clusters(
            bvh.cluster_min, bvh.cluster_max, ry, te, n_pad, maxv)
    )(rays, t_eff)

    cb = pc._cid_bits(C)
    lists_np = np.asarray(lists)
    counts_np = np.asarray(counts)
    cm = np.asarray(bvh.cluster_min)
    cx = np.asarray(bvh.cluster_max)
    o = np.asarray(rays.origin).reshape(tiles, 8, 128, 3)
    dd = np.asarray(rays.direction).reshape(tiles, 8, 128, 3)
    te = np.asarray(t_eff).reshape(tiles, 8, 128)

    # per-row conservative bounds
    o_lo, o_hi = o.min(axis=2), o.max(axis=2)      # (tiles, 8, 3)
    d_lo, d_hi = dd.min(axis=2), dd.max(axis=2)
    t_hi = te.max(axis=2)                           # (tiles, 8)

    total_entries = 0
    total_liverows = 0
    hist = np.zeros(9, dtype=np.int64)
    for t0 in range(0, tiles, 128):
        t1 = min(t0 + 128, tiles)
        cnt = counts_np[t0:t1]
        ent = lists_np[t0:t1] & ((1 << cb) - 1)     # (bt, maxv)
        k = np.arange(maxv)[None, :]
        validk = k < cnt[:, None]
        bmin = cm[ent]                               # (bt, maxv, 3)
        bmax = cx[ent]
        live_rows = np.zeros(ent.shape, dtype=np.int32)
        for rrow in range(8):
            near = np.full(ent.shape, -np.inf)
            far = np.where(validk, t_hi[t0:t1, rrow][:, None], -np.inf)
            for a in range(3):
                lo = bmin[:, :, a] - o_hi[t0:t1, rrow, a][:, None]
                hi = bmax[:, :, a] - o_lo[t0:t1, rrow, a][:, None]
                dl = d_lo[t0:t1, rrow, a][:, None]
                dh = d_hi[t0:t1, rrow, a][:, None]
                strad = (dl <= 0) & (dh >= 0)
                rdl = 1.0 / np.where(np.abs(dl) < 1e-20, 1e-20, dl)
                rdh = 1.0 / np.where(np.abs(dh) < 1e-20, 1e-20, dh)
                q = np.stack([lo * rdl, lo * rdh, hi * rdl, hi * rdh])
                na, fa = q.min(axis=0), q.max(axis=0)
                na = np.where(strad, -np.inf, na)
                fa = np.where(strad, np.inf, fa)
                near = np.maximum(near, na)
                far = np.minimum(far, fa)
            live_rows += (near <= far).astype(np.int32)
        lr = live_rows[validk]
        total_entries += lr.size
        total_liverows += int(lr.sum())
        for v in range(9):
            hist[v] += int((lr == v).sum())

    print(f"tiles={tiles} entries={total_entries} "
          f"(mean visits/tile {total_entries/tiles:.1f})")
    print(f"live rows/entry: mean={total_liverows/max(total_entries,1):.2f} "
          f"(8 = no win; MT work scales with this /8)")
    print("hist rows->entries:", {i: int(hist[i]) for i in range(9)})


if __name__ == "__main__":
    main()
