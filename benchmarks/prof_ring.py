"""DMA-ring depth A/B for the INCOHERENT (bounce) closest trace.

prof_path round-5 measured the terrain bounce closest kernel at ~2.4
us/visit vs the coherent kernel's ~0.74: bounce visit lists are
SCATTERED cluster ids (corridor-sorted rays pull clusters from across
the scene), so the (8,128)-block cluster DMAs are latency-bound and the
default ring (_PF_GROUPS=2 x _VISIT_GROUP=4 = 8 blocks in flight) may
not cover HBM latency.  This sweeps ring configs by monkeypatching the
module constants (read at trace time) and re-jitting.

Usage: python benchmarks/prof_ring.py [grid]
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
    from optix_renderer_tpu.core import math as cm
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
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.PATH,
                 path_depth=4, bvh_cache_dir="/tmp/bvhcache-bench")
    ds, bvh = r.device_scene, r.bvh
    print(f"tris={bvh.tri_v0.shape[0]} clusters={bvh.cluster_min.shape[0]}")

    W = H = 1024
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    si, _ = jax.jit(lambda d_, b, ry: trace_closest_si(d_, b, ry))(ds, bvh, rays)

    rs, u1 = rnglib.lcg_randomf(rs)
    rs, u2 = rnglib.lcg_randomf(rs)
    to_l, to_w = cm.orthonormal_basis(si.n_geom)
    wi = cm.cosine_sample_hemisphere_concentric(u1, u2)
    dirs = cm.normalize(cm.apply_mat(to_w, wi), eps=1e-30)
    brays = Ray(origin=si.p + si.n_geom * 1e-3, direction=dirs)
    alive = si.hit & ~si.is_light
    brays = jax.block_until_ready(brays)

    base = None
    ref = None
    for vg, pf in [(4, 2), (4, 8), (8, 4), (4, 16), (8, 8)]:
        pc._VISIT_GROUP = vg
        pc._PF_GROUPS = pf
        pc._N_BUF = (pf + 1) * vg
        f = jax.jit(lambda d_, b, ry, act: trace_closest_si(
            d_, b, ry, coherent=False, active=act)[0])
        res, out = timeit(f, ds, bvh, brays, alive, iters=4, warmup=1)
        t = res["amortized_s"]
        line = (f"VG={vg} PF={pf} (N_BUF={(pf+1)*vg}): {t*1e3:7.1f} ms"
                + (f"  x{base/t:.2f}" if base else ""))
        if base is None:
            base = t
            ref = np.asarray(out.p)
        else:
            dp = np.abs(np.asarray(out.p) - ref).max()
            line += f"  max|dp|={dp:.3g}"
        print(line, flush=True)


if __name__ == "__main__":
    main()
