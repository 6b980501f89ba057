"""Headline benchmark: PATH-mode Cornell box at 1024x1024 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/100}

Runs on whatever jax.devices() provides (the real TPU chip under the
driver; CPU if forced).  The headline metric is Mrays/sec/chip with rays
counted honestly: primary rays + 2 rays (NEE shadow + BSDF bounce) per
*alive* lane per bounce, using the per-bounce alive counts the path
integrator reports (integrators/path.py).

BASELINE.md: the reference publishes no numbers; the driver's north star
is >100 Mrays/s/chip on v5e, so vs_baseline = value / 100.

Second config (BASELINE config 5 class): ``BENCH_SCENE=terrain`` benches
primary-ray trace+shade on the ~1M-triangle terrain stress scene through
the clustered Pallas tier (``BENCH_TERRAIN_GRID`` to resize, e.g. 224 for
~100k tris).
"""

import json
import os
import sys
import time

import jax
import numpy as np


def bench_terrain():
    """Big-scene tier: primary trace+shade Mrays/s on the terrain scene."""
    import tempfile

    import jax.numpy as jnp

    from optix_renderer_tpu.core import rng as rnglib
    from optix_renderer_tpu.engine import camera as cameralib
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.engine.shade import trace_closest_si
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    grid = int(os.environ.get("BENCH_TERRAIN_GRID", "708"))
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))
    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS)
    W = H = 1024
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    lin = jnp.moveaxis(lin.reshape(H // 32, 32, W // 32, 32), 1, 2).reshape(n)
    rs = rnglib.make_rng(10007, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    # scene/BVH as jit ARGUMENTS: closing over them bakes ~370 MB of
    # tables into the HLO as constants, which the axon remote-compile
    # request rejects (HTTP 413); per-call pytree dispatch costs ~1 ms
    f = jax.jit(lambda d, b, ry: trace_closest_si(d, b, ry))
    si, _ = f(r.device_scene, r.bvh, rays)
    float(si.p[0, 0])  # 4-byte D2H: the only reliable sync on the axon
    # tunnel backend (block_until_ready returns before execution there)
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        si, _ = f(r.device_scene, r.bvh, rays)
    float(si.p[0, 0])
    dt = (time.perf_counter() - t0) / iters
    mrays = n / dt / 1e6
    tris = r.device_scene.num_tris
    print(json.dumps({
        "metric": f"primary trace+shade, {tris}-tri terrain (clustered Pallas tier), Mrays/sec/chip on {jax.devices()[0].device_kind}",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
    }))


def main():
    if os.environ.get("BENCH_SCENE") == "terrain":
        return bench_terrain()
    width = height = int(os.environ.get("BENCH_RES", "1024"))
    depth = int(os.environ.get("BENCH_DEPTH", "4"))
    frames = int(os.environ.get("BENCH_FRAMES", "16"))

    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_cornell_scene

    here = os.path.dirname(os.path.abspath(__file__))
    scene_path = os.path.join(here, "scenes", "cornell", "scene.json")
    if not os.path.exists(scene_path):
        import tempfile

        scene_path = write_cornell_scene(tempfile.mkdtemp())
    scene = parse_scene(scene_path)

    r = Renderer(scene, width=width, height=height, mode=RendererType.PATH, path_depth=depth)

    # warmup / compile BOTH paths the timed call uses (the multi-frame
    # scan and the single tail frame), then restart accumulation
    r.render(frames)
    float(r.state.accum[0, 0, 0])  # real sync: see bench_terrain note
    alive = np.asarray(r.aux["path_alive_counts"], np.int64)
    rays_per_frame = width * height + 2 * int(alive.sum())
    r.set_camera(r.scene.cameras[0])

    t0 = time.perf_counter()
    r.render(frames)
    float(r.state.accum[0, 0, 0])
    dt = time.perf_counter() - t0

    mrays = rays_per_frame * frames / dt / 1e6
    print(
        json.dumps(
            {
                "metric": f"PATH {depth}-bounce MIS Cornell {width}x{height}, Mrays/sec/chip on {jax.devices()[0].device_kind}",
                "value": round(mrays, 2),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 100.0, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
