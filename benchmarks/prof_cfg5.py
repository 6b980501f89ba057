"""Config 5/5b focused timing: terrain primary frame + PATH depth-4 frame.

Mimics run_configs.py's conventions exactly (time_frame chained
dispatches for 5, one warm self-syncing render(1) for 5b) without paying
the other configs' compiles — for fast A/B of cluster-tier changes.

Usage: python benchmarks/prof_cfg5.py [grid] [--skip-path]
"""

import os
import sys
import tempfile
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402


def main():
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    grid = int(pos[0]) if pos else 708
    d = os.path.join(tempfile.gettempdir(), f"bench_terrain_{grid}")
    if not os.path.exists(os.path.join(d, "scene.json")):
        write_terrain_scene(d, grid=grid)
    scene = parse_scene(os.path.join(d, "scene.json"))

    r = Renderer(scene, width=1024, height=1024, mode=RendererType.NORMALS,
                 bvh_cache_dir="/tmp/bvhcache-bench")
    n = 1024 * 1024
    print(f"tris={r.device_scene.num_tris} baked={'yes' if r._baked_tab is not None else 'no'}")

    box = {"s": r.state}

    def step():
        s, _gb, _aux = r._frame(box["s"], r.device_scene, r.bvh)
        box["s"] = s
        return s.accum

    res, _ = timeit(step, iters=8)
    print(f"config 5 primary frame: cold {res['cold_s']*1e3:.1f} ms, "
          f"amortized {res['amortized_s']*1e3:.1f} ms -> "
          f"{n/res['amortized_s']/1e6:.2f} Mrays/s")

    if "--skip-path" not in sys.argv:
        r5p = Renderer(scene, width=1024, height=1024, mode=RendererType.PATH,
                       path_depth=4, bvh_cache_dir="/tmp/bvhcache-bench")
        r5p.render(1)  # warm compile
        m0 = dict(r5p.metrics)
        t0 = time.perf_counter()
        r5p.render(1)
        t_frame = time.perf_counter() - t0
        rays = dict(r5p.metrics)["rays_traced"] - m0["rays_traced"]
        print(f"config 5b PATH depth-4 frame: {t_frame:.2f} s "
              f"({rays} rays -> {rays/t_frame/1e6:.2f} Mrays/s)")
        st = {k: int(np.asarray(v)) if np.ndim(v) == 0 else v
              for k, v in r5p.metrics.items() if k.startswith("cull")}
        print(f"  cull stats: {st}")


if __name__ == "__main__":
    main()
