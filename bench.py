"""Headline benchmark: PATH-mode Cornell box at 1024x1024 on one chip.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N/100}
All progress/diagnostics go to stderr.

Ray accounting is honest and matches engine/renderer.py:504-509: the path
integrator reports per-bounce counts shaped (depth, 3) =
[alive lanes, shadow rays traced, bounce rays traced]
(integrators/path.py), and a frame traces
  width*height primary rays + sum(columns 1:) actually-traced rays.
NEE shadow rays with provably-zero contribution and dead-lane bounce rays
are NOT traced and NOT counted.

Robustness (the round-4 driver run timed out with no output — the axon
tunnel has documented multi-minute stall events):
  * stage A first: a 512^2 few-frame config that produces a valid
    headline number within ~2 min even on a cold compile;
  * stage B: the full 1024^2 16-frame config, which replaces stage A's
    number when it completes;
  * stage A compiles ONE program (chained single-frame dispatches);
    the ~80 s/program tunnel remote-compile is the dominant cold cost;
  * a watchdog thread prints the best result so far and hard-exits at
    BENCH_DEADLINE_S (default 330 s) so a tunnel stall can never turn
    into rc=124 with parsed=null;
  * a persistent XLA compilation cache under .jax_cache (helps when the
    backend honors it; the axon remote-compile path does not, so the
    watchdog — not the cache — is the real guarantee).

BASELINE.md: the reference publishes no numbers (its only metric surface
is the ImGui FPS readout, /root/reference/include/viewer.hpp:667); the
driver's north star is >100 Mrays/s/chip on v5e, so vs_baseline =
value / 100.

Second config (BASELINE config 5 class): ``BENCH_SCENE=terrain`` benches
primary-ray trace+shade on the ~1M-triangle terrain stress scene through
the clustered Pallas tier (``BENCH_TERRAIN_GRID`` to resize, e.g. 224 for
~100k tris).
"""

import json
import os
import sys
import threading
import time

HERE = os.path.dirname(os.path.abspath(__file__))

# Persistent compilation cache: harmless if the backend ignores it,
# saves ~2 min of PATH compiles when it doesn't.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(HERE, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

import jax  # noqa: E402
import numpy as np  # noqa: E402

_t0 = time.perf_counter()
_result_lock = threading.Lock()
_best_result = None  # last completed stage's JSON dict


def _log(msg):
    print(f"[bench +{time.perf_counter() - _t0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit_and_exit(code=0):
    with _result_lock:
        res = _best_result
    if res is not None:
        print(json.dumps(res), flush=True)
    os._exit(code if res is not None else 1)


def _arm_watchdog(deadline_s):
    def fire():
        _log(f"watchdog: deadline {deadline_s}s reached, emitting best result so far")
        _emit_and_exit(0)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()
    return t


def _record(res):
    global _best_result
    with _result_lock:
        _best_result = res


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
    _log("terrain: compiling + warmup")
    si, _ = f(r.device_scene, r.bvh, rays)
    float(si.p[0, 0])  # 4-byte D2H: the only reliable sync on the axon
    # tunnel backend (block_until_ready returns before execution there)
    _log("terrain: timing")
    t0 = time.perf_counter()
    iters = 8
    for _ in range(iters):
        si, _ = f(r.device_scene, r.bvh, rays)
    float(si.p[0, 0])
    dt = (time.perf_counter() - t0) / iters
    mrays = n / dt / 1e6
    tris = r.device_scene.num_tris
    _record({
        "metric": f"primary trace+shade, {tris}-tri terrain (clustered Pallas tier), Mrays/sec/chip on {jax.devices()[0].device_kind}",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 100.0, 4),
    })
    _emit_and_exit(0)


def _honest_rays_per_frame(r, width, height):
    """Per-frame ray count matching engine/renderer.py:504-509.

    (depth, 3) columns = [alive, shadow traced, bounce traced]; only
    columns 1: are rays actually traced (NEE zero-contribution shadow
    rays and dead-lane bounce rays are skipped and not counted).
    """
    alive = np.asarray(r.aux["path_alive_counts"], np.int64)
    assert alive.ndim == 2 and alive.shape[1] == 3, alive.shape
    return width * height + int(alive[:, 1:].sum())


def _cornell_path_chained(width, height, depth, frames, scene):
    """Single-compile stage: warm ONE single-frame program, then chain
    ``frames`` dispatches with one scalar-fetch sync (the run_configs
    time_frame convention).  Compiles half of what the scan stage does
    (~80 s/program over the tunnel's remote compile, the dominant cost
    of a cold bench run), at the price of per-dispatch overhead that
    slightly UNDERSTATES throughput — this stage is the guaranteed
    fallback number, not the headline.
    """
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer

    _log(f"stage A {width}x{height} depth={depth}: build renderer")
    r = Renderer(scene, width=width, height=height, mode=RendererType.PATH,
                 path_depth=depth)
    _log("stage A: warmup render(1) (compiles ONE program)")
    r.render(1)  # render() ends with a scalar-fetch sync
    rays_per_frame = _honest_rays_per_frame(r, width, height)
    _log(f"stage A: timing {frames} chained frames ({rays_per_frame} rays/frame)")
    state = r.state
    t0 = time.perf_counter()
    for _ in range(frames):
        state, _gb, _aux = r._frame(state, r.device_scene, r.bvh)
    float(state.accum[0, 0, 0])
    dt = time.perf_counter() - t0
    mrays = rays_per_frame * frames / dt / 1e6
    _log(f"stage A done: {mrays:.1f} Mrays/s ({dt:.2f}s for {frames} frames)")
    return mrays


def _cornell_path_stage(width, height, depth, frames, scene):
    """Headline stage: timed multi-frame scan render (2 compiles)."""
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer

    _log(f"stage {width}x{height} depth={depth} frames={frames}: build renderer")
    r = Renderer(scene, width=width, height=height, mode=RendererType.PATH,
                 path_depth=depth)
    # warmup / compile BOTH paths the timed call uses (the multi-frame
    # scan and the single tail frame), then restart accumulation
    _log("warmup render (compiles)")
    r.render(frames)
    float(r.state.accum[0, 0, 0])  # real sync: see bench_terrain note
    rays_per_frame = _honest_rays_per_frame(r, width, height)
    r.set_camera(r.scene.cameras[0])
    _log(f"timing ({rays_per_frame} rays/frame)")

    t0 = time.perf_counter()
    r.render(frames)
    float(r.state.accum[0, 0, 0])
    dt = time.perf_counter() - t0
    mrays = rays_per_frame * frames / dt / 1e6
    _log(f"done: {mrays:.1f} Mrays/s ({dt:.2f}s for {frames} frames)")
    return mrays


def main():
    if os.environ.get("BENCH_SCENE") == "terrain":
        return bench_terrain()
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "330"))
    _arm_watchdog(deadline)
    depth = int(os.environ.get("BENCH_DEPTH", "4"))

    from optix_renderer_tpu.scene.config import parse_scene
    from optix_renderer_tpu.scene.procedural import write_cornell_scene

    scene_path = os.path.join(HERE, "scenes", "cornell", "scene.json")
    if not os.path.exists(scene_path):
        import tempfile

        scene_path = write_cornell_scene(tempfile.mkdtemp())
    scene = parse_scene(scene_path)
    kind = jax.devices()[0].device_kind
    _log(f"device: {kind}")

    if "BENCH_RES" in os.environ:  # explicit single-config run
        res = int(os.environ["BENCH_RES"])
        frames = int(os.environ.get("BENCH_FRAMES", "16"))
        mrays = _cornell_path_stage(res, res, depth, frames, scene)
        _record({
            "metric": f"PATH {depth}-bounce MIS Cornell {res}x{res}, Mrays/sec/chip on {kind}",
            "value": round(mrays, 2),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays / 100.0, 4),
        })
        return _emit_and_exit(0)

    # stage A: ONE compile — guarantees a valid JSON line early even on
    # a cold compile + noisy tunnel (~90-120 s typical)
    mrays_a = _cornell_path_chained(512, 512, depth, 16, scene)
    _record({
        "metric": f"PATH {depth}-bounce MIS Cornell 512x512 (chained dispatch), Mrays/sec/chip on {kind}",
        "value": round(mrays_a, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays_a / 100.0, 4),
    })
    # stage B: the headline 1024^2 config
    try:
        mrays_b = _cornell_path_stage(1024, 1024, depth, 16, scene)
        _record({
            "metric": f"PATH {depth}-bounce MIS Cornell 1024x1024, Mrays/sec/chip on {kind}",
            "value": round(mrays_b, 2),
            "unit": "Mrays/s",
            "vs_baseline": round(mrays_b / 100.0, 4),
        })
    except Exception as e:  # stage A's number still stands
        _log(f"stage B failed ({e!r}); keeping stage A result")
    _emit_and_exit(0)


if __name__ == "__main__":
    sys.exit(main())
