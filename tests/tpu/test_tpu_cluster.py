"""Opt-in hardware validation of the CLUSTERED traversal tier.

The default suite oracle-tests ``accel/pallas_cluster.py`` only in
Pallas interpret mode on CPU; interpret mode is not Mosaic, so a
lowering bug in the real TPU compile (the class the round-1 bf16
regression belonged to) would ship invisibly.  This test renders a
>4096-triangle terrain, which routes every trace through the REAL
Mosaic lowering of the cluster tier — tile cull (two-level
supercluster), packed-key closest kernel with the cluster DMA ring,
per-lane cull + coherence sort for bounce rays, any-hit kernel for NEE
shadows, and the checked overflow fallback — and compares against the
CPU skip-link-walk oracle tier (same dispatch as the reference's
hardware-executed traversal, viewer.hpp:506-517).

Run explicitly with: `python -m pytest tests/tpu -q` (default env).
"""

import os
import subprocess
import sys
import tempfile

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="needs a TPU-like backend"
)

_RENDER = """
import os
os.environ["JAX_PLATFORMS"] = "{platform}"
import jax
jax.config.update("jax_platforms", "{platform}")
import numpy as np
from optix_renderer_tpu.engine.modes import RendererType
from optix_renderer_tpu.engine.renderer import Renderer
from optix_renderer_tpu.scene.config import parse_scene
scene = parse_scene({scene!r})
r = Renderer(scene, width=128, height=128, mode=RendererType.PATH, path_depth=3)
r.render(2)
np.save({out!r}, r.image())
np.save({out!r} + ".pos.npy", np.asarray(r.gbuffers.position))
"""


def _scene_json() -> str:
    from optix_renderer_tpu.scene.procedural import write_terrain_scene

    d = os.path.join(tempfile.gettempdir(), "tpu_cluster_terrain_100")
    path = os.path.join(d, "scene.json")
    if not os.path.exists(path):
        write_terrain_scene(d, grid=100, width=128, height=128)
    return path


def test_tpu_cluster_tier_matches_cpu(tmp_path):
    # force the TWO-LEVEL culls even at this scene's ~330 clusters, so
    # the hardware run covers the supercluster paths too (the gate is
    # normally 4096 clusters; both renders below inherit the override,
    # and list contents are identical either way — see the unit tests)
    os.environ["OPTIX_TPU_TWO_LEVEL_MIN_C"] = "1"
    from optix_renderer_tpu.accel import pallas_cluster as pc

    pc._TWO_LEVEL_MIN_C = 1

    scene_path = _scene_json()
    cpu = str(tmp_path / "cpu.npy")
    code = _RENDER.format(platform="cpu", scene=scene_path, out=cpu)
    subprocess.run([sys.executable, "-c", code], check=True, cwd="/root/repo")

    # render in-process on the default (TPU) backend: >4096 tris routes
    # through accel.pallas_cluster (real Mosaic compile, not interpret)
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.scene.config import parse_scene

    scene = parse_scene(scene_path)
    r = Renderer(scene, width=128, height=128, mode=RendererType.PATH, path_depth=3)
    assert r.bvh.tri_v0.shape[0] > 4096  # really the cluster tier
    r.render(2)

    a = np.load(cpu)
    b = np.asarray(r.image())
    pa = np.load(cpu + ".pos.npy")
    pb = np.asarray(r.gbuffers.position)
    # primary-hit positions: the cluster kernel + exact decode must agree
    # with the walk oracle to fp-order noise (scene units are ~550)
    assert np.abs(pa - pb).max() < 1e-2, np.abs(pa - pb).max()
    # MC image: identical RNG streams; differences are fp-order only
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    rel = rmse / max(float(a.mean()), 1e-9)
    assert rel < 5e-3, (rmse, rel)


_RENDER_PRIMARY = """
import os
import numpy as np
from optix_renderer_tpu.engine.modes import RendererType
from optix_renderer_tpu.engine.renderer import Renderer
from optix_renderer_tpu.scene.config import parse_scene
scene = parse_scene({scene!r})
r = Renderer(scene, width=128, height=128, mode=RendererType.NORMALS)
r.render(1)
np.save({out!r}, np.asarray(r.gbuffers.position))
"""


def test_tpu_baked_mt_matches_unbaked(tmp_path):
    """The shared-origin baked Moller-Trumbore table (default-on,
    renderer.py:105 / pallas_cluster.bake_shared_origin_tab) must
    produce the same primary hits as the general MT path on REAL
    Mosaic lowering — the round-4 change landed with interpret-mode
    coverage only (ADVICE r4 medium)."""
    scene_path = _scene_json()
    pos = {}
    for flag in ("1", "0"):
        out = str(tmp_path / f"baked{flag}.npy")
        code = _RENDER_PRIMARY.format(scene=scene_path, out=out)
        env = dict(os.environ, OPTIX_TPU_BAKED_MT=flag)
        subprocess.run([sys.executable, "-c", code], check=True,
                       cwd="/root/repo", env=env)
        pos[flag] = np.load(out)
    d = np.abs(pos["1"] - pos["0"]).max()
    # same Moller-Trumbore products re-associated; winners tied within
    # the key quantum may swap, so use the cluster-vs-oracle tolerance
    assert d < 1e-2, d
