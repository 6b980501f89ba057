"""Opt-in hardware smoke test: the TPU render (Pallas trace kernels +
MXU one-hot gathers) must match the CPU render (jnp lowerings) within
tight f32 tolerance — this is the check that would have caught the
round-1 bf16 one-hot gather regression (ADVICE r1, high).

Run explicitly with: `python -m pytest tests/tpu -q` (default env).
The CPU reference is computed in a subprocess so both backends can
coexist in one pytest invocation.
"""

import json
import os
import subprocess
import sys

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
r = Renderer(scene, width=96, height=96, mode=RendererType.PATH, path_depth=3)
r.render(2)
np.save({out!r}, r.image())
np.save({out!r} + ".pos.npy", np.asarray(r.gbuffers.position))
"""


def _render(platform: str, out: str) -> None:
    scene = os.path.join(os.path.dirname(__file__), "..", "..", "scenes", "cornell", "scene.json")
    code = _RENDER.format(platform=platform, scene=os.path.abspath(scene), out=out)
    subprocess.run([sys.executable, "-c", code], check=True, cwd="/root/repo")


def test_tpu_matches_cpu(tmp_path):
    cpu = str(tmp_path / "cpu.npy")
    tpu = str(tmp_path / "tpu.npy")
    _render("cpu", cpu)

    # render in-process on the default (TPU) backend
    from optix_renderer_tpu.engine.modes import RendererType
    from optix_renderer_tpu.engine.renderer import Renderer
    from optix_renderer_tpu.scene.config import parse_scene

    scene = parse_scene("/root/repo/scenes/cornell/scene.json")
    r = Renderer(scene, width=96, height=96, mode=RendererType.PATH, path_depth=3)
    r.render(2)
    np.save(tpu, r.image())
    np.save(tpu + ".pos.npy", np.asarray(r.gbuffers.position))

    a, b = np.load(cpu), np.load(tpu)
    pa, pb = np.load(cpu + ".pos.npy"), np.load(tpu + ".pos.npy")
    # g-buffer positions: exact-precision gathers -> sub-1e-2 in 550-unit units
    assert np.abs(pa - pb).max() < 1e-2, np.abs(pa - pb).max()
    # MC image: identical RNG streams; differences are fp-order only.
    rmse = float(np.sqrt(((a - b) ** 2).mean()))
    rel = rmse / max(float(a.mean()), 1e-9)
    assert rel < 5e-3, (rmse, rel)
