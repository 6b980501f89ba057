"""Golden-image regression (SURVEY §4 items 1/5; BASELINE '<1% RMSE').

Renders golden modes and compares against the committed images.
Deterministic modes must match near-exactly; PATH (MC with deterministic
RNG streams) gets fp-reordering headroom.  Regenerate after *intentional*
changes with: python tests/goldens/generate.py

Fast tier covers three representative modes (each mode is a separate jit
compile, which dominates runtime on CPU); the rest run under `-m slow`.
"""

import os

import numpy as np
import pytest

from tests.goldens.generate import GALLERY_MODES, MODES, SIZE, render_all, render_gallery

HERE = os.path.dirname(os.path.abspath(__file__))
_FAST = ("mask", "normal", "ltc_direct")
_CACHE: dict = {}


def _render_one(name, tmp_path_factory):
    if "scene_dir" not in _CACHE:
        _CACHE["scene_dir"] = str(tmp_path_factory.mktemp("golden_scene"))
    if name not in _CACHE:
        if name in GALLERY_MODES:
            _CACHE[name] = render_gallery(only=[name])[name]
        else:
            _CACHE[name] = render_all(_CACHE["scene_dir"], only=[name])[name]
    return _CACHE[name]


def _check(name, got):
    ref_path = os.path.join(HERE, f"{name}.npy")
    assert os.path.exists(ref_path), "golden missing — run tests/goldens/generate.py"
    want = np.load(ref_path)
    assert got.shape == want.shape
    scale = max(float(np.abs(want).mean()), 1e-6)
    rmse = float(np.sqrt(((got - want) ** 2).mean())) / scale
    tol = 5e-3 if name == "path" else 1e-4  # <1% RMSE target with margin
    assert rmse < tol, f"{name}: relative RMSE {rmse:.6f} exceeds {tol}"


@pytest.mark.parametrize("name", sorted(_FAST))
def test_golden(name, tmp_path_factory):
    _check(name, _render_one(name, tmp_path_factory))


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(set(MODES) - set(_FAST)))
def test_golden_full(name, tmp_path_factory):
    _check(name, _render_one(name, tmp_path_factory))


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(GALLERY_MODES))
def test_golden_gallery(name, tmp_path_factory):
    """Textured multi-mesh gallery regression (scenes/gallery — the
    Model.cpp:164-242 loader workload rendered end-to-end)."""
    _check(name, _render_one(name, tmp_path_factory))
