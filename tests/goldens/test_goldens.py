"""Golden-image regression (SURVEY §4 items 1/5; BASELINE '<1% RMSE').

Renders every golden mode and compares against the committed images.
Deterministic modes must match near-exactly; PATH (MC with deterministic
RNG streams) gets fp-reordering headroom.  Regenerate after *intentional*
changes with: python tests/goldens/generate.py
"""

import os

import numpy as np
import pytest

from tests.goldens.generate import MODES, SIZE, render_all

HERE = os.path.dirname(os.path.abspath(__file__))


@pytest.fixture(scope="module")
def rendered(tmp_path_factory):
    return render_all(str(tmp_path_factory.mktemp("golden_scene")))


@pytest.mark.parametrize("name", sorted(MODES))
def test_golden(name, rendered):
    ref_path = os.path.join(HERE, f"{name}.npy")
    assert os.path.exists(ref_path), f"golden missing — run tests/goldens/generate.py"
    want = np.load(ref_path)
    got = rendered[name]
    assert got.shape == want.shape
    scale = max(float(np.abs(want).mean()), 1e-6)
    rmse = float(np.sqrt(((got - want) ** 2).mean())) / scale
    tol = 5e-3 if name == "path" else 1e-4  # <1% RMSE target with margin
    assert rmse < tol, f"{name}: relative RMSE {rmse:.6f} exceeds {tol}"
