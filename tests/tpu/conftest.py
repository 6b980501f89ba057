"""TPU-only tests: restore the container's original platform (the repo
root conftest pins CPU for the portable suite).

Run explicitly with: `pytest tests/tpu`.  When the whole tree runs at
once (`pytest tests/`), another test has usually initialized the CPU
backend already and these tests skip via their backend marker.
"""

import os

import jax

_orig = os.environ.get("OPTIX_TPU_ORIG_PLATFORMS", "")
if _orig and _orig != "cpu":
    try:
        jax.config.update("jax_platforms", _orig)
    except Exception:
        pass  # backend already initialized (full-tree run) -> tests skip
