"""TPU-only tests: restore the container's original platform (the repo
root conftest pins CPU for the portable suite).

The restore happens ONLY when the pytest invocation targets tests/tpu
exclusively (e.g. `pytest tests/tpu`) — conftests load for the whole
tree, and flipping the platform during a full `pytest tests/` run would
drag every CPU test over the TPU tunnel.
"""

import os


def pytest_configure(config):
    args = [a.split("::")[0] for a in config.args if not a.startswith("-")]
    if not args or not all("tests/tpu" in os.path.abspath(a) for a in args):
        return
    orig = os.environ.get("OPTIX_TPU_ORIG_PLATFORMS", "")
    if orig and orig != "cpu":
        import jax

        try:
            jax.config.update("jax_platforms", orig)
        except Exception:
            pass  # backend already initialized -> tests skip via marker
