"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env before the first jax import (SURVEY.md §4: multi-chip sharding
is validated on forced host devices; real-TPU perf is bench.py's job).
"""

import os

# The container pins JAX_PLATFORMS=axon (TPU tunnel); override hard — tests
# must never cross the tunnel op-by-op.  (tests/tpu restores the original
# platform for the opt-in hardware suite.)
os.environ.setdefault("OPTIX_TPU_ORIG_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: the suite is compile-dominated (~40 jit
# configs); reruns drop from ~8 min to ~2 min.
jax.config.update("jax_compilation_cache_dir", "/tmp/optix_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
