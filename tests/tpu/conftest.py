"""TPU-only tests: do NOT inherit the repo conftest's CPU pin.

These tests run on real hardware (opt-in): `pytest tests/tpu` with the
container's default platform. They are skipped automatically when no
TPU-like backend is available.
"""
