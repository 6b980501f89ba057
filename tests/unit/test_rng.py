"""Bit-exactness tests for the LCG RNG against a pure-Python uint32 oracle.

The oracle mirrors cuda_include/lcg_random.cuh word for word in Python
integer arithmetic (mod 2^32), so any deviation in the jnp implementation
is caught at the bit level (SURVEY.md §4 test strategy)."""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.core import rng

M32 = 0xFFFFFFFF


def py_murmur_mix(h, k):
    k = (k * 0xCC9E2D51) & M32
    k = ((k << 15) | (k >> 17)) & M32
    k = (k * 0x1B873593) & M32
    h ^= k
    h = ((h << 13) | (h >> 19)) & M32
    return (h * 5 + 0xE6546B64) & M32


def py_murmur_finalize(h):
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & M32
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & M32
    return h ^ (h >> 16)


def py_get_rng(frame_id, linear_idx):
    s = py_murmur_mix(0, linear_idx)
    s = py_murmur_mix(s, frame_id)
    return py_murmur_finalize(s)


def py_lcg(state):
    return (state * 1664525 + 1013904223) & M32


def py_randomf(state):
    state = py_lcg(state)
    # CUDA (float)uint32 rounds to nearest even; np.float32 does the same.
    return state, float(np.float32(np.float32(state) * np.float32(2.0**-32)))


def test_seed_bit_exact():
    pixels = np.array([0, 1, 2, 1023, 1024, 12345, 1048575], dtype=np.uint32)
    for frame in [10007, 10008, 99999]:
        got = np.asarray(rng.make_rng(frame, jnp.asarray(pixels)))
        want = np.array([py_get_rng(frame, int(p)) for p in pixels], dtype=np.uint32)
        np.testing.assert_array_equal(got, want)


def test_lcg_sequence_bit_exact():
    state0 = py_get_rng(10007, 42)
    s = state0
    want_states, want_floats = [], []
    for _ in range(64):
        s, f = py_randomf(s)
        want_states.append(s)
        want_floats.append(f)

    js = jnp.asarray(np.uint32(state0))
    got_states, got_floats = [], []
    for _ in range(64):
        js, f = rng.lcg_randomf(js)
        got_states.append(int(js))
        got_floats.append(float(f))

    np.testing.assert_array_equal(got_states, want_states)
    np.testing.assert_array_equal(
        np.asarray(got_floats, np.float32), np.asarray(want_floats, np.float32)
    )


def test_uniformity():
    idx = jnp.arange(4096, dtype=jnp.uint32)
    s = rng.make_rng(0, idx)
    s, u = rng.lcg_randomf(s)
    u = np.asarray(u)
    assert (u >= 0).all() and (u < 1).all()
    assert abs(u.mean() - 0.5) < 0.02
