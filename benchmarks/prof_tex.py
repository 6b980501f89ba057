"""Texture-tap microbench: how should the bilinear gather be laid out?

prof_gallery measured 10 ms per 262k-lane bilinear sample (4 row
gathers from the (P, 4) f32 pool) — ~38%% of the gallery PATH frame
(textures are sampled in every trace+shade pass).  Compares:

  a) current: 4x row gather from (P, 4) f32
  b) packed:  4x scalar gather from (P,) uint32 (RGBA8) + VPU unpack
  c) nearest: 1x row gather from (P, 4) f32 (lower bound / quality knob)

Usage: python benchmarks/prof_tex.py
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit  # noqa: E402

N = 262144
P = 4 * 512 * 512


def main():
    rng = np.random.default_rng(0)
    pool_f32 = jnp.asarray(rng.random((P, 4), dtype=np.float32))
    packed_np = (rng.integers(0, 2**32, size=(P,), dtype=np.uint64)).astype(np.uint32)
    pool_u32 = jnp.asarray(packed_np)
    idx = jnp.asarray(rng.integers(0, P - 1, size=(4, N)), jnp.int32)

    def a(ix):
        t00 = pool_f32[ix[0]]
        t01 = pool_f32[ix[1]]
        t10 = pool_f32[ix[2]]
        t11 = pool_f32[ix[3]]
        return (t00 + t01 + t10 + t11).sum()

    def b(ix):
        def unpack(p):
            p = p.astype(jnp.uint32)
            r = (p & 0xFF).astype(jnp.float32)
            g = ((p >> 8) & 0xFF).astype(jnp.float32)
            bl = ((p >> 16) & 0xFF).astype(jnp.float32)
            al = ((p >> 24) & 0xFF).astype(jnp.float32)
            return jnp.stack([r, g, bl, al], axis=-1) * (1.0 / 255.0)

        t00 = unpack(pool_u32[ix[0]])
        t01 = unpack(pool_u32[ix[1]])
        t10 = unpack(pool_u32[ix[2]])
        t11 = unpack(pool_u32[ix[3]])
        return (t00 + t01 + t10 + t11).sum()

    def c(ix):
        return pool_f32[ix[0]].sum()

    for name, f in (("a 4x row f32", a), ("b 4x scalar u32+unpack", b),
                    ("c 1x row f32 (nearest)", c)):
        res, _ = timeit(jax.jit(f), idx, iters=8, warmup=2)
        print(f"{name}: {res['amortized_s']*1e3:7.2f} ms", flush=True)

    # scaling: fixed-per-pass or per-element?  (decides whether
    # spp-batched tracing amortizes the texture cost)
    idx4 = jnp.asarray(rng.integers(0, P - 1, size=(4, 4 * N)), jnp.int32)
    res, _ = timeit(jax.jit(a), idx4, iters=8, warmup=2)
    print(f"a 4x row f32 at 4N lanes: {res['amortized_s']*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
