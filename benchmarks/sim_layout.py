"""Quantify the TPU layout tax on (N, 3) vector arrays.

The repo's hot paths were componentwized one call site at a time after
individual measurements ("a trailing xyz triple pads 3 -> 128 lanes").
This measures the tax directly, at 1M rays, for the representative op
shapes the pipeline uses, to decide whether the Ray/Hit containers
themselves should switch to componentwise storage.

Usage: python benchmarks/sim_layout.py   (on the TPU)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from optix_renderer_tpu.utils.timing import timeit

N = 1 << 20


def main():
    key = jax.random.PRNGKey(0)
    o3 = jax.random.normal(key, (N, 3), jnp.float32)
    d3 = jax.random.normal(key, (N, 3), jnp.float32)
    t = jax.random.uniform(key, (N,), jnp.float32)
    oc = [o3[:, a] for a in range(3)]
    dc = [d3[:, a] for a in range(3)]
    o3 = jax.block_until_ready(o3)

    # 1. pure read: reduce-sum
    res, _ = timeit(jax.jit(lambda x: x.sum()), o3)
    print(f"sum (N,3):        {res['amortized_s']*1e3:.3f} ms")
    res, _ = timeit(jax.jit(lambda x: x.sum()), o3.T)
    print(f"sum (3,N):        {res['amortized_s']*1e3:.3f} ms")
    res, _ = timeit(jax.jit(lambda a, b, c: a.sum() + b.sum() + c.sum()), *oc)
    print(f"sum 3x(N,):       {res['amortized_s']*1e3:.3f} ms")

    # 2. p = o + t*d (shade's hit-point op), output same layout
    res, _ = timeit(jax.jit(lambda o, d, tt: o + tt[:, None] * d), o3, d3, t)
    print(f"o+t*d (N,3):      {res['amortized_s']*1e3:.3f} ms")
    res, _ = timeit(
        jax.jit(lambda o, d, tt: [oo + tt * dd for oo, dd in zip(o, d)]), oc, dc, t)
    print(f"o+t*d 3x(N,):     {res['amortized_s']*1e3:.3f} ms")

    # 3. normalize (N,3) vs componentwise
    def norm3(v):
        return v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    def normc(c):
        inv = jax.lax.rsqrt(c[0] * c[0] + c[1] * c[1] + c[2] * c[2])
        return [x * inv for x in c]

    res, _ = timeit(jax.jit(norm3), d3)
    print(f"normalize (N,3):  {res['amortized_s']*1e3:.3f} ms")
    res, _ = timeit(jax.jit(normc), dc)
    print(f"normalize 3x(N,): {res['amortized_s']*1e3:.3f} ms")

    # 4. row gather (N, 24) by id (shade's attr fetch) for reference
    tab = jax.random.normal(key, (1 << 20, 24), jnp.float32)
    ids = jax.random.randint(key, (N,), 0, 1 << 20)
    res, _ = timeit(jax.jit(lambda tb, i: jnp.take(tb, i, axis=0).sum()), tab, ids)
    print(f"row gather (N,24): {res['amortized_s']*1e3:.3f} ms")
    tab16 = jax.random.normal(key, (1 << 20, 16), jnp.float32)
    res, _ = timeit(jax.jit(lambda tb, i: jnp.take(tb, i, axis=0).sum()), tab16, ids)
    print(f"row gather (N,16): {res['amortized_s']*1e3:.3f} ms")
    tabw = jax.random.normal(key, (1 << 17, 128), jnp.float32)
    idw = jax.random.randint(key, (N // 8,), 0, 1 << 17)
    res, _ = timeit(jax.jit(lambda tb, i: jnp.take(tb, i, axis=0).sum()), tabw, idw)
    print(f"row gather (N/8,128): {res['amortized_s']*1e3:.3f} ms")


if __name__ == "__main__":
    main()
