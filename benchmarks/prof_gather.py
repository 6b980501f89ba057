"""Micro-benchmark XLA gather strategies for the shade-stage row fetch.

The fused SI builder's (N, W) row gather is the single biggest line of
the big-scene shade stage (51 ms of 55 ms at N=1M, W=20+8 on v5e —
benchmarks/prof_cull2.py).  XLA lowers a TPU row gather at a per-ROW
cost (~28-45 ns), nearly independent of width, so the fix is a cheaper
LOWERING, not a narrower row.  This harness times every candidate:

  rows_f32    (N,W) f32 jnp.take rows        — current
  rows_bf16   same, bf16 table               — is it byte-bound at all?
  cols_1d     W separate (T,) 1-D takes      — per-element gather
  flat_1d     one (T*W,) take with computed flat indices
  lanes_T     take(table.T (W,T), ids, axis=1) — minor-most-dim gather
  rows_sorted (N,W) take with PRESORTED ids  — locality upper bound
  onehot128   per-128-segment one-hot matmul — exactness reference only

Usage: python benchmarks/prof_gather.py [N] [T] [W]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from optix_renderer_tpu.utils.timing import timeit


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 20
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    rng = np.random.default_rng(0)
    # cluster-local ids: runs of ~64 nearby values, like real hit ids
    base = rng.integers(0, T, size=N // 64)
    ids_np = (np.repeat(base, 64) + rng.integers(0, 64, size=N)) % T
    ids = jnp.asarray(ids_np, jnp.int32)
    ids_sorted = jnp.asarray(np.sort(ids_np), jnp.int32)
    tab = jnp.asarray(rng.standard_normal((T, W)), jnp.float32)
    tab_bf = tab.astype(jnp.bfloat16)
    tab_t = jnp.asarray(np.ascontiguousarray(np.asarray(tab).T))  # (W, T)
    tab_flat = tab.reshape(-1)

    def run(name, f, *a):
        g = jax.jit(f)
        res, _ = timeit(g, *a, iters=8, warmup=2)
        ms = res["amortized_s"] * 1e3
        print(f"{name:14s} {ms:8.2f} ms   {ms * 1e6 / N:6.1f} ns/row")

    run("rows_f32", lambda i: jnp.take(tab, i, axis=0), ids)
    run("rows_w8", lambda i: jnp.take(tab[:, :8], i, axis=0), ids)
    run("rows_bf16", lambda i: jnp.take(tab_bf, i, axis=0), ids)
    run("rows_sorted", lambda i: jnp.take(tab, i, axis=0), ids_sorted)
    run("cols_1d", lambda i: jnp.stack([jnp.take(tab_t[j], i) for j in range(W)], -1), ids)
    run("col_1d_one", lambda i: jnp.take(tab_t[0], i), ids)
    run(
        "flat_1d",
        lambda i: jnp.take(tab_flat, (i[:, None] * W + jnp.arange(W)[None, :]).reshape(-1)).reshape(N, W),
        ids,
    )
    run("lanes_T", lambda i: jnp.take(tab_t, i, axis=1), ids)
    # gather 8-row groups then select: per-row cost amortized over 8 tris
    tab_g = tab.reshape(T // 8, 8 * W)
    def grouped(i):
        g = jnp.take(tab_g, i // 8, axis=0).reshape(N, 8, W)
        return jnp.take_along_axis(g, (i % 8)[:, None, None], axis=1)[:, 0]
    run("grouped8", grouped, ids)


if __name__ == "__main__":
    main()
