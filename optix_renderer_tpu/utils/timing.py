"""Shared device-sync + timing convention for every benchmark/profiler.

On the axon-tunnel backend ``jax.block_until_ready`` returns before
device execution completes (measured round 2-3; see engine/renderer.py),
so any timing that trusts it credits enqueue time only.  The ONE
reliable sync is a scalar D2H fetch.  This module is the single place
that knowledge lives:

* :func:`device_sync` — fetch one scalar from (every leaf of) a pytree.
* :func:`timeit` — the repo-wide timing convention: returns BOTH the
  cold (single dispatch + sync, includes the ~25-35 ms tunnel sync
  floor) and the amortized (N chained dispatches, one sync) time.
  Benchmarks record both as {cold_s, amortized_s}; headline Mrays/s use
  the amortized figure, exactly like a real render loop that syncs once
  per frame batch.
"""

from __future__ import annotations

import time

import jax
import numpy as np


def device_sync(tree) -> None:
    """Block until every array in ``tree`` has actually been computed.

    Fetches one scalar from each leaf (4-byte D2H each): unlike
    ``jax.block_until_ready`` this round-trips the tunnel, so it cannot
    return before execution completes.  Cheap (<0.1 ms) on CPU/local
    backends, ~25-35 ms floor over the axon tunnel.
    """
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ndim"):
            idx = (0,) * leaf.ndim
            np.asarray(jax.device_get(leaf[idx]) if leaf.ndim else leaf)
        # non-array leaves (python scalars) need no sync


def timeit(f, *args, iters: int = 8, warmup: int = 2):
    """Time ``f(*args)`` under the repo convention.

    Returns ``(res, out)`` where ``res = {"cold_s", "amortized_s"}`` and
    ``out`` is the last result.  ``amortized_s`` chains ``iters``
    dispatches and syncs once (what a frame loop pays per frame);
    ``cold_s`` is one dispatch + one sync (what an interactive single
    frame pays, tunnel floor included).
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = f(*args)
    device_sync(out)

    t0 = time.perf_counter()
    out = f(*args)
    device_sync(out)
    cold = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    device_sync(out)
    amortized = (time.perf_counter() - t0) / iters
    return {"cold_s": cold, "amortized_s": amortized}, out
