"""Host LBVH construction (numpy).

Builds a binary BVH over triangles by sorting Morton codes of centroid
positions and median-splitting the sorted range, then flattens it in DFS
order with *skip links* — a threaded layout chosen for the TPU: traversal
needs no per-ray stack, just one node pointer per lane, so the inner loop
is pure vectorized gathers + selects with zero divergence-managed state
(SURVEY.md §7.3 hard-part #1).

Layout invariants (consumed by ``accel.traverse``):
* node 0 is the root; an inner node's first child is ``i + 1`` (DFS);
* ``skip[i]`` is the node to visit when the AABB test fails, or after a
  leaf is processed; the sentinel ``num_nodes`` terminates traversal;
* leaves hold ``tri_count > 0`` triangles at ``tri_offset`` into the
  Morton-sorted primitive order; inner nodes have ``tri_count == 0``.

Triangle data is pre-swizzled into sorted leaf order (v0/e1/e2) so leaf
tests gather contiguously; ``prim_id`` maps back to the original ids.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

pytree = partial(dataclasses.dataclass, frozen=True)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@pytree
class BVH:
    """Flattened skip-link BVH + swizzled triangle soup (device arrays)."""

    node_min: jnp.ndarray  # (N, 3) f32
    node_max: jnp.ndarray  # (N, 3) f32
    node_skip: jnp.ndarray  # (N,) i32
    node_tri_offset: jnp.ndarray  # (N,) i32
    node_tri_count: jnp.ndarray  # (N,) i32 (0 = inner)
    tri_v0: jnp.ndarray  # (T, 3) f32, Morton-sorted order
    tri_e1: jnp.ndarray  # (T, 3) f32  (v1 - v0)
    tri_e2: jnp.ndarray  # (T, 3) f32  (v2 - v0)
    prim_id: jnp.ndarray  # (T,) i32 sorted slot -> original triangle id
    tri_tab: jnp.ndarray  # (Tpad, 16) f32 packed [v0,e1,e2,prim_id,pad] for
    # the Pallas sublane-chunk kernels (accel.pallas_trace)

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]


def morton3d(x: np.ndarray, y: np.ndarray, z: np.ndarray) -> np.ndarray:
    """Interleave 10 bits per axis -> 30-bit Morton codes (uint32)."""

    def expand(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64) & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    return (expand(x) << 2 | expand(y) << 1 | expand(z)).astype(np.uint32)


def build_bvh(tri_verts: np.ndarray, leaf_size: int = 4) -> BVH:
    """Build from (T, 3, 3) float32 triangle vertices."""
    tri_verts = np.asarray(tri_verts, np.float32)
    T = tri_verts.shape[0]
    assert T > 0, "empty scene"

    tmin = tri_verts.min(axis=1)  # (T, 3)
    tmax = tri_verts.max(axis=1)
    centroid = 0.5 * (tmin + tmax)

    lo = centroid.min(axis=0)
    hi = centroid.max(axis=0)
    extent = np.maximum(hi - lo, 1e-20)
    q = np.clip(((centroid - lo) / extent) * 1023.0, 0, 1023).astype(np.uint32)
    codes = morton3d(q[:, 0], q[:, 1], q[:, 2])
    order = np.argsort(codes, kind="stable").astype(np.int32)

    s_min = tmin[order]
    s_max = tmax[order]

    # iterative DFS build over [start, end) ranges of the sorted list
    node_min: list = []
    node_max: list = []
    node_skip: list = []
    node_off: list = []
    node_cnt: list = []

    # Precompute prefix boxes? Simpler: compute range AABB via reduction on
    # the fly (numpy slices are fast enough; total work O(T log T)).
    def emit(start: int, end: int) -> int:
        """Append subtree for range, return its root index."""
        idx = len(node_min)
        node_min.append(s_min[start:end].min(axis=0))
        node_max.append(s_max[start:end].max(axis=0))
        node_skip.append(-1)  # patched by caller
        if end - start <= leaf_size:
            node_off.append(start)
            node_cnt.append(end - start)
            return idx
        node_off.append(0)
        node_cnt.append(0)
        mid = (start + end) // 2
        left = emit(start, mid)
        right = emit(mid, end)
        # left child's skip -> right subtree root; right's skip patched later
        node_skip[left] = right
        # record children for skip patching via a second pass
        _children[idx] = (left, right)
        return idx

    import sys

    _children: dict[int, tuple[int, int]] = {}
    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 10000))
    try:
        emit(0, T)
    finally:
        sys.setrecursionlimit(old_limit)

    n = len(node_min)
    skip = np.full(n, n, np.int32)

    # second pass: propagate skip pointers top-down
    # root skip = n (sentinel). For inner node i with children (l, r):
    #   skip[l] = r (subtree start), skip[r] = skip[i].
    for i in range(n):
        if i in _children:
            l, r = _children[i]
            skip[l] = r
            skip[r] = skip[i]

    v0 = tri_verts[order, 0]
    e1 = tri_verts[order, 1] - v0
    e2 = tri_verts[order, 2] - v0

    from .pallas_trace import pack_tri_table

    f32 = partial(jnp.asarray, dtype=jnp.float32)
    i32 = partial(jnp.asarray, dtype=jnp.int32)
    return BVH(
        tri_tab=pack_tri_table(v0, e1, e2, order),
        node_min=f32(np.stack(node_min)),
        node_max=f32(np.stack(node_max)),
        node_skip=i32(skip),
        node_tri_offset=i32(np.asarray(node_off)),
        node_tri_count=i32(np.asarray(node_cnt)),
        tri_v0=f32(v0),
        tri_e1=f32(e1),
        tri_e2=f32(e2),
        prim_id=i32(order),
    )
