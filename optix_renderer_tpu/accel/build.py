"""Host LBVH construction (numpy).

Builds a binary BVH over triangles by sorting Morton codes of centroid
positions and median-splitting the sorted range, then flattens it in DFS
order with *skip links* — a threaded layout chosen for the TPU: traversal
needs no per-ray stack, just one node pointer per lane, so the inner loop
is pure vectorized gathers + selects with zero divergence-managed state
(SURVEY.md §7.3 hard-part #1).

The builder is fully iterative (explicit DFS stack + memoized subtree
sizes; no Python recursion) and AABBs are computed vectorized per level of
the leaf loop + a single reverse merge pass, so a ~1M-triangle build stays
in the seconds range.

Layout invariants (consumed by ``accel.traverse``):
* node 0 is the root; an inner node's first child is ``i + 1`` (DFS);
* ``skip[i]`` is the node to visit when the AABB test fails, or after a
  leaf is processed; the sentinel ``num_nodes`` terminates traversal;
* leaves hold ``tri_count > 0`` triangles at ``tri_offset`` into the
  Morton-sorted primitive order; inner nodes have ``tri_count == 0``.

Triangle data is pre-swizzled into sorted leaf order (v0/e1/e2) so leaf
tests gather contiguously; ``prim_id`` maps back to the original ids.

For the TPU big-scene tier (``accel.pallas_cluster``) the same Morton
order additionally yields fixed-size *clusters* (contiguous runs of
``CLUSTER_SIZE`` triangles) whose AABBs feed the tile-level culling phase.
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial

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
    tri_tab: jnp.ndarray  # (Tpad, 16) f32 packed table for the Pallas
    # kernels (accel.pallas_trace.pack_tri_table layout)
    cluster_min: jnp.ndarray  # (C, 3) f32 cluster AABBs (big-scene tier)
    cluster_max: jnp.ndarray  # (C, 3) f32
    geom_tab: jnp.ndarray  # (Tpad, 16) f32 flat [v0 e1 e2 prim ...] rows in
    # SORTED (Morton) order: the cluster tier's post-trace decode gathers
    # the winning triangle's geometry by sorted id and recomputes exact
    # (t, u, v) — the kernel itself only tracks a packed (quantized t |
    # local id) min-key.  Aliases tri_tab on the small-scene tier (same
    # layout).
    shade_tab: tuple  # fused per-triangle decode+shade rows in SORTED
    # (Morton) order — ONE row gather by the kernel's winning sorted id
    # replaces the old geom-decode + attribute gathers (the TPU row
    # gather is per-row bound, so gather COUNT, not width, dominates):
    #   [0] (Tpad, SHADE_A_COLS) f32 [v0(3) e1(3) e2(3) n1..n3(9) mesh
    #       prim] — exact (t, u, v) recompute + interpolated normal +
    #       the mesh record id, everything every shading mode needs
    #   [1] (Tpad, SHADE_B_COLS) f32 [uv1(2) uv2(2) uv3(2) pad(2)] —
    #       gathered only when a mode reads uvs/textures (jit DCE)
    # Triangle area is recomputed from cross(e1, e2).  Replaces the
    # reference's SBT record fetch + barycentric attribute interpolation
    # inputs (hit_miss.cuh:14-50); (1, cols) dummies on the brute tier
    shade_gtab: jnp.ndarray  # (C*32, 128) f32 attr-major cluster-grouped
    # shade table (pack_shade_table_grouped layout) for the winner-attr
    # Pallas fetch on coherent traces — avoids the per-lane row gather
    # entirely.  (32, 128) zero dummy on the brute tier.

    @property
    def num_nodes(self) -> int:
        return self.node_min.shape[0]

    @property
    def num_clusters(self) -> int:
        return self.cluster_min.shape[0]


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


def _build_ranges(total: int, leaf_size: int):
    """Iterative DFS over [start, end) ranges.

    Returns (start, end, skip, is_leaf) int64 arrays in DFS order.  The
    tree shape depends only on range lengths (median split), so subtree
    node counts are memoized and each left child's skip (its right
    sibling's root index) is known at push time.
    """

    @lru_cache(maxsize=None)
    def count(n: int) -> int:
        if n <= leaf_size:
            return 1
        return 1 + count(n // 2) + count(n - n // 2)

    n_nodes = count(total)
    start = np.empty(n_nodes, np.int64)
    end = np.empty(n_nodes, np.int64)
    skip = np.empty(n_nodes, np.int64)
    leaf = np.zeros(n_nodes, bool)

    stack = [(0, total, n_nodes)]  # (s, e, skip); root's skip = sentinel
    i = 0
    while stack:
        s, e, sk = stack.pop()
        start[i], end[i], skip[i] = s, e, sk
        ln = e - s
        if ln <= leaf_size:
            leaf[i] = True
        else:
            mid = s + ln // 2
            right_root = i + 1 + count(ln // 2)
            stack.append((mid, e, sk))  # right: inherits parent's skip
            stack.append((s, mid, right_root))  # left: skip -> right subtree
        i += 1
    assert i == n_nodes
    return start, end, skip, leaf


def _range_aabbs(start, end, leaf, skip, s_min, s_max, leaf_size):
    """AABBs for every node: leaves vectorized (bounded range length),
    inner nodes by one reverse child-merge pass (children of inner i are
    i+1 and skip[i+1])."""
    n = len(start)
    bmin = np.empty((n, 3), np.float32)
    bmax = np.empty((n, 3), np.float32)

    lidx = np.nonzero(leaf)[0]
    ls = start[lidx]
    le = end[lidx]
    lmin = np.full((len(lidx), 3), np.inf, np.float32)
    lmax = np.full((len(lidx), 3), -np.inf, np.float32)
    for k in range(leaf_size):
        valid = ls + k < le
        rows = np.minimum(ls + k, len(s_min) - 1)
        lmin = np.where(valid[:, None], np.minimum(lmin, s_min[rows]), lmin)
        lmax = np.where(valid[:, None], np.maximum(lmax, s_max[rows]), lmax)
    bmin[lidx] = lmin
    bmax[lidx] = lmax

    inner = np.nonzero(~leaf)[0]
    for i in inner[::-1]:  # reverse DFS: children already resolved
        l = i + 1
        r = skip[l]
        bmin[i] = np.minimum(bmin[l], bmin[r])
        bmax[i] = np.maximum(bmax[l], bmax[r])
    return bmin, bmax


CLUSTER_SIZE = 64  # triangles per cluster (big-scene Pallas tier)
ATTR_NRM_COLS = 12  # corner-normal group row width (9 used)
ATTR_UVM_COLS = 8   # uv/mesh/area group row width (8 used)
SHADE_A_COLS = 20  # fused decode+shade group A row width (see BVH.shade_tab)
SHADE_B_COLS = 8   # group B row width (6 used)
SHADE_G_COLS = 32  # grouped shade block attr width (26 used: A 20 + B uv 6)


def pack_shade_table_grouped(shade_a: np.ndarray, shade_b: np.ndarray) -> np.ndarray:
    """(C*32, 128) f32 ATTR-MAJOR cluster-grouped shade table for the
    winner-attr Pallas kernel (accel.pallas_cluster.fetch_winner_attrs).

    Each 64-triangle cluster is one DMA-aligned (32, 128) block: row j =
    shade attribute j, lane l = triangle l of the cluster (lanes 64-127
    pad).  Attributes 0-19 are the shade_a columns (v0, e1, e2, corner
    normals, mesh id, prim id), 20-25 the shade_b corner uvs; 26-31 pad.
    Attr-major so the block is DIRECTLY the (attrs, tris) left operand
    of the kernel's one-hot selection matmul — replaces the per-lane XLA
    row gather of those rows (~52 ns/row at 1M rays on v5e — the
    whole-frame bottleneck)."""
    Tp = shade_a.shape[0]
    T64 = -(-Tp // CLUSTER_SIZE) * CLUSTER_SIZE
    flat = np.zeros((T64, SHADE_G_COLS), np.float32)
    flat[:Tp, :SHADE_A_COLS] = shade_a
    flat[:Tp, SHADE_A_COLS:SHADE_A_COLS + 6] = shade_b[:, :6]
    C = T64 // CLUSTER_SIZE
    a = flat.reshape(C, CLUSTER_SIZE, SHADE_G_COLS)  # (cluster, tri, attr)
    out = np.zeros((C, SHADE_G_COLS, 2 * CLUSTER_SIZE), np.float32)
    out[:, :, :CLUSTER_SIZE] = a.transpose(0, 2, 1)
    return out.reshape(C * SHADE_G_COLS, 2 * CLUSTER_SIZE)


def pack_attr_tab(n_corner, uv_corner, tri_mesh, area):
    """Per-triangle attribute rows in ORIGINAL tri order, split into the
    (normals, uv+mesh+area) gather groups (see BVH.attr_tab).

    n_corner (T, 3, 3) per-corner normals, uv_corner (T, 3, 2) per-corner
    uvs, tri_mesh (T,), area (T,).  mesh ids are exact as f32 < 2^24.
    """
    T = len(tri_mesh)
    nrm = np.zeros((T, ATTR_NRM_COLS), np.float32)
    nrm[:, 0:9] = np.asarray(n_corner, np.float32).reshape(T, 9)
    uvm = np.zeros((T, ATTR_UVM_COLS), np.float32)
    uvm[:, 0:6] = np.asarray(uv_corner, np.float32).reshape(T, 6)
    uvm[:, 6] = np.asarray(tri_mesh, np.float32)
    uvm[:, 7] = np.asarray(area, np.float32)
    return nrm, uvm


def _bvh_from_arrays(arrs: dict) -> "BVH":
    """Upload the numpy build products (keys = _BVH_NP_FIELDS) once."""
    f32 = partial(jnp.asarray, dtype=jnp.float32)
    i32 = partial(jnp.asarray, dtype=jnp.int32)
    # grouped shade table only exists on the cluster tier (grouped
    # tri_tab); derived here (cheap reshape) instead of cached on disk
    if np.asarray(arrs["tri_tab"]).shape[1] == 128:
        gtab = pack_shade_table_grouped(
            np.asarray(arrs["shade_a"], np.float32),
            np.asarray(arrs["shade_b"], np.float32),
        )
    else:
        gtab = np.zeros((SHADE_G_COLS, 128), np.float32)
    return BVH(
        tri_tab=f32(arrs["tri_tab"]),
        geom_tab=f32(arrs["geom_tab"]),
        shade_tab=(f32(arrs["shade_a"]), f32(arrs["shade_b"])),
        shade_gtab=f32(gtab),
        cluster_min=f32(arrs["cluster_min"]),
        cluster_max=f32(arrs["cluster_max"]),
        node_min=f32(arrs["node_min"]),
        node_max=f32(arrs["node_max"]),
        node_skip=i32(arrs["node_skip"]),
        node_tri_offset=i32(arrs["node_tri_offset"]),
        node_tri_count=i32(arrs["node_tri_count"]),
        tri_v0=f32(arrs["tri_v0"]),
        tri_e1=f32(arrs["tri_e1"]),
        tri_e2=f32(arrs["tri_e2"]),
        prim_id=i32(arrs["prim_id"]),
    )


def _bvh_cache_key(tri_verts, leaf_size, tri_normal, tri_mesh, tri_attr,
                   need_nodes) -> str:
    """Content hash of everything that determines the build output."""
    import hashlib

    h = hashlib.sha1()
    h.update(b"bvhcache-v2")  # v2: fused shade_a/shade_b gather groups
    h.update(np.int64(leaf_size).tobytes())
    h.update(b"nodes" if need_nodes else b"nonodes")
    for a in (tri_verts, tri_normal, tri_mesh):
        if a is None:
            h.update(b"none")
        else:
            h.update(np.ascontiguousarray(a).tobytes())
    if tri_attr is None:
        h.update(b"none")
    else:
        for a in tri_attr:
            h.update(np.ascontiguousarray(a).tobytes())
    return h.hexdigest()


_BVH_NP_FIELDS = (
    "tri_tab", "geom_tab", "shade_a", "shade_b", "cluster_min",
    "cluster_max", "node_min", "node_max", "node_skip", "node_tri_offset",
    "node_tri_count", "tri_v0", "tri_e1", "tri_e2", "prim_id",
)


def build_bvh_cached(cache_dir, tri_verts, **kwargs) -> "BVH":
    """build_bvh with a content-addressed on-disk bake cache.

    Acceleration-structure baking, the production answer to rebuild
    latency (the reference rebuilds its TLAS/BLAS on the GPU every run,
    viewer.hpp:506-517; a host LBVH over 1M tris costs seconds of numpy
    here).  The cache key hashes the exact geometry + build parameters,
    so a stale cache is impossible by construction; entries are plain
    uncompressed .npz (load is IO-bound, ~0.5 s for a 1M-tri scene vs a
    multi-second rebuild).  ``cache_dir=None`` just builds.
    """
    import os

    if cache_dir is None:
        return build_bvh(tri_verts, **kwargs)
    need_nodes = (tri_verts.shape[0] <= 4096
                  or jax.default_backend() == "cpu")
    key = _bvh_cache_key(
        tri_verts, kwargs.get("leaf_size", 4), kwargs.get("tri_normal"),
        kwargs.get("tri_mesh"), kwargs.get("tri_attr"), need_nodes)
    path = os.path.join(cache_dir, f"bvh-{key}.npz")
    if os.path.exists(path):
        z = np.load(path)
        return _bvh_from_arrays({f: z[f] for f in _BVH_NP_FIELDS})
    arrs = build_bvh(tri_verts, _as_arrays=True, **kwargs)
    os.makedirs(cache_dir, exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as fh:
        np.savez(fh, **arrs)
    os.replace(tmp, path)  # atomic: concurrent renderers see all or nothing
    return _bvh_from_arrays(arrs)


def build_bvh(
    tri_verts: np.ndarray,
    leaf_size: int = 4,
    tri_normal: np.ndarray | None = None,
    tri_mesh: np.ndarray | None = None,
    tri_attr: np.ndarray | None = None,
    _as_arrays: bool = False,
) -> "BVH | dict":
    """Build from (T, 3, 3) float32 triangle vertices.

    ``_as_arrays=True`` returns the numpy build products instead of an
    uploaded BVH — the cacheable representation (build_bvh_cached), kept
    host-side because a device read-back would cross the slow D2H
    tunnel.

    ``tri_attr`` is the (nrm, uvm) per-triangle attribute table pair
    (see BVH.attr_tab / pack_attr_tab) in ORIGINAL triangle order, stored
    untouched; when absent on a big scene a flat-shaded default is
    synthesized from ``tri_normal``/``tri_mesh`` (geometry-only builds,
    e.g. traversal tests).  ``tri_normal``/``tri_mesh`` also ride the
    packed triangle table for the brute tier.
    """
    from .pallas_trace import TRI_SUB, pack_tri_table, pack_tri_table_grouped

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

    # The fine skip-link node tree serves the CPU walk tier only; on TPU,
    # big scenes traverse via cluster AABBs (pallas_cluster), so skip the
    # ~25 s/1M-tri node build there (dispatch never routes to the walk).
    # Skipped trees store ZERO nodes so an accidental walk-tier call fails
    # loudly (trace_*_bvh raises) instead of returning all-miss.
    need_nodes = T <= 4096 or jax.default_backend() == "cpu"
    if need_nodes:
        start, end, skip, leaf = _build_ranges(T, leaf_size)
        bmin, bmax = _range_aabbs(start, end, leaf, skip, s_min, s_max, leaf_size)
    else:
        start = end = skip = np.zeros(0, np.int64)
        leaf = np.zeros(0, bool)
        bmin = np.zeros((0, 3), np.float32)
        bmax = np.zeros((0, 3), np.float32)

    v0 = tri_verts[order, 0]
    e1 = tri_verts[order, 1] - v0
    e2 = tri_verts[order, 2] - v0

    # cluster AABBs over fixed-size Morton runs (padded clusters inherit
    # the last triangle's box, which is harmless for culling)
    C = -(-T // CLUSTER_SIZE)
    cmin = np.full((C, 3), np.inf, np.float32)
    cmax = np.full((C, 3), -np.inf, np.float32)
    cid = np.minimum(np.arange(T) // CLUSTER_SIZE, C - 1)
    np.minimum.at(cmin, cid, s_min)
    np.maximum.at(cmax, cid, s_max)

    area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
    tab_kwargs = dict(
        normal=None if tri_normal is None else np.asarray(tri_normal)[order],
        mesh_id=None if tri_mesh is None else np.asarray(tri_mesh)[order],
        area=area,
    )
    if T > 4096:  # big-scene tier: cluster-grouped layout (pallas_cluster)
        tri_tab = pack_tri_table_grouped(
            v0, e1, e2, order, cluster_min=cmin, cluster_max=cmax,
            as_numpy=True, **tab_kwargs
        )
        geom_tab = pack_tri_table(v0, e1, e2, order, pad_to=TRI_SUB,
                                  as_numpy=True)
    else:  # brute tier: flat (Tpad, 16) rows (pallas_trace)
        tri_tab = pack_tri_table(v0, e1, e2, order, pad_to=TRI_SUB,
                                 as_numpy=True, **tab_kwargs)
        geom_tab = tri_tab  # same flat layout: alias, no extra memory
    if T <= 4096:  # brute tier shades via scene.device.tri_pack one-hot
        shade_a = np.zeros((1, SHADE_A_COLS), np.float32)
        shade_b = np.zeros((1, SHADE_B_COLS), np.float32)
    else:
        if tri_attr is None:
            # geometry-only default: flat representative normals, zero uv
            rep = (np.zeros((T, 3), np.float32) if tri_normal is None
                   else np.asarray(tri_normal, np.float32))
            mesh = (np.zeros(T, np.int32) if tri_mesh is None
                    else np.asarray(tri_mesh))
            tri_attr = pack_attr_tab(
                np.repeat(rep[:, None, :], 3, axis=1),
                np.zeros((T, 3, 2), np.float32), mesh,
                np.zeros(T, np.float32),
            )
        nrm_o = np.asarray(tri_attr[0], np.float32)
        uvm_o = np.asarray(tri_attr[1], np.float32)
        assert nrm_o.shape == (T, ATTR_NRM_COLS)
        assert uvm_o.shape == (T, ATTR_UVM_COLS)
        # ONE fused (sorted-order) decode+shade gather group per consumer
        # set: post-trace, ONE row gather of group A recomputes exact
        # (t, u, v) AND interpolates normals AND fetches the mesh id (the
        # TPU row gather is per-row bound — ~28/40/45/62 ms per 1M rows at
        # widths 8/16/20/32 on v5e — so three narrow gathers of 16+12+8
        # cols cost ~1.5x one 20-col gather); group B (uvs) stays separate
        # so untextured/uv-free modes DCE it.  Triangle area is recomputed
        # from cross(e1, e2) instead of stored.
        Tp = -(-T // TRI_SUB) * TRI_SUB
        shade_a = np.zeros((Tp, SHADE_A_COLS), np.float32)
        shade_a[:T, 0:3] = v0
        shade_a[:T, 3:6] = e1
        shade_a[:T, 6:9] = e2
        shade_a[:T, 9:18] = nrm_o[order, 0:9]
        shade_a[:T, 18] = uvm_o[order, 6]  # mesh id (exact f32 < 2^24)
        shade_a[:T, 19] = order  # original prim id
        shade_a[T:, 19] = -1.0
        shade_b = np.zeros((Tp, SHADE_B_COLS), np.float32)
        shade_b[:T, 0:6] = uvm_o[order, 0:6]
    arrs = {
        "tri_tab": tri_tab,
        "geom_tab": geom_tab,
        "shade_a": shade_a,
        "shade_b": shade_b,
        "cluster_min": cmin,
        "cluster_max": cmax,
        "node_min": bmin,
        "node_max": bmax,
        "node_skip": skip,
        "node_tri_offset": np.where(leaf, start, 0),
        "node_tri_count": np.where(leaf, end - start, 0),
        "tri_v0": v0,
        "tri_e1": e1,
        "tri_e2": e2,
        "prim_id": order,
    }
    return arrs if _as_arrays else _bvh_from_arrays(arrs)
