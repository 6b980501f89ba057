"""Vectorized BVH traversal (the TPU replacement for RT cores).

One `lax.while_loop` advances ALL rays in lock-step: each lane holds a
single node pointer into the skip-link BVH (``accel.build``), so an
iteration is (gather node AABB) -> (slab test) -> (masked leaf triangle
tests) -> (select next pointer).  No stack, no data-dependent shapes —
everything is (R,)-wide VPU work + HBM gathers, which is the idiomatic
XLA mapping of the reference's ``owl::traceRay`` (deviceCode.cu:76).

Two entry points:
* :func:`trace_closest` — closest-hit, fills a :class:`core.types.Hit`;
* :func:`trace_any` — shadow/visibility variant with early termination.

A brute-force O(R*T) oracle (:func:`intersect_brute`) validates both.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import jax.numpy as jnp

from ..core.types import Hit, Ray
from .build import BVH

LEAF_SIZE = 4  # must match accel.build leaf_size default
_INF = np.float32(3.0e38)  # np, not jnp: device module constants get hoisted as executable inputs


def _moller_trumbore(o, d, v0, e1, e2, t_min, t_max):
    """Batched no-cull Möller-Trumbore; returns (hit, t, u, v).

    No backface culling, matching OptiX defaults in the reference (no
    OPTIX_RAY_FLAG_CULL_* anywhere in the device code).
    """
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (
        (jnp.abs(det) >= 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, t, u, v


def _slab_test(o, inv_d, bmin, bmax, t_min, t_max):
    """Ray-AABB slab test; inv_d precomputed (inf components are fine)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    t_near = jnp.maximum(jnp.max(near, axis=-1), t_min)
    t_far = jnp.minimum(jnp.min(far, axis=-1), t_max)
    return t_near <= t_far


BRUTE_MAX_TRIS = 4096  # measured crossover on v5e: chunked brute-force beats
# the gather-based BVH walk by >10x for small scenes (XLA lowers per-lane
# dynamic gathers poorly on TPU: 0.8 Mrays/s vs 37 Mrays/s at 32 tris)
_BRUTE_CHUNK = 32

# On TPU the Pallas sublane-chunk kernels (accel.pallas_trace) own the
# brute-force tier (every VPU op tests 8 triangles x 128 rays); above this
# the clustered two-phase path (accel.pallas_cluster) takes over.  Env
# override for crossover A/Bs; 4096 is measured, not guessed: on the
# 5670-tri gallery (512^2 16spp, v5e) the cluster tier beats brute on
# every mode (PATH 1.57 s vs 1.81 s, LTC amortized 13.0 vs 26.1 ms), so
# raising the cap to pull such scenes into the brute tier LOSES — its
# every-ray-tests-every-triangle cost grows linearly while the cluster
# tier's culls keep per-ray work flat.
PALLAS_BRUTE_MAX_TRIS = int(os.environ.get("OPTIX_TPU_BRUTE_MAX_TRIS", "4096"))
assert PALLAS_BRUTE_MAX_TRIS >= 1


def _on_cpu() -> bool:
    """Static backend dispatch (resolved at trace time, one backend per
    process): CPU keeps the portable jnp lowerings (tests, oracles);
    anything else (tpu / the axon tunnel) takes the Pallas kernels."""
    return jax.default_backend() == "cpu"


def _assert_zero_tmin(t_min) -> None:
    """The Pallas kernels hardcode t > 0; a nonzero t_min must fail loudly
    rather than silently differ from the CPU lowerings."""
    assert isinstance(t_min, (int, float)) and float(t_min) == 0.0, (
        f"Pallas trace tiers only support t_min == 0 (got {t_min})"
    )


def trace_closest(bvh: BVH, rays: Ray, t_min: float = 0.0, t_max: float = _INF) -> Hit:
    """Closest hit over a ray batch, dispatching on backend + scene size
    (both static): Pallas sublane-chunk brute force on TPU, chunk-unrolled
    jnp brute force on CPU, skip-link BVH walk for large scenes.  Returns
    Hit in ORIGINAL triangle ids."""
    T = bvh.tri_v0.shape[0]
    if not _on_cpu():
        _assert_zero_tmin(t_min)
        if T <= PALLAS_BRUTE_MAX_TRIS:
            from .pallas_trace import trace_closest_tiles

            return trace_closest_tiles(bvh.tri_tab, rays, t_max=t_max)
        from .pallas_cluster import trace_closest_clusters

        ch, _stats = trace_closest_clusters(
            bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max,
            rays, t_max=t_max
        )
        return Hit(t=ch.t, tri_id=ch.tri_id, bary_u=ch.bary_u, bary_v=ch.bary_v)
    if T <= BRUTE_MAX_TRIS:
        return trace_closest_brute(bvh, rays, t_min, t_max)
    return trace_closest_bvh(bvh, rays, t_min, t_max)


def trace_any(bvh: BVH, rays: Ray, t_min: float = 0.0, t_max=_INF) -> jnp.ndarray:
    """Visibility query (see trace_closest for dispatch)."""
    occ, _stats = trace_any_with_stats(bvh, rays, t_min, t_max)
    return occ


def trace_any_clusters_sorted(bvh: BVH, rays: Ray, t_max=_INF,
                              refine: bool = True, interpret: bool = False):
    """Corridor-sorted occlusion query on the cluster tier (the
    incoherent-shadow-ray analog of engine.shade's sorted closest
    trace).  One supercluster sweep yields both the coherence sort key
    and the per-ray t bound; the packed any-trace runs on the sorted
    rays with the precomputed bound and the occlusion bits are unsorted
    after.  Lanes with ``t_max <= 0`` are rewritten to an above-scene
    up-ray so the key packs them into wholly-inert tiles."""
    from .pallas_cluster import corridor_keys_and_t_bounds, trace_any_clusters

    n = rays.origin.shape[0]
    tmax_b = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    out_o = bvh.cluster_max.max(axis=0) + 1.0  # above everything
    up = jnp.array([0.0, 1.0, 0.0], jnp.float32)
    m = (tmax_b > 0.0)[:, None]
    rays_m = Ray(
        origin=jnp.where(m, rays.origin, out_o[None, :]),
        direction=jnp.where(m, rays.direction, up[None, :]),
    )
    keys, te = corridor_keys_and_t_bounds(
        bvh.cluster_min, bvh.cluster_max, rays_m, tmax_b)
    perm = jnp.argsort(keys)
    od = jnp.concatenate(
        [rays_m.origin, rays_m.direction, te[:, None]], axis=1)
    od_s = jnp.take(od, perm, axis=0)
    occ_s, stats = trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max,
        Ray(origin=od_s[:, 0:3], direction=od_s[:, 3:6]),
        refine=refine, t_eff=od_s[:, 6], interpret=interpret,
    )
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(
        jnp.arange(n, dtype=jnp.int32))
    return jnp.take(occ_s, inv, axis=0), stats


def trace_any_with_stats(bvh: BVH, rays: Ray, t_min: float = 0.0, t_max=_INF,
                         refine: bool = False, coherent: bool = True):
    """Visibility query returning (occluded, trace stats dict) — the stats
    carry the cluster tier's cull-overflow/re-trace observability
    (pallas_cluster.zero_trace_stats keys; zeros on the other tiers).

    ``coherent=False`` (NEE shadow rays at bounce depth: origins are
    scattered hit points) corridor-sorts the rays before the cluster
    tier exactly like the incoherent closest trace (engine.shade) and
    unsorts the occlusion bits after — the tier culls per ray TILE, so
    image-order shadow tiles degenerate to the frustum-union of 1024
    scattered rays.  Occlusion is sort-invariant (the cull is
    conservative and overflow checked), so this only moves performance.
    Lanes with ``t_max <= 0`` (dead path lanes) are rewritten to a ray
    above the scene pointing up: the corridor key packs them into
    wholly-inert tiles that cost nothing in the cull or the kernel.
    """
    from .pallas_cluster import zero_trace_stats

    T = bvh.tri_v0.shape[0]
    if not _on_cpu():
        _assert_zero_tmin(t_min)
        if T <= PALLAS_BRUTE_MAX_TRIS:
            from .pallas_trace import trace_any_tiles

            return trace_any_tiles(bvh.tri_tab, rays, t_max=t_max), zero_trace_stats()
        from .pallas_cluster import trace_any_clusters

        if coherent:
            return trace_any_clusters(
                bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
                t_max=t_max, refine=refine,
            )
        return trace_any_clusters_sorted(bvh, rays, t_max, refine=refine)
    if T <= BRUTE_MAX_TRIS:
        return trace_any_brute(bvh, rays, t_min, t_max), zero_trace_stats()
    return trace_any_bvh(bvh, rays, t_min, t_max), zero_trace_stats()


def trace_any_brute(bvh: BVH, rays: Ray, t_min: float = 0.0, t_max=_INF) -> jnp.ndarray:
    """Brute-force any-hit: True where an occluder exists in (t_min, t_max).

    Same chunked layout as trace_closest_brute but only ORs hit flags — no
    closest-t/tri/bary selects per triangle. t_max may be per-ray (R,)."""
    o = rays.origin
    d = rays.direction
    R = o.shape[0]
    T = bvh.tri_v0.shape[0]
    Tp = _pad_count(T)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    pad = Tp - T
    v0 = jnp.pad(bvh.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(bvh.tri_e1, ((0, pad), (0, 0)))
    e2 = jnp.pad(bvh.tri_e2, ((0, pad), (0, 0)))

    def chunk_body(c, occ):
        base = c * _BRUTE_CHUNK
        v0c = jax.lax.dynamic_slice(v0, (base, 0), (_BRUTE_CHUNK, 3))
        e1c = jax.lax.dynamic_slice(e1, (base, 0), (_BRUTE_CHUNK, 3))
        e2c = jax.lax.dynamic_slice(e2, (base, 0), (_BRUTE_CHUNK, 3))
        for i in range(_BRUTE_CHUNK):
            h, _, _, _ = _moller_trumbore(o, d, v0c[i], e1c[i], e2c[i], t_min, t_max)
            occ = occ | h
        return occ

    occ0 = jnp.zeros((R,), jnp.bool_)
    n_chunks = Tp // _BRUTE_CHUNK
    if n_chunks == 1:
        return chunk_body(0, occ0)
    return jax.lax.fori_loop(0, n_chunks, chunk_body, occ0)


def _pad_count(t: int) -> int:
    return -(-t // _BRUTE_CHUNK) * _BRUTE_CHUNK


def trace_closest_brute(bvh: BVH, rays: Ray, t_min: float = 0.0, t_max=_INF) -> Hit:
    """Brute-force closest hit: fori over triangle chunks with a
    statically-unrolled inner loop.

    Chunk loads are contiguous ``dynamic_slice``s and the per-triangle data
    are scalars broadcast across the whole ray batch — zero dynamic
    gathers, pure VPU arithmetic, which is the idiomatic TPU mapping for
    scenes whose triangle list fits the O(R*T) budget.
    """
    o = rays.origin
    d = rays.direction
    R = o.shape[0]
    T = bvh.tri_v0.shape[0]
    Tp = _pad_count(T)
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    pad = Tp - T
    v0 = jnp.pad(bvh.tri_v0, ((0, pad), (0, 0)))
    e1 = jnp.pad(bvh.tri_e1, ((0, pad), (0, 0)))  # degenerate pad tris never hit
    e2 = jnp.pad(bvh.tri_e2, ((0, pad), (0, 0)))
    prim = jnp.pad(bvh.prim_id, (0, pad))

    def chunk_body(c, state):
        t, tri, bu, bv = state
        base = c * _BRUTE_CHUNK
        v0c = jax.lax.dynamic_slice(v0, (base, 0), (_BRUTE_CHUNK, 3))
        e1c = jax.lax.dynamic_slice(e1, (base, 0), (_BRUTE_CHUNK, 3))
        e2c = jax.lax.dynamic_slice(e2, (base, 0), (_BRUTE_CHUNK, 3))
        pc = jax.lax.dynamic_slice(prim, (base,), (_BRUTE_CHUNK,))
        for i in range(_BRUTE_CHUNK):
            h, tk, uk, vk = _moller_trumbore(o, d, v0c[i], e1c[i], e2c[i], t_min, t)
            t = jnp.where(h, tk, t)
            tri = jnp.where(h, pc[i], tri)
            bu = jnp.where(h, uk, bu)
            bv = jnp.where(h, vk, bv)
        return t, tri, bu, bv

    t0 = t_max.astype(jnp.float32)
    tri0 = jnp.full((R,), -1, jnp.int32)
    z = jnp.zeros((R,), jnp.float32)
    n_chunks = Tp // _BRUTE_CHUNK
    if n_chunks == 1:
        t, tri, bu, bv = chunk_body(0, (t0, tri0, z, z))
    else:
        t, tri, bu, bv = jax.lax.fori_loop(0, n_chunks, chunk_body, (t0, tri0, z, z))
    return Hit(t=t, tri_id=tri, bary_u=bu, bary_v=bv)


def trace_closest_bvh(bvh: BVH, rays: Ray, t_min: float = 0.0, t_max: float = _INF) -> Hit:
    """Closest-hit skip-link BVH walk. Returns Hit in ORIGINAL tri ids."""
    if bvh.num_nodes == 0:
        raise ValueError(
            "BVH has no skip-link nodes (built on a non-CPU backend above the "
            "brute tier, where the cluster kernels own traversal)"
        )
    o = rays.origin
    d = rays.direction
    n_nodes = bvh.num_nodes
    R = o.shape[0]

    safe_d = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / safe_d

    def cond(state):
        node, _, _, _, _ = state
        return jnp.any(node < n_nodes)

    def body(state):
        node, t, tri, bu, bv = state
        active = node < n_nodes
        idx = jnp.where(active, node, 0)

        bmin = bvh.node_min[idx]
        bmax = bvh.node_max[idx]
        hit_aabb = active & _slab_test(o, inv_d, bmin, bmax, t_min, t)

        count = bvh.node_tri_count[idx]
        offset = bvh.node_tri_offset[idx]
        is_leaf = count > 0

        test_leaf = hit_aabb & is_leaf
        for k in range(LEAF_SIZE):
            valid = test_leaf & (k < count)
            tid = jnp.where(valid, offset + k, 0)
            h, tk, uk, vk = _moller_trumbore(
                o, d, bvh.tri_v0[tid], bvh.tri_e1[tid], bvh.tri_e2[tid], t_min, t
            )
            closer = valid & h
            t = jnp.where(closer, tk, t)
            tri = jnp.where(closer, bvh.prim_id[tid], tri)
            bu = jnp.where(closer, uk, bu)
            bv = jnp.where(closer, vk, bv)

        descend = hit_aabb & ~is_leaf
        nxt = jnp.where(descend, idx + 1, bvh.node_skip[idx])
        node = jnp.where(active, nxt, node)
        return node, t, tri, bu, bv

    node0 = jnp.zeros((R,), jnp.int32)
    t0 = jnp.full((R,), t_max, jnp.float32)
    tri0 = jnp.full((R,), -1, jnp.int32)
    z = jnp.zeros((R,), jnp.float32)
    node, t, tri, bu, bv = jax.lax.while_loop(cond, body, (node0, t0, tri0, z, z))
    return Hit(t=t, tri_id=tri, bary_u=bu, bary_v=bv)


def trace_any_bvh(bvh: BVH, rays: Ray, t_min: float = 0.0, t_max=_INF) -> jnp.ndarray:
    """Visibility query: True where ANY hit exists in (t_min, t_max).

    Early-out: a lane that finds an occluder jumps straight to the
    sentinel. t_max may be per-ray (R,) — used for shadow rays toward a
    sampled light point.
    """
    if bvh.num_nodes == 0:
        raise ValueError(
            "BVH has no skip-link nodes (built on a non-CPU backend above the "
            "brute tier, where the cluster kernels own traversal)"
        )
    o = rays.origin
    d = rays.direction
    n_nodes = bvh.num_nodes
    R = o.shape[0]
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (R,))

    safe_d = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv_d = 1.0 / safe_d

    def cond(state):
        node, _ = state
        return jnp.any(node < n_nodes)

    def body(state):
        node, occluded = state
        active = node < n_nodes
        idx = jnp.where(active, node, 0)

        hit_aabb = active & _slab_test(o, inv_d, bvh.node_min[idx], bvh.node_max[idx], t_min, t_max)
        count = bvh.node_tri_count[idx]
        offset = bvh.node_tri_offset[idx]
        is_leaf = count > 0

        found = jnp.zeros_like(occluded)
        test_leaf = hit_aabb & is_leaf
        for k in range(LEAF_SIZE):
            valid = test_leaf & (k < count)
            tid = jnp.where(valid, offset + k, 0)
            h, _, _, _ = _moller_trumbore(
                o, d, bvh.tri_v0[tid], bvh.tri_e1[tid], bvh.tri_e2[tid], t_min, t_max
            )
            found = found | (valid & h)

        occluded = occluded | found
        descend = hit_aabb & ~is_leaf & ~occluded
        nxt = jnp.where(descend, idx + 1, bvh.node_skip[idx])
        nxt = jnp.where(found, n_nodes, nxt)  # early out
        node = jnp.where(active, nxt, node)
        return node, occluded

    node0 = jnp.zeros((R,), jnp.int32)
    occ0 = jnp.zeros((R,), jnp.bool_)
    _, occluded = jax.lax.while_loop(cond, body, (node0, occ0))
    return occluded


def intersect_brute(tri_verts: jnp.ndarray, rays: Ray, t_min: float = 0.0, t_max: float = _INF) -> Hit:
    """O(R*T) oracle: scan over all triangles with lax.fori_loop.

    tri_verts: (T, 3, 3). Ground truth for traversal tests (SURVEY.md §7.2
    step 3) and tiny scenes.
    """
    o = rays.origin
    d = rays.direction
    R = o.shape[0]
    v0 = tri_verts[:, 0]
    e1 = tri_verts[:, 1] - v0
    e2 = tri_verts[:, 2] - v0
    T = tri_verts.shape[0]

    def body(i, state):
        t, tri, bu, bv = state
        h, tk, uk, vk = _moller_trumbore(o, d, v0[i], e1[i], e2[i], t_min, t)
        closer = h
        t = jnp.where(closer, tk, t)
        tri = jnp.where(closer, i, tri)
        bu = jnp.where(closer, uk, bu)
        bv = jnp.where(closer, vk, bv)
        return t, tri, bu, bv

    t0 = jnp.full((R,), t_max, jnp.float32)
    tri0 = jnp.full((R,), -1, jnp.int32)
    z = jnp.zeros((R,), jnp.float32)
    t, tri, bu, bv = jax.lax.fori_loop(0, T, body, (t0, tri0, z, z))
    return Hit(t=t, tri_id=tri, bary_u=bu, bary_v=bv)
