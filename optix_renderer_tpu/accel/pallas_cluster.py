"""Two-phase clustered traversal for big scenes (the TPU answer to the
reference's TLAS/BLAS RT-core traversal, viewer.hpp:506-517).

Scenes above the brute-force tier can't test every triangle per ray, and
per-lane BVH walks are gather-bound on a vector machine (measured ~6 us
per node visit for scalar VMEM reads inside a Pallas while-loop).  The
TPU-native structure chosen here keeps ALL hot work dense:

1. **Cull (XLA, vectorized):** rays are processed in fixed tiles; each
   tile's conservative bounds (origin box x direction interval) are
   slab-tested against every *cluster* AABB (clusters = fixed 64-triangle
   Morton runs from ``accel.build``) as one dense ``(tiles, clusters)``
   computation, then each tile's overlapping clusters are compacted into
   a front-to-back list of at most ``max_visits`` entries.

2. **Intersect (Pallas):** a static grid over ``(tile, k)`` steps; the
   k-th cluster id comes from the scalar-prefetched list and drives the
   triangle-table BlockSpec index_map, so the pipeline double-buffers
   cluster DMA from HBM automatically.  Inside, the sublane-chunk
   Moller-Trumbore of ``accel.pallas_trace`` runs 8 triangles x 128 rays
   per VPU op, and the winning triangle's *shading attributes* (unit
   normal, mesh id, area — packed table cols 10-14) are selected during
   the test, eliminating the post-trace per-lane gather entirely.

Correctness note: a tile visiting more than ``max_visits`` clusters only
tests the nearest ``max_visits`` (front-to-back by conservative entry
distance); ``cull_clusters`` also returns the overflow count so callers
can size ``max_visits`` (tests assert zero overflow on their scenes).
"""

from __future__ import annotations

import dataclasses
import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Ray
from .pallas_trace import LANES, TRI_SUB, _mt_chunk

_INF = np.float32(3.0e38)
TILE_ROWS = 8  # rows of 128 rays per tile: 1024 rays (a 32x32 pixel block)
TILE = TILE_ROWS * LANES
DEFAULT_MAX_VISITS = 1024
# The per-round cluster lists are scalar-prefetch operands and live in SMEM
# (~1 MB/core on v5e); the visit budget beyond one round's worth is served
# by chaining additional kernel rounds over further list segments.
_SMEM_LIST_ENTRIES = 120_000
_NEAR_BITS_TOTAL = 30  # packed list entry: [near quantized | cluster id]


def _round_params(n: int, n_clusters: int, max_visits: int) -> tuple[int, int, int]:
    """(tiles, visits_per_round, n_rounds).  visits_per_round is a power of
    two: SMEM operands are padded to power-of-two row widths."""
    tiles = -(-n // TILE)
    budget = max(32, _SMEM_LIST_ENTRIES // max(tiles, 1))
    rv = 32
    while rv * 2 <= budget and rv < 512:
        rv *= 2
    maxv = min(max_visits, n_clusters)
    rv = min(rv, max(32, maxv))
    return tiles, rv, -(-maxv // rv)


def _cid_bits(n_clusters: int) -> int:
    b = 1
    while (1 << b) < n_clusters:
        b += 1
    return b

pytree = partial(dataclasses.dataclass, frozen=True)


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@pytree
class ClusterHit:
    """Closest hit + kernel-selected shading attributes (flat (N,) each)."""

    t: jnp.ndarray
    tri_id: jnp.ndarray  # i32, original ids; -1 = miss
    bary_u: jnp.ndarray
    bary_v: jnp.ndarray
    normal: jnp.ndarray  # (N, 3) representative unit normal of the hit tri
    mesh_id: jnp.ndarray  # i32
    area: jnp.ndarray


# ---------------------------------------------------------------------------
# phase 1: dense tile-vs-cluster culling (pure XLA)
# ---------------------------------------------------------------------------

def cull_clusters(cluster_min, cluster_max, rays: Ray, t_max, n_pad: int, max_visits: int):
    """Per-tile front-to-back cluster lists.

    Returns (lists (tiles, max_visits) i32, counts (tiles,) i32,
    overflow (tiles,) i32 — clusters dropped beyond max_visits).
    """
    n = rays.origin.shape[0]
    o = jnp.pad(rays.origin, ((0, n_pad - n), (0, 0)))
    d = jnp.pad(rays.direction, ((0, n_pad - n), (0, 0)))
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tmax = jnp.pad(tmax, (0, n_pad - n))
    tiles = n_pad // TILE

    ot = o.reshape(tiles, TILE, 3)
    dt = d.reshape(tiles, TILE, 3)
    o_lo = ot.min(axis=1)  # (tiles, 3)
    o_hi = ot.max(axis=1)
    d_lo = dt.min(axis=1)
    d_hi = dt.max(axis=1)
    t_hi = tmax.reshape(tiles, TILE).max(axis=1)  # (tiles,)

    near = jnp.zeros((tiles, cluster_min.shape[0]), jnp.float32)
    far = jnp.broadcast_to(t_hi[:, None], near.shape)
    for a in range(3):
        bmin = cluster_min[None, :, a]  # (1, C)
        bmax = cluster_max[None, :, a]
        n_lo = bmin - o_hi[:, a:a + 1]  # (tiles, C)
        n_hi = bmax - o_lo[:, a:a + 1]
        dl = d_lo[:, a:a + 1]
        dh = d_hi[:, a:a + 1]
        straddle = (dl <= 0.0) & (dh >= 0.0)
        sdl = jnp.where(jnp.abs(dl) < 1e-20, 1e-20, dl)
        sdh = jnp.where(jnp.abs(dh) < 1e-20, 1e-20, dh)
        q1 = n_lo / sdl
        q2 = n_lo / sdh
        q3 = n_hi / sdl
        q4 = n_hi / sdh
        near_a = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
        far_a = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
        # a direction interval straddling zero gives an unbounded slab
        # interval UNLESS the whole origin box is outside the slab and
        # cannot cross it; stay conservative (pass) in that case.
        near_a = jnp.where(straddle, -_INF, near_a)
        far_a = jnp.where(straddle, _INF, far_a)
        near = jnp.maximum(near, near_a)
        far = jnp.minimum(far, far_a)

    overlap = near <= far
    key = jnp.where(overlap, jnp.maximum(near, 0.0), _INF)
    order = jnp.argsort(key, axis=1)[:, :max_visits].astype(jnp.int32)
    nears = jnp.take_along_axis(key, order, axis=1)  # sorted entry distances
    total = overlap.sum(axis=1).astype(jnp.int32)
    counts = jnp.minimum(total, max_visits)
    # Pad unused slots with the tile's LAST real cluster id: the pipeline
    # skips the cluster DMA whenever the BlockSpec index repeats, so
    # padded grid steps cost only the (skipped) compute guard.
    last = jnp.take_along_axis(
        order, jnp.maximum(counts - 1, 0)[:, None].astype(jnp.int32), axis=1
    )
    slot = jnp.arange(max_visits, dtype=jnp.int32)[None, :]
    lists = jnp.where(slot < counts[:, None], order, last)

    # Pack each entry's conservative near distance (floor-quantized on a
    # per-tile scale, so the decoded value never exceeds the true one)
    # into the high bits: ONE SMEM-resident scalar-prefetch array instead
    # of a second float list.
    cb = _cid_bits(cluster_min.shape[0])
    nb = _NEAR_BITS_TOTAL - cb
    valid_near = jnp.where(slot < counts[:, None], nears, 0.0)
    scale = jnp.maximum(valid_near.max(axis=1), 1e-6)  # (tiles,)
    nearq = jnp.clip(
        jnp.floor(valid_near / scale[:, None] * ((1 << nb) - 1)), 0, (1 << nb) - 1
    ).astype(jnp.int32)
    packed = (nearq << cb) | lists
    return packed, counts, scale, total - counts


# ---------------------------------------------------------------------------
# phase 2: Pallas intersect kernels
# ---------------------------------------------------------------------------

def _closest_cluster_kernel(cluster: int, cid_bits: int,
                            lst_ref, cnt_ref, scale_ref, tri_ref,
                            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                            t_in, pid_in, u_in, v_in, nx_in, ny_in, nz_in,
                            mesh_in, area_in,
                            t_ref, pid_ref, u_ref, v_ref, nx_ref, ny_ref, nz_ref,
                            mesh_ref, area_ref, tbound_ref):
    """One ROUND of closest-hit cluster visits; state chains through the
    t/pid/... planes so multiple rounds extend the per-tile visit budget
    beyond what one SMEM-resident list allows."""
    ti = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        for r, i in zip(
            (t_ref, pid_ref, u_ref, v_ref, nx_ref, ny_ref, nz_ref, mesh_ref, area_ref),
            (t_in, pid_in, u_in, v_in, nx_in, ny_in, nz_in, mesh_in, area_in),
        ):
            r[:] = i[:]
        tbound_ref[0] = jnp.max(t_in[:])

    # Front-to-back early termination: the list is sorted by conservative
    # entry distance (floor-quantized in the entry's high bits), so once a
    # cluster starts beyond every lane's current closest hit, no remaining
    # cluster can improve any lane.  The bound lives in SMEM scratch,
    # updated only when a visit actually runs.
    nb = _NEAR_BITS_TOTAL - cid_bits
    near_k = (lst_ref[ti, k] >> cid_bits).astype(jnp.float32) * (
        scale_ref[ti] / ((1 << nb) - 1)
    )

    @pl.when((k < cnt_ref[ti]) & (near_k < tbound_ref[0]))
    def _visit():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

        def body(ci, carry):
            t, pid, uu, vv, nx, ny, nz, mid, ar = carry
            tri = tri_ref[pl.ds(ci * TRI_SUB, TRI_SUB), :]  # (8, 16)
            hit, tc, uc, vc = _mt_chunk(tri, ox, oy, oz, dx, dy, dz, t)
            tc_m = jnp.where(hit, tc, _INF)
            best = jnp.argmin(tc_m, axis=0)[None]
            sub = jax.lax.broadcasted_iota(jnp.int32, tc_m.shape, 0)
            sel = sub == best
            any_hit = jnp.any(hit & sel, axis=0)
            t_best = jnp.min(tc_m, axis=0)
            upd = any_hit & (t_best < t)

            def pick(a):
                return jnp.sum(jnp.where(sel, a, 0.0), axis=0)

            def pick_col(j):
                return pick(jnp.broadcast_to(tri[:, j][:, None, None], tc_m.shape))

            return (
                jnp.where(upd, t_best, t),
                jnp.where(upd, pick_col(9), pid),
                jnp.where(upd, pick(uc), uu),
                jnp.where(upd, pick(vc), vv),
                jnp.where(upd, pick_col(10), nx),
                jnp.where(upd, pick_col(11), ny),
                jnp.where(upd, pick_col(12), nz),
                jnp.where(upd, pick_col(13), mid),
                jnp.where(upd, pick_col(14), ar),
            )

        init = (t_ref[:], pid_ref[:], u_ref[:], v_ref[:], nx_ref[:], ny_ref[:],
                nz_ref[:], mesh_ref[:], area_ref[:])
        out = jax.lax.fori_loop(0, cluster // TRI_SUB, body, init)
        for r, val in zip((t_ref, pid_ref, u_ref, v_ref, nx_ref, ny_ref, nz_ref,
                           mesh_ref, area_ref), out):
            r[:] = val
        tbound_ref[0] = jnp.max(out[0])


def _any_cluster_kernel(cluster: int, cid_bits: int,
                        lst_ref, cnt_ref, scale_ref, tri_ref,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                        occ_in, occ_ref, done_ref):
    ti = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        occ_ref[:] = occ_in[:]
        done_ref[0] = jnp.min(occ_in[:])  # 1 iff every lane already occluded

    # skip remaining clusters once every lane is occluded (SMEM flag)
    @pl.when((k < cnt_ref[ti]) & (done_ref[0] == 0))
    def _visit():
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmax = tmax_ref[:]

        def body(ci, occ):
            tri = tri_ref[pl.ds(ci * TRI_SUB, TRI_SUB), :]
            hit, _, _, _ = _mt_chunk(tri, ox, oy, oz, dx, dy, dz, tmax)
            return occ | jnp.any(hit, axis=0).astype(jnp.int32)

        occ = jax.lax.fori_loop(0, cluster // TRI_SUB, body, occ_ref[:])
        occ_ref[:] = occ
        done_ref[0] = jnp.min(occ)


def _planes(rays: Ray, tmax, n_pad: int):
    n = rays.origin.shape[0]
    pad = n_pad - n

    def plane(a):
        return jnp.pad(a, (0, pad)).reshape(-1, LANES)

    o, d = rays.origin, rays.direction
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    return (
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(tmax),
    )


@functools.partial(jax.jit, static_argnames=("max_visits", "interpret"))
def trace_closest_clusters(
    tri_tab: jnp.ndarray,
    cluster_min: jnp.ndarray,
    cluster_max: jnp.ndarray,
    rays: Ray,
    t_max=_INF,
    *,
    max_visits: int = DEFAULT_MAX_VISITS,
    interpret: bool = False,
):
    """Returns (ClusterHit, culling overflow count (scalar i32))."""
    n = rays.origin.shape[0]
    C = cluster_min.shape[0]
    cluster = tri_tab.shape[0] // C  # table rows are padded to C*cluster
    tiles, rv, n_rounds = _round_params(n, C, max_visits)
    n_pad = tiles * TILE

    lists, counts, scales, overflow = cull_clusters(
        cluster_min, cluster_max, rays, t_max, n_pad, rv * n_rounds
    )
    planes = _planes(rays, t_max, n_pad)
    ox, oy, oz, dx, dy, dz, tmax_plane = planes

    cb = _cid_bits(C)
    cmask = (1 << cb) - 1
    tile_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda t, k, lst, cnt, sc: (t, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (cluster, 16), lambda t, k, lst, cnt, sc: (lst[t, k] & cmask, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles, rv),
        in_specs=[tri_spec] + [tile_spec] * 15,
        out_specs=[tile_spec] * 9,
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )
    out_shape = [jax.ShapeDtypeStruct((tiles * TILE_ROWS, LANES), jnp.float32)] * 9
    zeros = jnp.zeros_like(tmax_plane)
    state = (tmax_plane, jnp.full_like(tmax_plane, -1.0), zeros, zeros,
             zeros, zeros, zeros, zeros, zeros)
    for r in range(n_rounds):
        sl = slice(r * rv, (r + 1) * rv)
        state = pl.pallas_call(
            functools.partial(_closest_cluster_kernel, cluster, cb),
            grid_spec=grid_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(
            lists[:, sl],
            jnp.clip(counts - r * rv, 0, rv),
            scales,
            tri_tab, ox, oy, oz, dx, dy, dz, *state,
        )
    t, pid, u, v, nx, ny, nz, mid, ar = state

    flat = lambda a: a.reshape(-1)[:n]
    hit = ClusterHit(
        t=flat(t),
        tri_id=flat(pid).astype(jnp.int32),
        bary_u=flat(u),
        bary_v=flat(v),
        normal=jnp.stack([flat(nx), flat(ny), flat(nz)], axis=-1),
        mesh_id=flat(mid).astype(jnp.int32),
        area=flat(ar),
    )
    return hit, overflow.sum()


@functools.partial(jax.jit, static_argnames=("max_visits", "interpret"))
def trace_any_clusters(
    tri_tab: jnp.ndarray,
    cluster_min: jnp.ndarray,
    cluster_max: jnp.ndarray,
    rays: Ray,
    t_max=_INF,
    *,
    max_visits: int = DEFAULT_MAX_VISITS,
    interpret: bool = False,
):
    """Occlusion query; returns (occluded (N,) bool, overflow)."""
    n = rays.origin.shape[0]
    C = cluster_min.shape[0]
    cluster = tri_tab.shape[0] // C  # table rows are padded to C*cluster
    tiles, rv, n_rounds = _round_params(n, C, max_visits)
    n_pad = tiles * TILE

    lists, counts, scales, overflow = cull_clusters(
        cluster_min, cluster_max, rays, t_max, n_pad, rv * n_rounds
    )
    planes = _planes(rays, t_max, n_pad)

    cb = _cid_bits(C)
    cmask = (1 << cb) - 1
    tile_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda t, k, lst, cnt, sc: (t, 0), memory_space=pltpu.VMEM
    )
    tri_spec = pl.BlockSpec(
        (cluster, 16), lambda t, k, lst, cnt, sc: (lst[t, k] & cmask, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(tiles, rv),
        in_specs=[tri_spec] + [tile_spec] * 8,
        out_specs=tile_spec,
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )
    occ = jnp.zeros((tiles * TILE_ROWS, LANES), jnp.int32)
    for r in range(n_rounds):
        sl = slice(r * rv, (r + 1) * rv)
        occ = pl.pallas_call(
            functools.partial(_any_cluster_kernel, cluster, cb),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tiles * TILE_ROWS, LANES), jnp.int32),
            interpret=interpret,
        )(
            lists[:, sl],
            jnp.clip(counts - r * rv, 0, rv),
            scales,
            tri_tab, *planes, occ,
        )
    return occ.reshape(-1)[:n] != 0, overflow.sum()
