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

2. **Intersect (Pallas):** one grid step per ray tile; the visit loop is
   a ``lax.while_loop`` inside the kernel (measured ~0.1 us/iteration
   with SMEM scalar control) with manual double-buffered cluster DMA
   from HBM and front-to-back early termination, so a tile pays exactly
   for the clusters it visits.  Inside, the sublane-chunk
   Moller-Trumbore of ``accel.pallas_trace`` runs 8 triangles x 128 rays
   per VPU op, and the winning triangle's *shading attributes* (unit
   normal, mesh id, area — packed table cols 10-14) are selected during
   the test, eliminating the post-trace per-lane gather entirely.

Measured on v5e at 1024x1024 primary rays (trace+shade): 16.6 Mrays/s on
a 100k-triangle terrain, 4.8 Mrays/s at 1M triangles.  Future work: a
hierarchical cull (supercluster level) and an MXU-form intersection test.

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
from .pallas_trace import GROUP_CLUSTER, LANES, TRI_SUB, _mt_chunk

_INF = np.float32(3.0e38)
TILE_ROWS = 8  # rows of 128 rays per tile: 1024 rays (a 32x32 pixel block)
TILE = TILE_ROWS * LANES
DEFAULT_MAX_VISITS = 1024  # per-tile visited-cluster cap; culling
# overflow beyond it is counted and returned.  Lists live in HBM and are
# DMA'd per tile into SMEM scratch (not scalar-prefetch operands), so the
# cap is bounded by scratch size, not the 1MB SMEM prefetch budget.
_NEAR_BITS_TOTAL = 30  # packed list entry: [near quantized | cluster id]


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
#
# Grid = one step per ray TILE.  The visit loop is a lax.while_loop INSIDE
# the kernel (~0.1 us/iteration with SMEM scalar control, measured) with
# manual double-buffered cluster DMA from HBM, so a tile pays exactly for
# the clusters it visits, with front-to-back early termination.  The
# cluster table uses the grouped (C*8, 128) layout: one aligned (8, 128)
# DMA per cluster; the kernel loads it as a value and lane-extracts
# triangle attributes (Mosaic has no lane-offset ref reads).
# ---------------------------------------------------------------------------

_N_BUF = 2  # cluster DMA double buffer


def _chunk_cols(blk, ci):
    """Column accessor for chunk ci of a loaded (8, 128) cluster block."""
    return lambda j: blk[:, ci * 16 + j][:, None, None]


def _closest_cluster_kernel(cid_bits: int, maxv: int,
                            cnt_ref, scale_ref, lst_ref, tri_hbm,
                            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                            tmax_ref,
                            t_ref, pid_ref, u_ref, v_ref, nx_ref, ny_ref, nz_ref,
                            mesh_ref, area_ref,
                            lst_scr, buf, sems, lsem):
    ti = pl.program_id(0)
    nb = _NEAR_BITS_TOTAL - cid_bits
    cmask = (1 << cid_bits) - 1
    near_scale = scale_ref[ti] / ((1 << nb) - 1)
    cnt = cnt_ref[ti]
    lw = maxv // 8

    lcopy = pltpu.make_async_copy(lst_ref, lst_scr, lsem)
    lcopy.start()

    t_ref[:] = tmax_ref[:]
    pid_ref[:] = jnp.full(t_ref.shape, -1.0, jnp.float32)
    for r in (u_ref, v_ref, nx_ref, ny_ref, nz_ref, mesh_ref, area_ref):
        r[:] = jnp.zeros(t_ref.shape, jnp.float32)

    lcopy.wait()

    def lst_at(k):
        return lst_scr[k // lw, k % lw]

    def cluster_dma(slot, k):
        cid = lst_at(k) & cmask
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(cid * 8, 8), :], buf.at[slot], sems.at[slot]
        )

    @pl.when(cnt > 0)
    def _run():
        cluster_dma(0, 0).start()
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

        def cond(state):
            k, t_bound = state
            near_k = (lst_at(k) >> cid_bits).astype(jnp.float32) * near_scale
            return (k < cnt) & (near_k < t_bound)

        def visit(state):
            k, _ = state

            @pl.when(k + 1 < cnt)
            def _prefetch():
                cluster_dma((k + 1) % _N_BUF, k + 1).start()

            cluster_dma(k % _N_BUF, k).wait()
            blk = buf[k % _N_BUF]  # (8, 128) value

            for ci in range(GROUP_CLUSTER // TRI_SUB):  # static unroll
                t = t_ref[:]
                hit, tc, uc, vc = _mt_chunk(
                    _chunk_cols(blk, ci), ox, oy, oz, dx, dy, dz, t
                )
                tc_m = jnp.where(hit, tc, _INF)
                t_best = jnp.min(tc_m, axis=0)
                upd = t_best < t

                # attribute selection (~half the ops) only on improvement
                @pl.when(jnp.any(upd))
                def _improve(t=t, tc_m=tc_m, t_best=t_best, upd=upd, uc=uc, vc=vc, ci=ci):
                    best = jnp.argmin(tc_m, axis=0)[None]
                    sub = jax.lax.broadcasted_iota(jnp.int32, tc_m.shape, 0)
                    sel = sub == best
                    col = _chunk_cols(blk, ci)

                    def pick(a):
                        return jnp.sum(jnp.where(sel, a, 0.0), axis=0)

                    def pick_col(j):
                        return pick(jnp.broadcast_to(col(j), tc_m.shape))

                    t_ref[:] = jnp.where(upd, t_best, t)
                    pid_ref[:] = jnp.where(upd, pick_col(9), pid_ref[:])
                    u_ref[:] = jnp.where(upd, pick(uc), u_ref[:])
                    v_ref[:] = jnp.where(upd, pick(vc), v_ref[:])
                    nx_ref[:] = jnp.where(upd, pick_col(10), nx_ref[:])
                    ny_ref[:] = jnp.where(upd, pick_col(11), ny_ref[:])
                    nz_ref[:] = jnp.where(upd, pick_col(12), nz_ref[:])
                    mesh_ref[:] = jnp.where(upd, pick_col(13), mesh_ref[:])
                    area_ref[:] = jnp.where(upd, pick_col(14), area_ref[:])

            return (k + 1, jnp.max(t_ref[:]))

        k_end, _ = jax.lax.while_loop(cond, visit, (jnp.int32(0), jnp.max(t_ref[:])))

        # drain: early termination leaves the k_end prefetch in flight, and
        # a DMA outstanding at kernel exit is undefined behaviour
        @pl.when(k_end < cnt)
        def _drain():
            cluster_dma(k_end % _N_BUF, k_end).wait()


def _any_cluster_kernel(cid_bits: int, maxv: int,
                        cnt_ref, scale_ref, lst_ref, tri_hbm,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tmax_ref, occ_ref,
                        lst_scr, buf, sems, lsem):
    ti = pl.program_id(0)
    cmask = (1 << cid_bits) - 1
    cnt = cnt_ref[ti]
    lw = maxv // 8

    lcopy = pltpu.make_async_copy(lst_ref, lst_scr, lsem)
    lcopy.start()
    occ_ref[:] = jnp.zeros(occ_ref.shape, jnp.int32)
    lcopy.wait()

    def lst_at(k):
        return lst_scr[k // lw, k % lw]

    def cluster_dma(slot, k):
        cid = lst_at(k) & cmask
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(cid * 8, 8), :], buf.at[slot], sems.at[slot]
        )

    @pl.when(cnt > 0)
    def _run():
        cluster_dma(0, 0).start()
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        tmax = tmax_ref[:]

        def cond(state):
            k, done = state
            return (k < cnt) & (done == 0)

        def visit(state):
            k, _ = state

            @pl.when(k + 1 < cnt)
            def _prefetch():
                cluster_dma((k + 1) % _N_BUF, k + 1).start()

            cluster_dma(k % _N_BUF, k).wait()
            blk = buf[k % _N_BUF]

            occ = occ_ref[:]
            for ci in range(GROUP_CLUSTER // TRI_SUB):
                hit, _, _, _ = _mt_chunk(
                    _chunk_cols(blk, ci), ox, oy, oz, dx, dy, dz, tmax
                )
                occ = occ | jnp.any(hit, axis=0).astype(jnp.int32)
            occ_ref[:] = occ
            return (k + 1, jnp.min(occ))

        k_end, _ = jax.lax.while_loop(cond, visit, (jnp.int32(0), jnp.int32(0)))

        @pl.when(k_end < cnt)
        def _drain():
            cluster_dma(k_end % _N_BUF, k_end).wait()


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
    assert tri_tab.shape[0] == C * 8 and tri_tab.shape[1] == 128, (
        "big-scene tier needs the grouped (C*8, 128) table (pack_tri_table_grouped)"
    )
    tiles = -(-n // TILE)
    n_pad = tiles * TILE
    maxv = -(-min(max_visits, C) // 128) * 128  # (8, maxv//8) list blocks

    lists, counts, scales, overflow = cull_clusters(
        cluster_min, cluster_max, rays, t_max, n_pad, min(maxv, C)
    )
    if lists.shape[1] < maxv:
        lists = jnp.pad(lists, ((0, 0), (0, maxv - lists.shape[1])), mode="edge")
    lists = lists.reshape(tiles * 8, maxv // 8)
    planes = _planes(rays, t_max, n_pad)

    cb = _cid_bits(C)
    tile_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda t, cnt, sc: (t, 0), memory_space=pltpu.VMEM
    )
    lst_spec = pl.BlockSpec(
        (8, maxv // 8), lambda t, cnt, sc: (t, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[lst_spec, pl.BlockSpec(memory_space=pl.ANY)] + [tile_spec] * 7,
        out_specs=[tile_spec] * 9,
        scratch_shapes=[
            pltpu.SMEM((8, maxv // 8), jnp.int32),
            pltpu.VMEM((_N_BUF, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out_shape = [jax.ShapeDtypeStruct((tiles * TILE_ROWS, LANES), jnp.float32)] * 9
    t, pid, u, v, nx, ny, nz, mid, ar = pl.pallas_call(
        functools.partial(_closest_cluster_kernel, cb, maxv),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts, scales, lists, tri_tab, *planes)

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
    assert tri_tab.shape[0] == C * 8 and tri_tab.shape[1] == 128, (
        "big-scene tier needs the grouped (C*8, 128) table (pack_tri_table_grouped)"
    )
    tiles = -(-n // TILE)
    n_pad = tiles * TILE
    maxv = -(-min(max_visits, C) // 128) * 128

    lists, counts, scales, overflow = cull_clusters(
        cluster_min, cluster_max, rays, t_max, n_pad, min(maxv, C)
    )
    if lists.shape[1] < maxv:
        lists = jnp.pad(lists, ((0, 0), (0, maxv - lists.shape[1])), mode="edge")
    lists = lists.reshape(tiles * 8, maxv // 8)
    planes = _planes(rays, t_max, n_pad)

    cb = _cid_bits(C)
    tile_spec = pl.BlockSpec(
        (TILE_ROWS, LANES), lambda t, cnt, sc: (t, 0), memory_space=pltpu.VMEM
    )
    lst_spec = pl.BlockSpec(
        (8, maxv // 8), lambda t, cnt, sc: (t, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[lst_spec, pl.BlockSpec(memory_space=pl.ANY)] + [tile_spec] * 7,
        out_specs=tile_spec,
        scratch_shapes=[
            pltpu.SMEM((8, maxv // 8), jnp.int32),
            pltpu.VMEM((_N_BUF, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    occ = pl.pallas_call(
        functools.partial(_any_cluster_kernel, cb, maxv),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tiles * TILE_ROWS, LANES), jnp.int32),
        interpret=interpret,
    )(counts, scales, lists, tri_tab, *planes)
    return occ.reshape(-1)[:n] != 0, overflow.sum()
