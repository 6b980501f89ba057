"""Pallas TPU ray-intersection kernels (the RT-core replacement's hot tier).

The reference delegates traversal to OptiX RT cores (``owl::traceRay``,
cuda_src/deviceCode.cu:76); XLA-level jnp lowerings of the same work are
memory-bound and select-heavy (measured ~14 ms per 1M-ray trace on a
32-triangle scene).  These kernels own the blocking instead:

* rays live as SoA ``(rows, 128)`` f32 planes (component per input) — a
  full 128-lane vector register per op, no (N, 3) padding waste;
* triangles are processed **8 per step on the sublane dimension**: each
  VPU op tests 8 triangles x 128 rays, so triangle attributes are
  broadcast (sublane-aligned slices of the packed ``(T, 16)`` table) and
  the kernel does **zero** per-lane gathers and zero scalar loads;
* the closest-hit reduction runs over the sublane axis once per step.

The packed triangle row is ``[v0(3), e1(3), e2(3), prim_id(1), pad(6)]``
with ``prim_id`` stored as f32 (exact for ids < 2^24), so the kernel
returns hits in ORIGINAL triangle order directly.

Layout/padding helpers at the bottom convert from the ``accel.build.BVH``
triangle soup; `tests/unit/test_pallas_trace.py` validates ray-for-ray
against the jnp oracle in interpret mode (CPU) and the real lowering is
exercised by the TPU smoke test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hit, Ray

_INF = np.float32(3.0e38)
TRI_SUB = 8  # triangles tested per VPU step (sublane dim)
LANES = 128
ROW_BLK = 32  # ray rows (of 128 rays) per grid program: 4096 rays/program


def _mt_chunk(tri, ox, oy, oz, dx, dy, dz, t_cur):
    """Moller-Trumbore for an (8, 16) triangle chunk vs (ROWS, 128) rays.

    Returns (hit (8, ROWS, 128) bool, t, u, v).  All operands broadcast:
    triangle attributes are (8, 1, 1), ray components (1, ROWS, 128).

    ``tri`` may be an (8, 16) array or a column accessor ``tri(j) ->
    (8, 1, 1)`` (the cluster kernel passes lane-extracts of a wider
    block: Mosaic cannot read refs at lane offsets, so slicing happens
    on the loaded value).
    """
    c = tri if callable(tri) else (lambda j: tri[:, j][:, None, None])  # (8, 1, 1)
    v0x, v0y, v0z = c(0), c(1), c(2)
    e1x, e1y, e1z = c(3), c(4), c(5)
    e2x, e2y, e2z = c(6), c(7), c(8)
    o_x, o_y, o_z = ox[None], oy[None], oz[None]
    d_x, d_y, d_z = dx[None], dy[None], dz[None]

    px = d_y * e2z - d_z * e2y
    py = d_z * e2x - d_x * e2z
    pz = d_x * e2y - d_y * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tx = o_x - v0x
    ty = o_y - v0y
    tz = o_z - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (d_x * qx + d_y * qy + d_z * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    hit = (
        (jnp.abs(det) >= 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    if t_cur is not None:  # None: caller orders hits itself (packed keys)
        hit = hit & (t < t_cur[None])
    return hit, t, u, v


def _closest_kernel(n_chunks: int, tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                    tmax_ref, t_ref, id_ref, u_ref, v_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def body(ci, carry):
        t, pid, uu, vv = carry
        tri = tri_ref[pl.ds(ci * TRI_SUB, TRI_SUB), :]  # (8, 16)
        hit, tc, uc, vc = _mt_chunk(tri, ox, oy, oz, dx, dy, dz, t)
        # closest within the chunk (masked argmin over the sublane axis)
        tc_m = jnp.where(hit, tc, _INF)
        best = jnp.argmin(tc_m, axis=0)[None]  # (1, ROWS, 128)
        sub = jax.lax.broadcasted_iota(jnp.int32, tc_m.shape, 0)
        sel = sub == best
        any_hit = jnp.any(hit & sel, axis=0)
        t_best = jnp.min(tc_m, axis=0)
        pick = lambda a: jnp.sum(jnp.where(sel, a, 0.0), axis=0)
        prim = tri[:, 9][:, None, None]  # f32 prim ids
        upd = any_hit & (t_best < t)
        return (
            jnp.where(upd, t_best, t),
            jnp.where(upd, pick(jnp.broadcast_to(prim, tc_m.shape)), pid),
            jnp.where(upd, pick(uc), uu),
            jnp.where(upd, pick(vc), vv),
        )

    t0 = tmax_ref[:]
    pid0 = jnp.full(t0.shape, -1.0, jnp.float32)
    z = jnp.zeros(t0.shape, jnp.float32)
    t, pid, uu, vv = jax.lax.fori_loop(0, n_chunks, body, (t0, pid0, z, z))
    t_ref[:] = t
    id_ref[:] = pid
    u_ref[:] = uu
    v_ref[:] = vv


def _any_kernel(n_chunks: int, tri_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                tmax_ref, occ_ref):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    tmax = tmax_ref[:]

    # int32 mask carry: Mosaic cannot legalize i1 loop carries (scf.for)
    def body(ci, occ):
        tri = tri_ref[pl.ds(ci * TRI_SUB, TRI_SUB), :]
        hit, _, _, _ = _mt_chunk(tri, ox, oy, oz, dx, dy, dz, tmax)
        return occ | jnp.any(hit, axis=0).astype(jnp.int32)

    occ = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros(ox.shape, jnp.int32))
    occ_ref[:] = occ


# ---------------------------------------------------------------------------
# host-side packing + call wrappers
# ---------------------------------------------------------------------------

def _pack_tri_table_np(tri_v0, tri_e1, tri_e2, prim_id, normal=None,
                       mesh_id=None, area=None, pad_to: int = TRI_SUB) -> np.ndarray:
    """Host-side (numpy) body of :func:`pack_tri_table` — kept separate so
    the grouped packer can reshape it WITHOUT a device round-trip (a
    ``np.asarray`` on a just-uploaded 64MB device array costs ~100 s over
    the flaky axon D2H path)."""
    T = tri_v0.shape[0]
    Tp = -(-T // pad_to) * pad_to
    tab = np.zeros((Tp, 16), np.float32)
    tab[:T, 0:3] = np.asarray(tri_v0, np.float32)
    tab[:T, 3:6] = np.asarray(tri_e1, np.float32)
    tab[:T, 6:9] = np.asarray(tri_e2, np.float32)
    tab[:T, 9] = np.asarray(prim_id, np.float32)
    tab[T:, 9] = -1.0
    if normal is not None:
        tab[:T, 10:13] = np.asarray(normal, np.float32)
    if mesh_id is not None:
        tab[:T, 13] = np.asarray(mesh_id, np.float32)
    if area is not None:
        tab[:T, 14] = np.asarray(area, np.float32)
    return tab


def pack_tri_table(tri_v0, tri_e1, tri_e2, prim_id, normal=None, mesh_id=None,
                   area=None, pad_to: int = TRI_SUB, as_numpy: bool = False):
    """(Tpad, 16) f32 table; rows padded to ``pad_to`` with degenerate
    triangles (e1=e2=0 -> det=0, never hit).

    Columns: 0-2 v0 | 3-5 e1 | 6-8 e2 | 9 prim_id | 10-12 representative
    unit normal | 13 mesh_id | 14 area | 15 pad.  prim/mesh ids are exact
    as f32 for ids < 2^24.  Columns 10-14 let the cluster kernel *select*
    hit attributes during traversal instead of gathering per lane after
    (XLA per-lane gathers measured 57 ms / 1M rays on v5e).
    """
    tab = _pack_tri_table_np(
        tri_v0, tri_e1, tri_e2, prim_id,
        normal=normal, mesh_id=mesh_id, area=area, pad_to=pad_to,
    )
    return tab if as_numpy else jnp.asarray(tab)


GROUP_CLUSTER = 64  # triangles per grouped-layout cluster (8 groups x 8 sublanes)


def pack_tri_table_grouped(tri_v0, tri_e1, tri_e2, prim_id, normal=None,
                           mesh_id=None, area=None,
                           cluster_min=None, cluster_max=None,
                           as_numpy: bool = False):
    """(C*8, 128) f32 cluster-grouped table for the big-scene tier.

    Each 64-triangle cluster is one DMA-aligned (8, 128) block: triangle
    ``g*8 + s`` of the cluster has its 16 attributes at ``[s, g*16 + j]``
    (attributes as in :func:`pack_tri_table` columns).  The kernel loads
    the block as a value and lane-extracts columns (Mosaic has no
    lane-offset ref reads).

    The cluster's own AABB rides the otherwise-unused pad columns (attr
    15 of groups 0-5 = bmin.xyz then bmax.xyz, replicated across the
    sublane axis) so the cluster kernel's per-lane slab pretest gets the
    bounds with the same DMA as the triangles.
    """
    # the cluster kernels' per-lane AABB pretest reads attr 15 as the
    # cluster bounds: omitting them would silently all-miss-cull every
    # cluster (zero boxes), so they are REQUIRED here
    assert cluster_min is not None and cluster_max is not None, (
        "pack_tri_table_grouped needs cluster_min/cluster_max: the kernel's "
        "per-lane slab pretest reads them from the pad columns"
    )
    flat = _pack_tri_table_np(
        tri_v0, tri_e1, tri_e2, prim_id,
        normal=normal, mesh_id=mesh_id, area=area, pad_to=GROUP_CLUSTER,
    )
    C = flat.shape[0] // GROUP_CLUSTER
    a = flat.reshape(C, 8, 8, 16).copy()  # (cluster, group, sublane, attr)
    bounds = np.concatenate(
        [np.asarray(cluster_min, np.float32), np.asarray(cluster_max, np.float32)],
        axis=1,
    )  # (C, 6)
    for g in range(6):
        a[:, g, :, 15] = bounds[:, g][:, None]
    out = a.transpose(0, 2, 1, 3).reshape(C * 8, 128)
    return out if as_numpy else jnp.asarray(out)


def _to_planes(rays: Ray, n_pad: int):
    """(N,3) AoS -> six (rows, 128) SoA planes, zero-padded to n_pad."""
    o = rays.origin
    d = rays.direction
    n = o.shape[0]
    pad = n_pad - n

    def plane(a):
        a = jnp.pad(a, (0, pad))
        return a.reshape(-1, LANES)

    return (
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
    )


def _padded_rows(n: int) -> int:
    rows = -(-n // LANES)
    return -(-rows // ROW_BLK) * ROW_BLK


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_closest_tiles(tri_tab: jnp.ndarray, rays: Ray, t_max=_INF, *, interpret: bool = False) -> Hit:
    """Brute-force closest hit over the packed table; Hit in original ids."""
    n = rays.origin.shape[0]
    rows = _padded_rows(n)
    planes = _to_planes(rays, rows * LANES)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tmax = jnp.pad(tmax, (0, rows * LANES - n)).reshape(rows, LANES)
    n_chunks = tri_tab.shape[0] // TRI_SUB

    grid = (rows // ROW_BLK,)
    rspec = pl.BlockSpec((ROW_BLK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    t, pid, u, v = pl.pallas_call(
        functools.partial(_closest_kernel, n_chunks),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [rspec] * 7,
        out_specs=[rspec] * 4,
        out_shape=[out_shape] * 4,
        interpret=interpret,
    )(tri_tab, *planes, tmax)

    flat = lambda a: a.reshape(-1)[:n]
    return Hit(
        t=flat(t),
        tri_id=flat(pid).astype(jnp.int32),
        bary_u=flat(u),
        bary_v=flat(v),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def trace_any_tiles(tri_tab: jnp.ndarray, rays: Ray, t_max=_INF, *, interpret: bool = False) -> jnp.ndarray:
    """Brute-force any-hit (occlusion) over the packed table."""
    n = rays.origin.shape[0]
    rows = _padded_rows(n)
    planes = _to_planes(rays, rows * LANES)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tmax = jnp.pad(tmax, (0, rows * LANES - n)).reshape(rows, LANES)
    n_chunks = tri_tab.shape[0] // TRI_SUB

    grid = (rows // ROW_BLK,)
    rspec = pl.BlockSpec((ROW_BLK, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        functools.partial(_any_kernel, n_chunks),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] + [rspec] * 7,
        out_specs=rspec,
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
        interpret=interpret,
    )(tri_tab, *planes, tmax)
    return occ.reshape(-1)[:n] != 0
