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
   computation.  Each tile's overlapping clusters become a front-to-back
   list of at most ``max_visits`` packed ``[near | cluster id]`` entries,
   selected with ONE ``lax.top_k`` over the packed int32 keys (the near
   distance is floor-quantized into the high bits, so sorting the packed
   value sorts by near and carries the id for free — no argsort, no
   gather; the argsort this replaced cost 25-30 ms/trace at 1M tris).

2. **Intersect (Pallas):** one grid step per ray tile; the visit loop is
   a ``lax.while_loop`` inside the kernel (measured ~0.1 us/iteration
   with SMEM scalar control) with manual double-buffered cluster DMA
   from HBM and front-to-back early termination.  Each visit first runs
   a cheap per-lane ray-vs-cluster-AABB slab test (the cluster bounds
   ride the grouped table's pad columns, so they arrive with the same
   DMA) and the 8x(8 tris x 128 rays) Moller-Trumbore block is skipped
   entirely when no lane in the tile can improve — the per-RAY
   refinement the tile-level frustum cull cannot express.  The kernel
   selects only (t, prim id, bary); shading attributes are gathered
   post-trace by id from a packed per-triangle table (one (N, K) row
   gather), which also provides interpolated normals/uvs/textures at
   full fidelity.

Correctness: a tile whose overlapping-cluster count exceeds
``max_visits`` keeps the nearest ``max_visits`` (by conservative entry
distance).  That truncation is *checked*, never silent: the cull also
returns the entry distance of the first dropped cluster, and any tile
whose achieved hit distance does not beat it is re-traced by a fallback
kernel pass over the FULL cluster list (masked to the unresolved tiles
only, wrapped in ``lax.cond`` so the common case pays nothing).  The
result is exact for every ``max_visits``; the cap is purely a perf knob.
Matches the RT cores' contract: they never drop hits
(cuda_src/deviceCode.cu:76).

Every ray's ``t_max`` is pre-clamped by a per-ray supercluster sweep
(``ray_t_bounds``): rays overlapping no geometry get t=0, so sky lanes
cannot poison the tile-level front-to-back early-out with t=inf.

Incoherent (bounce/shadow) traces differ in two ways.  (1) They use
``cull_clusters_per_lane`` instead of the tile-frustum cull: every
cluster is slab-tested against every INDIVIDUAL lane within its own t
bound (dense chunked XLA, supercluster-first above _TWO_LEVEL_MIN_C
clusters), because a tile-level frustum is hostage to its worst lane
and lists ~20% of ALL clusters for bounce tiles (measured; the
per-lane lists are hit-set sized).  (2) Optionally (OPTIX_TPU_ROW_BOUNCE,
default OFF) they run the kernels at ROW granularity — one grid step per
128-ray row, lists/counts per row — via overlapping (8, 128) blocks
(index map ``t // 8``, each step touching only sublane ``t % 8``), since
Mosaic rejects sub-8-row BlockSpecs outside interpret mode.  Row lists
are ~4x smaller, but hardware A/Bs measured row mode strictly worse
(see the _ROW_BOUNCE comment): 8x more rows swamps the smaller lists,
and per-visit MT cost is vreg-quantized so it does not shrink.  The
closest kernel is branchless packed-key (quantized t | local tri id,
one min per chunk) with exact (t, u, v, prim) recomputed post-trace
from the flat geometry table.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import Hit, Ray
from .pallas_trace import GROUP_CLUSTER, LANES, TRI_SUB, _mt_chunk

_INF = np.float32(3.0e38)
# Default rays-per-tile: 8 rows of 128 = 1024 rays (a 32x32 pixel block).
# ``tile_rows`` is a static parameter of the trace entry points: smaller
# tiles have tighter frusta (fewer clusters each) but more per-tile
# overhead — benchmarks/sim_cull.py quantifies the trade; the env var
# OPTIX_TPU_TILE_ROWS overrides the default for hardware A/Bs.
TILE_ROWS = int(os.environ.get("OPTIX_TPU_TILE_ROWS", "8"))
assert 1 <= TILE_ROWS <= 8, (
    "OPTIX_TPU_TILE_ROWS must be in [1, 8]: the grouped cluster block has "
    "8 sublanes and _lane_slab slices blk[:rows] out of it"
)
TILE = TILE_ROWS * LANES
DEFAULT_MAX_VISITS = int(os.environ.get("OPTIX_TPU_MAX_VISITS", "1024"))
assert DEFAULT_MAX_VISITS >= 1, "OPTIX_TPU_MAX_VISITS must be positive"
# per-tile visited-cluster cap; overflowing tiles are detected and
# re-traced with the full list (see module doc).  Lists live in HBM and
# are DMA'd per tile into SMEM scratch, so the cap is bounded by scratch
# size, not the 1MB SMEM prefetch budget.
_NEAR_BITS_TOTAL = 30  # packed list entry: [near quantized | cluster id]


def _cid_bits(n_clusters: int) -> int:
    b = 1
    while (1 << b) < n_clusters:
        b += 1
    return b

def zero_trace_stats() -> dict:
    """Shape/dtype-stable trace statistics (carryable through lax loops)."""
    z = jnp.int32(0)
    return {"overflow": z, "retraced": z, "unresolved_tiles": z}


def merge_trace_stats(a: dict, b: dict) -> dict:
    return {k: a[k] + b[k] for k in a}


def clamp_t_exit(cluster_min, cluster_max, rays: Ray, t_max):
    """Per-ray t_max clamped to the scene-box exit distance.

    Every triangle lies inside the root AABB, so any hit satisfies
    t <= far(root box); rays missing the box entirely cannot hit at all
    (t_max = 0).  This keeps miss lanes from carrying t=inf, which would
    defeat the front-to-back early termination for their whole tile.
    """
    lo = cluster_min.min(axis=0)
    hi = cluster_max.max(axis=0)
    o, d = rays.origin, rays.direction
    safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv = 1.0 / safe
    t0 = (lo[None, :] - o) * inv
    t1 = (hi[None, :] - o) * inv
    near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hits_box = (near <= far) & (far > 0.0)
    exit_t = far * 1.0001 + 1e-3  # margin: triangles on the box surface
    t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (o.shape[0],))
    return jnp.where(hits_box, jnp.minimum(t, exit_t), 0.0)


_SC_GROUP = 64  # clusters per supercluster in the per-ray t-bound sweep
_SC_KEEP = int(os.environ.get("OPTIX_TPU_SC_KEEP", "96"))  # per-lane cull
# list width in supercluster units (_SC_KEEP * _SC_GROUP = 6144 entries
# at the default 96): bounds the kernel's SMEM list block; live counts
# are hit-set sized so the cap is rarely reached (checked by the
# overflow fallback when it is)
assert _SC_KEEP >= 1, "OPTIX_TPU_SC_KEEP must be positive"


def _sc_slab_sweep(cluster_min, cluster_max, rays: Ray):
    """Dense per-ray slab sweep over *supercluster* AABBs
    (Morton-contiguous groups of 64 cluster boxes; the cluster boxes
    themselves when there are few).  Returns ``(near, far, hit)`` as
    (N, S) arrays — callers reduce them (XLA fuses the reductions into
    the sweep, so sharing this between the t-bound and the coherence
    sort key costs ONE pass instead of two)."""
    C = cluster_min.shape[0]
    G = 1 if C <= 512 else _SC_GROUP
    S = -(-C // G)
    pad = S * G - C
    cmin = jnp.pad(cluster_min, ((0, pad), (0, 0)), constant_values=_INF)
    cmax = jnp.pad(cluster_max, ((0, pad), (0, 0)), constant_values=-_INF)
    sc_min = cmin.reshape(S, G, 3).min(axis=1)  # (S, 3)
    sc_max = cmax.reshape(S, G, 3).max(axis=1)

    o, d = rays.origin, rays.direction
    safe = jnp.where(jnp.abs(d) < 1e-20, jnp.where(d < 0, -1e-20, 1e-20), d)
    inv = 1.0 / safe  # (N, 3)
    # componentwise axis loop: an (N, S, 3) intermediate would pad the
    # trailing xyz triple 3 -> 128 lanes on TPU (42x the HBM traffic;
    # measured 10.7 -> ~4 ms on the 1M-ray terrain sweep)
    near = None
    far = None
    for a in range(3):
        t0 = (sc_min[None, :, a] - o[:, a:a + 1]) * inv[:, a:a + 1]  # (N, S)
        t1 = (sc_max[None, :, a] - o[:, a:a + 1]) * inv[:, a:a + 1]
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1)
        near = lo if near is None else jnp.maximum(near, lo)
        far = hi if far is None else jnp.minimum(far, hi)
    hit = (near <= far) & (far > 0.0)
    return near, far, hit


def _t_bound_from_sweep(far, hit, t_max, n):
    far_bound = jnp.max(jnp.where(hit, far, 0.0), axis=-1)  # (N,)
    any_hit = jnp.any(hit, axis=-1)
    t = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    # margin: triangles exactly on a supercluster face
    return jnp.where(any_hit, jnp.minimum(t, far_bound * 1.0001 + 1e-3), 0.0)


def ray_t_bounds(cluster_min, cluster_max, rays: Ray, t_max):
    """Per-ray conservative hit-distance upper bound from a dense slab
    sweep over supercluster AABBs (see :func:`_sc_slab_sweep`).

    Any hit lies inside some cluster the ray overlaps, so
    ``t_hit <= max over overlapped superclusters of far(sc)``; a ray that
    overlaps NO supercluster provably misses everything (t = 0).  This is
    the per-ray occlusion knowledge the tile-level cull cannot express:
    without it, sky lanes carry the root-box exit distance and a single
    such lane keeps its whole tile visiting clusters to the horizon (the
    front-to-back early-out tests the tile's max t).  Replaces the plain
    root-box clamp (``clamp_t_exit``) in the trace entry points.
    """
    _near, far, hit = _sc_slab_sweep(cluster_min, cluster_max, rays)
    return _t_bound_from_sweep(far, hit, t_max, rays.origin.shape[0])


def corridor_keys_and_t_bounds(cluster_min, cluster_max, rays: Ray,
                               t_max=_INF):
    """ONE supercluster slab sweep -> (coherence sort keys (N,) i32,
    per-ray t bounds (N,) f32 — exactly :func:`ray_t_bounds`).

    The key samples the ray's supercluster CORRIDOR at three points —
    the ids of the first, middle and last overlapped supercluster along
    the ray — so rays sorted together traverse near-identical cluster
    sets.  Measured on the 1M-tri terrain bounce workload (1024^2,
    cosine-sampled, sim_sortkey.py): per-tile visit-list unions sum
    835k (octant|origin-morton key) -> 552k, p50 678 -> 112, overflow
    tiles 421 -> 278; per-lane demand is only ~5 live superclusters, so
    corridor grouping is what converts per-LANE culling into small
    per-TILE lists.  Dead/miss lanes (no overlapped supercluster) get
    key INT32_MAX: they sort last, together, into wholly-inert tiles.

    The kernel result is key-invariant (the cull is conservative and
    overflow checked), so this only moves performance, never pixels.
    """
    near, far, hit = _sc_slab_sweep(cluster_min, cluster_max, rays)
    n = rays.origin.shape[0]
    t_eff = _t_bound_from_sweep(far, hit, t_max, n)

    S = near.shape[1]
    near_c = jnp.where(hit, jnp.maximum(near, 0.0), _INF)  # (N, S)
    first = jnp.argmin(near_c, axis=-1).astype(jnp.int32)
    entry_t = jnp.min(near_c, axis=-1)
    last_n = jnp.where(hit, jnp.maximum(near, 0.0), -_INF)
    exit_t = jnp.max(last_n, axis=-1)
    last = jnp.argmax(last_n, axis=-1).astype(jnp.int32)
    any_hit = jnp.any(hit, axis=-1)
    # guard: no-hit rays have entry=+inf, exit=-inf whose midpoint is NaN
    # (the key is overwritten below, but jax_debug_nans must stay clean)
    mid_t = jnp.where(any_hit, 0.5 * (entry_t + exit_t), 0.0)
    mid = jnp.argmin(jnp.abs(near_c - mid_t[:, None]), axis=-1
                     ).astype(jnp.int32)

    sb = _cid_bits(S)
    if 3 * sb <= 31:
        key = (first << (2 * sb)) | (mid << sb) | last
    elif 2 * sb <= 31:
        key = (first << sb) | last
    else:  # S >= 2^16 superclusters (~4G tris): entry id alone
        key = first
    key = jnp.where(any_hit, key, jnp.int32(0x7FFFFFFF))
    return key, t_eff


# ---------------------------------------------------------------------------
# phase 1: dense tile-vs-cluster culling (pure XLA)
# ---------------------------------------------------------------------------

def _tile_bounds(rays: Ray, t_max, n_pad: int, tile: int):
    """Per-tile conservative ray bounds (origin box, direction interval,
    max t).  Padding replicates the last real ray: a zero-padded
    direction would straddle 0 on all three axes and make the tile's
    frustum pass every slab test with tied keys (partial-tile
    correctness bug)."""
    n = rays.origin.shape[0]
    pad = n_pad - n
    tiles = n_pad // tile

    def comp(a):  # (n,) -> (tiles, tile); componentwise: a trailing
        # xyz triple would pad 3 -> 128 lanes on TPU (42x the traffic)
        return jnp.pad(a, (0, pad), mode="edge").reshape(tiles, tile)

    def minmax(v):
        cs = [comp(v[:, a]) for a in range(3)]
        lo = jnp.stack([c.min(axis=1) for c in cs], axis=1)  # (tiles, 3)
        hi = jnp.stack([c.max(axis=1) for c in cs], axis=1)
        return lo, hi

    o_lo, o_hi = minmax(rays.origin)
    d_lo, d_hi = minmax(rays.direction)
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    return o_lo, o_hi, d_lo, d_hi, comp(tmax).max(axis=1)


def _tile_slab(box_comps, o_lo, o_hi, d_lo, d_hi, t_hi):
    """Conservative tile-frustum vs AABB slab test.

    ``box_comps``: 6 arrays [min.x, min.y, min.z, max.x, max.y, max.z],
    each (1, K) shared or (tiles, K) per-tile gathered candidates —
    componentwise to keep TPU layouts lane-dense (a trailing xyz triple
    pads 3 -> 128 lanes).  Returns (near, far) of shape (tiles, K); a
    box overlaps the frustum iff near <= far.
    """
    tiles = o_lo.shape[0]
    K = box_comps[0].shape[1]
    near = jnp.zeros((tiles, K), jnp.float32)
    far = jnp.broadcast_to(t_hi[:, None], near.shape)
    for a in range(3):
        bmin = box_comps[a]
        bmax = box_comps[3 + a]
        n_lo = bmin - o_hi[:, a:a + 1]  # (tiles, K)
        n_hi = bmax - o_lo[:, a:a + 1]
        dl = d_lo[:, a:a + 1]
        dh = d_hi[:, a:a + 1]
        straddle = (dl <= 0.0) & (dh >= 0.0)
        # reciprocals are per-tile scalars — multiplying beats dividing
        # the big (tiles, K) operands 4x per axis
        rdl = 1.0 / jnp.where(jnp.abs(dl) < 1e-20, 1e-20, dl)
        rdh = 1.0 / jnp.where(jnp.abs(dh) < 1e-20, 1e-20, dh)
        q1 = n_lo * rdl
        q2 = n_lo * rdh
        q3 = n_hi * rdl
        q4 = n_hi * rdh
        near_a = jnp.minimum(jnp.minimum(q1, q2), jnp.minimum(q3, q4))
        far_a = jnp.maximum(jnp.maximum(q1, q2), jnp.maximum(q3, q4))
        # a direction interval straddling zero gives an unbounded slab
        # interval UNLESS the whole origin box is outside the slab and
        # cannot cross it; stay conservative (pass) in that case.
        near_a = jnp.where(straddle, -_INF, near_a)
        far_a = jnp.where(straddle, _INF, far_a)
        near = jnp.maximum(near, near_a)
        far = jnp.minimum(far, far_a)
    return near, far


def _pack_topk_lists(near, live, ids, id_bits, max_visits):
    """Shared list-packing tail of the cull paths: floor-quantized near
    packed with the id, one top_k, overflow accounting.

    Returns (lists, counts, scale, overflow, near_dropped, sorted_k).
    ``ids``: (1_or_tiles, K) i32 the id carried in each entry's low bits.
    """
    tiles, K = near.shape
    key = jnp.where(live, jnp.maximum(near, 0.0), _INF)
    nb = _NEAR_BITS_TOTAL - id_bits
    D = (1 << nb) - 2
    kmax = jnp.max(jnp.where(live, key, 0.0), axis=1)  # (tiles,)
    scale = jnp.maximum(kmax, 1e-6) / D  # decode factor
    # -1: floor(key * (1/scale)) can land one quantum above floor(key /
    # scale) from reciprocal rounding; the packed near must UNDERestimate
    # the true entry distance or the front-to-back cut could skip a
    # cluster holding a marginally closer hit
    nearq = jnp.clip(
        jnp.floor(key * (1.0 / scale)[:, None]) - 1.0, 0, D
    ).astype(jnp.int32)
    packed = jnp.where(live, (nearq << id_bits) | ids, ((D + 1) << id_bits) | ids)

    # smallest (max_visits + 1) packed entries, ascending: lists + the
    # first dropped entry (for the overflow-resolution check)
    k = min(max_visits + 1, K)
    topneg, _ = jax.lax.top_k(-packed, k)
    sorted_k = -topneg
    lists = sorted_k[:, :max_visits]
    if lists.shape[1] < max_visits:
        lists = jnp.pad(
            lists, ((0, 0), (0, max_visits - lists.shape[1])), mode="edge")

    total = live.sum(axis=1).astype(jnp.int32)
    counts = jnp.minimum(total, max_visits)
    overflow = total - counts
    if k > max_visits:
        dropped_q = (sorted_k[:, max_visits] >> id_bits).astype(jnp.float32)
        near_dropped = jnp.where(overflow > 0, dropped_q * scale, _INF)
    else:
        near_dropped = jnp.full((tiles,), _INF, jnp.float32)
    return lists, counts, scale, overflow, near_dropped


# static cap of live superclusters per tile in the two-level cull; tiles
# exceeding it are flagged as overflow (checked fallback), never silently
# truncated.  Terrain 1M-tri primaries measure max 48/tile
# (benchmarks/sim_sc_counts.py); bounce rays saturate it but use the
# per-lane cull instead.
_SC_CAND = int(os.environ.get("OPTIX_TPU_SC_CAND", "64"))
# cluster count above which the culls switch to the two-level
# (supercluster-first) sweep; module-level (and env-overridable) so the
# suite and the hardware tests can force the two-level path on small
# fixtures
_TWO_LEVEL_MIN_C = int(os.environ.get("OPTIX_TPU_TWO_LEVEL_MIN_C", "4096"))
# per-lane cull analog of _SC_CAND: bounce tiles overlap ~20% of all
# superclusters at some lane, so the cap is the same 64 by default;
# overflow is checked identically
_SC_CAND_LANE = int(os.environ.get("OPTIX_TPU_SC_CAND_LANE", "128"))
# ^ round-5 hardware sweep (benchmarks/prof_sccand.py, 1M-tri terrain
# bounce trace): 64 -> 1677 ms with 272 unresolved tiles in the checked
# fallback; 96 -> 1623/163; 128 -> 1562/102.  The wider level-2
# candidate set costs less than the fallback re-traces it avoids.
# ROW-granularity kernels (one grid step per 128-ray row) were built on
# the ~4x-smaller-per-row-list observation, but measured STRICTLY WORSE
# on hardware for terrain bounces: 4x-smaller lists x 8x more rows =
# 2.4x more total visits (2.0M vs 0.84M), and every visit pays the full
# (8, 128)-vreg Moller-Trumbore regardless of how many sublanes are
# live, so per-visit cost does not shrink with row granularity
# (terrain bounce closest trace 10.8 s row vs 3.9 s tile, round 4).
# Default OFF; env-gated for A/Bs.  _ROW_MAX_VISITS caps the per-row
# list width (overflow is checked, as everywhere).
_ROW_BOUNCE = os.environ.get("OPTIX_TPU_ROW_BOUNCE", "0") == "1"
_ROW_MAX_VISITS = int(os.environ.get("OPTIX_TPU_ROW_MAX_VISITS", "1536"))
# checked-fallback batch size, in ray TILES (x8 in row mode so the batch
# covers the same ray count): the full-width re-cull's dense sweep cost
# scales with the batch, so small batches make the common few-unresolved-
# tiles case cheap while the while_loop keeps arbitrary counts exact
_FB_TILES = int(os.environ.get("OPTIX_TPU_FB_TILES", "128"))
assert _FB_TILES >= 1, "OPTIX_TPU_FB_TILES must be positive"


def _cull_can_drop(C: int, maxv: int, refine: bool) -> bool:
    """Static: can the pass-1 cull drop live clusters?  Two independent
    causes: the list cap binds (C > maxv), or the two-level sweep's
    supercluster cap can drop whole SCs — which happens REGARDLESS of the
    list width, so a ``C > maxv`` fallback guard alone is wrong (it
    compiled the checked fallback out for full-width lists and silently
    lost the dropped SCs' hits — caught losing 4.8%% of terrain bounce
    hits at OPTIX_TPU_SC_KEEP=246, round 4)."""
    cand = _SC_CAND_LANE if refine else _SC_CAND
    two_level = C > _TWO_LEVEL_MIN_C and C > cand * _SC_GROUP
    return C > maxv or two_level


def cull_clusters(cluster_min, cluster_max, rays: Ray, t_max, n_pad: int, max_visits: int, tile: int = TILE,
                  single_level: bool = False):
    """Per-tile front-to-back cluster lists via one packed top_k.

    Returns (lists (tiles, max_visits) i32 packed [nearq | cid],
    counts (tiles,) i32, scale (tiles,) f32 — decode near as
    ``(entry >> cid_bits) * scale`` —, overflow (tiles,) i32 (clusters
    dropped beyond max_visits), near_dropped (tiles,) f32 — decoded entry
    distance of the first dropped cluster, +inf if none).

    Big scenes use a TWO-LEVEL test: tile frusta against supercluster
    AABBs first (C/64 boxes), then cluster slabs only for the clusters of
    the nearest <= _SC_CAND overlapping superclusters (gathered per
    tile).  The slab test is monotone under box enclosure (a cluster's
    slab interval is contained in its supercluster's), so no cluster is
    lost while its supercluster is kept; tiles overlapping more than
    _SC_CAND superclusters report the dropped-SC entry distance through
    (overflow, near_dropped) and are resolved by the caller's checked
    full-list fallback — same exactness contract as the single-level
    cull.  Measured: 34 -> ~9 ms per 1M-ray cull at 15.6k clusters (the
    top_k was 17 ms at (tiles, C) and is k-independent).
    """
    tiles = n_pad // tile
    C = cluster_min.shape[0]
    o_lo, o_hi, d_lo, d_hi, t_hi = _tile_bounds(rays, t_max, n_pad, tile)
    cb = _cid_bits(C)

    # single_level=True: no supercluster cap, so with max_visits >=
    # _pad128(C) the result can NEVER overflow — the mode the checked
    # fallback uses to stay exact in one bounded extra pass
    use_two_level = (not single_level
                     and C > _TWO_LEVEL_MIN_C and C > _SC_CAND * _SC_GROUP)
    if not use_two_level:
        comps = ([cluster_min[:, a][None, :] for a in range(3)]
                 + [cluster_max[:, a][None, :] for a in range(3)])
        near, far = _tile_slab(comps, o_lo, o_hi, d_lo, d_hi, t_hi)
        live = near <= far
        cid = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[None, :], near.shape)
        lists, counts, scale, overflow, near_dropped = _pack_topk_lists(
            near, live, cid, cb, max_visits)
        return lists, counts, scale, overflow, near_dropped

    # ---- level 1: tile frusta vs supercluster AABBs ----
    G = _SC_GROUP
    S = -(-C // G)
    padc = S * G - C
    cmin = jnp.pad(cluster_min, ((0, padc), (0, 0)), constant_values=_INF)
    cmax = jnp.pad(cluster_max, ((0, padc), (0, 0)), constant_values=-_INF)
    sc_min = cmin.reshape(S, G, 3).min(axis=1)  # (S, 3)
    sc_max = cmax.reshape(S, G, 3).max(axis=1)
    sc_comps = ([sc_min[:, a][None, :] for a in range(3)]
                + [sc_max[:, a][None, :] for a in range(3)])
    sc_near, sc_far = _tile_slab(sc_comps, o_lo, o_hi, d_lo, d_hi, t_hi)
    sc_live = sc_near <= sc_far
    sb = _cid_bits(S)
    K1 = min(_SC_CAND, S)
    sc_lists, sc_counts, sc_scale, sc_overflow, sc_near_dropped = \
        _pack_topk_lists(
            sc_near, sc_live,
            jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :], sc_near.shape),
            sb, K1)

    # ---- level 2: cluster slabs for the kept superclusters only ----
    sc_ids = sc_lists & ((1 << sb) - 1)          # (tiles, K1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tiles, K1), 1)
    cand_valid = slot < sc_counts[:, None]       # padded entries excluded
    # candidate cluster ids: supercluster s spans clusters [s*G, (s+1)*G)
    cand_cid_raw = (sc_ids[:, :, None] * G
                    + jnp.arange(G, dtype=jnp.int32)[None, None, :]
                    ).reshape(tiles, K1 * G)
    # candidate boxes via ONE row gather per kept SC (its G clusters are
    # contiguous): 65k wide-row reads instead of 4.2M per-cluster rows
    # (measured 16.4 -> 4.5 ms), componentwise for lane-dense layouts
    box_comps = [
        jnp.take(cmin[:, a].reshape(S, G), sc_ids, axis=0).reshape(tiles, K1 * G)
        for a in range(3)
    ] + [
        jnp.take(cmax[:, a].reshape(S, G), sc_ids, axis=0).reshape(tiles, K1 * G)
        for a in range(3)
    ]
    near, far = _tile_slab(box_comps, o_lo, o_hi, d_lo, d_hi, t_hi)
    # tail-SC padding rows carry inverted (+INF/-INF) boxes which do NOT
    # fail the slab arithmetic — mask them explicitly, and clamp the id
    # payload so sentinel-slot visits stay in bounds (processing a
    # clamped duplicate is idempotent under the kernel's key min)
    live = (near <= far) & jnp.repeat(cand_valid, G, axis=1) & (cand_cid_raw < C)
    cand_cid = jnp.minimum(cand_cid_raw, C - 1)
    lists, counts, scale, overflow, near_dropped = _pack_topk_lists(
        near, live, cand_cid, cb, max_visits)

    # account for dropped superclusters: flag overflow (cluster count in
    # a dropped SC is unknown; G is a safe upper bound used only as a
    # >0 flag and a stat) and floor near_dropped with the first dropped
    # SC's entry distance so the caller's resolution check stays exact
    overflow = overflow + jnp.where(sc_overflow > 0, sc_overflow * G, 0)
    near_dropped = jnp.minimum(near_dropped, sc_near_dropped)
    return lists, counts, scale, overflow, near_dropped



def cull_clusters_per_lane(cluster_min, cluster_max, rays: Ray, t_max,
                           n_pad: int, max_visits: int, tile: int = TILE,
                           single_level: bool = False):
    """PER-LANE cull for incoherent rays (same contract as
    :func:`cull_clusters`).

    The tile-level frustum cull is hostage to its worst lane: one grazing
    ray keeps the whole tile's direction interval and far bound wide, so
    bounce-ray tiles on a 1M-tri scene list ~20%% of ALL clusters, blow
    the ``max_visits`` cap every trace, and land in the full-list
    fallback (measured 41 s/frame for terrain PATH depth-4).  Here EVERY
    cluster is slab-tested against every INDIVIDUAL lane within that
    lane's own t bound — dense chunked XLA arithmetic, no gathers — so a
    cluster is listed only if SOME lane can actually hit it.  Live
    counts are hit-set sized (~200/tile for terrain bounce tiles, vs
    ~3000 frustum-union), which makes the ``max_visits`` cap (here the
    list width itself) a rare event instead of a universal one.

    Cost: the dense per-lane sweep is rays x boxes x ~12 ops, so big
    scenes use a TWO-LEVEL sweep exactly like :func:`cull_clusters`:
    per-lane liveness against the C/64 supercluster AABBs first (~4%% of
    the single-level arithmetic), then per-lane slabs only against the
    clusters of each tile's nearest <= _SC_CAND_LANE overlapping
    superclusters (gathered per tile).  Lane-slab liveness is monotone
    under box enclosure, so no cluster survives whose supercluster was
    culled; dropped-SC overflow is reported through (overflow,
    near_dropped) and resolved by the caller's checked full-list
    fallback — the same exactness contract as the single-level sweep.
    """
    n = rays.origin.shape[0]
    pad = n_pad - n
    o = jnp.pad(rays.origin, ((0, pad), (0, 0)), mode="edge")
    d = jnp.pad(rays.direction, ((0, pad), (0, 0)), mode="edge")
    tmax = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    tmax = jnp.pad(tmax, (0, pad), mode="edge")
    tiles = n_pad // tile
    C = cluster_min.shape[0]

    ot = o.reshape(tiles, tile, 3)
    tl = tmax.reshape(tiles, tile)
    dt = d.reshape(tiles, tile, 3)
    inv = 1.0 / jnp.where(jnp.abs(dt) < 1e-20, jnp.where(dt < 0, -1e-20, 1e-20), dt)
    # per-component (tiles, tile, 1) operands: any array whose LAST axis
    # is the xyz triple pads 3 -> 128 lanes on TPU (42x memory)
    oc = [ot[:, :, a:a + 1] for a in range(3)]
    ic = [inv[:, :, a:a + 1] for a in range(3)]
    tl1 = tl[:, :, None]

    _CH = 128

    def _sweep_chunk(b):
        """One box chunk: b = (6, 1_or_tiles, ch) [min.xyz | max.xyz] ->
        packed min-near over lanes (tiles, ch): entry distance of the
        nearest lane that can hit, +inf if none.  Packing liveness into
        the near keeps this ONE lane reduce, so the whole slab chain
        fuses into it — no (tiles, tile, ch) temporaries survive."""
        near = None
        far = None
        for a in range(3):
            t0 = (b[a][:, None] - oc[a]) * ic[a]  # (tiles, tile, ch)
            t1 = (b[3 + a][:, None] - oc[a]) * ic[a]
            lo = jnp.minimum(t0, t1)
            hi = jnp.maximum(t0, t1)
            near = lo if near is None else jnp.maximum(near, lo)
            far = hi if far is None else jnp.minimum(far, hi)
        lv = (near <= far) & (far > 0.0) & (near < tl1)
        return jnp.min(jnp.where(lv, jnp.maximum(near, 0.0), _INF), axis=1)

    def sweep(box_comps, K):
        """Per-lane min-near sweep over K boxes given as 6 arrays of
        (K,) shared or (tiles, K) per-tile components; returns
        (tiles, K)."""
        Kp = -(-K // _CH) * _CH
        shared = box_comps[0].ndim == 1
        padded = []
        for i, c in enumerate(box_comps):
            fill = _INF if i < 3 else -_INF
            if shared:
                padded.append(jnp.pad(c, (0, Kp - K), constant_values=fill))
            else:
                padded.append(
                    jnp.pad(c, ((0, 0), (0, Kp - K)), constant_values=fill))
        if shared:
            chunks = jnp.stack(padded, axis=0).reshape(6, Kp // _CH, _CH)
            chunks = chunks.transpose(1, 0, 2)[:, :, None, :]  # (n, 6, 1, ch)
        else:
            chunks = jnp.stack(padded, axis=0).reshape(6, tiles, Kp // _CH, _CH)
            chunks = chunks.transpose(2, 0, 1, 3)  # (n, 6, tiles, ch)
        near = jax.lax.map(_sweep_chunk, chunks)  # (n, tiles, ch)
        return near.transpose(1, 0, 2).reshape(tiles, Kp)[:, :K]

    cbits = _cid_bits(C)
    maxv = max_visits
    G = _SC_GROUP
    # single_level=True: see cull_clusters — the overflow-free mode the
    # checked fallback re-culls with
    use_two_level = (not single_level
                     and C > _TWO_LEVEL_MIN_C and C > _SC_CAND_LANE * G)

    if not use_two_level:
        comps = ([cluster_min[:, a] for a in range(3)]
                 + [cluster_max[:, a] for a in range(3)])
        near_t = sweep(comps, C)
        cid = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, :], near_t.shape)
        return _pack_topk_lists(near_t, near_t < _INF, cid, cbits, maxv)

    # ---- level 1: per-lane liveness against supercluster AABBs ----
    S = -(-C // G)
    padc = S * G - C
    cmin = jnp.pad(cluster_min, ((0, padc), (0, 0)), constant_values=_INF)
    cmax = jnp.pad(cluster_max, ((0, padc), (0, 0)), constant_values=-_INF)
    sc_min = cmin.reshape(S, G, 3).min(axis=1)
    sc_max = cmax.reshape(S, G, 3).max(axis=1)
    sc_comps = ([sc_min[:, a] for a in range(3)]
                + [sc_max[:, a] for a in range(3)])
    sc_near = sweep(sc_comps, S)
    sb = _cid_bits(S)
    K1 = min(_SC_CAND_LANE, S)
    sc_lists, sc_counts, _sc_scale, sc_overflow, sc_near_dropped = \
        _pack_topk_lists(
            sc_near, sc_near < _INF,
            jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None, :],
                             sc_near.shape),
            sb, K1)

    # ---- level 2: per-lane slabs for the kept superclusters only ----
    sc_ids = sc_lists & ((1 << sb) - 1)          # (tiles, K1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tiles, K1), 1)
    cand_valid = slot < sc_counts[:, None]
    cand_cid_raw = (sc_ids[:, :, None] * G
                    + jnp.arange(G, dtype=jnp.int32)[None, None, :]
                    ).reshape(tiles, K1 * G)
    box_comps = [
        jnp.take(cmin[:, a].reshape(S, G), sc_ids, axis=0).reshape(tiles, K1 * G)
        for a in range(3)
    ] + [
        jnp.take(cmax[:, a].reshape(S, G), sc_ids, axis=0).reshape(tiles, K1 * G)
        for a in range(3)
    ]
    near_cand = sweep(box_comps, K1 * G)
    # tail-SC padding boxes are inverted (+INF/-INF) and never pass the
    # per-lane slab (near=+INF > far=-INF), but sentinel L1 slots and
    # out-of-range ids must be masked; clamped duplicate ids stay in
    # bounds and are idempotent under the kernel's key min
    live = ((near_cand < _INF)
            & jnp.repeat(cand_valid, G, axis=1) & (cand_cid_raw < C))
    cand_cid = jnp.minimum(cand_cid_raw, C - 1)
    lists, counts, scale, overflow, near_dropped = _pack_topk_lists(
        jnp.where(live, near_cand, _INF), live, cand_cid, cbits, maxv)

    overflow = overflow + jnp.where(sc_overflow > 0, sc_overflow * G, 0)
    near_dropped = jnp.minimum(near_dropped, sc_near_dropped)
    return lists, counts, scale, overflow, near_dropped


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

# Visits are processed in GROUPS of _VISIT_GROUP clusters per while-loop
# iteration.  Round-3 profiling measured ~1.3 us/visit with the MT block
# entirely force-skipped (compute rides free): the cost is the per-visit
# vector->scalar syncs (pretest any(), early-out max()) plus Mosaic DMA
# descriptor setup (~0.11 us/iteration floor).  Grouping divides the sync
# cost by G: ONE any() over the union of the G per-lane pretests gates
# ONE _test body covering all G clusters, and the front-to-back early-out
# bound lives in SMEM and is recomputed only when a group actually
# improved some lane's hit.  Early termination coarsens to group
# granularity (<= G-1 extra visits per tile) — the lists are near-sorted
# so the extra visits are the cheapest ones.
_VISIT_GROUP = int(os.environ.get("OPTIX_TPU_VISIT_GROUP", "4"))
assert 1 <= _VISIT_GROUP <= 16, "OPTIX_TPU_VISIT_GROUP must be in [1, 16]"
_PF_GROUPS = int(os.environ.get("OPTIX_TPU_PF_GROUPS", "2"))  # visit
# groups kept in flight ahead of the cursor: DMA latency (~1-2 us) is
# hidden behind the previous groups' processing.
_N_BUF = (_PF_GROUPS + 1) * _VISIT_GROUP  # cluster DMA ring buffer
# experiment toggles (A/B profiling only; see benchmarks/prof_cull.py)
_X_SKIP_MT = os.environ.get("OPTIX_TPU_X_SKIP_MT", "") == "1"
_X_NO_PRETEST = os.environ.get("OPTIX_TPU_X_NO_PRETEST", "") == "1"


def _chunk_cols(blk, ci):
    """Column accessor for chunk ci of a loaded (8, 128) cluster block."""
    return lambda j: blk[:, ci * 16 + j][:, None, None]


def _inv_dir(a):
    return 1.0 / jnp.where(jnp.abs(a) < 1e-20, jnp.where(a < 0, -1e-20, 1e-20), a)


def _lane_slab(blk, ox, oy, oz, ix, iy, iz):
    """Per-lane ray-vs-cluster-AABB slab test over the whole tile.

    The cluster bounds ride the grouped table's pad columns (attr 15 of
    groups 0-5 = bmin.xyz, bmax.xyz, replicated across sublanes), so a
    sublane-sliced ``blk[:rows, g*16+15][:, None]`` extract broadcasts
    them as constants against the (rows, LANES) ray planes (valid only
    BECAUSE the value is replicated across the sublane axis).  Returns
    (near, far).
    """
    rows = ox.shape[0]

    def bcol(g):
        return blk[:rows, g * 16 + 15][:, None]

    t0 = (bcol(0) - ox) * ix
    t1 = (bcol(3) - ox) * ix
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    t0 = (bcol(1) - oy) * iy
    t1 = (bcol(4) - oy) * iy
    near = jnp.maximum(near, jnp.minimum(t0, t1))
    far = jnp.minimum(far, jnp.maximum(t0, t1))
    t0 = (bcol(2) - oz) * iz
    t1 = (bcol(5) - oz) * iz
    near = jnp.maximum(near, jnp.minimum(t0, t1))
    far = jnp.minimum(far, jnp.maximum(t0, t1))
    return near, far


_LOCAL_MASK = GROUP_CLUSTER - 1  # low key bits: triangle id within cluster
_MISS_KEY = np.int32(0x7FFFFFFF)


def bake_shared_origin_tab(tri_tab: jnp.ndarray, origin: jnp.ndarray) -> jnp.ndarray:
    """Shared-origin rebake of the grouped cluster table: Moller-Trumbore
    terms that depend only on (triangle, origin) are precomputed so the
    kernel's per-(triangle, ray) test shrinks from ~60 to ~29 vector ops.

    Primary rays all share ONE origin (pinhole camera,
    engine/camera.py:61 broadcasts ``camera.pos``; the reference's raygen
    does the same, cuda_src/deviceCode.cu:70-74), so with ``T = o - v0``
    the triple-product identities
        det = e1 . (d x e2) = d . (e2 x e1)
        u   = T  . (d x e2) / det = d . (e2 x T) / det
        v   = d  . (T x e1) / det
        t   = e2 . (T x e1) / det          (ray-independent numerator!)
    turn the per-ray work into three dot products against per-triangle
    constants plus one reciprocal.  This costs one elementwise pass over
    the 64 MB table per camera position (~1 ms-class, done in-jit per
    frame) and wins ~2x on the MT-compute-bound visit loop of coherent
    primary traces.

    Baked layout per triangle (replacing attrs 0-9 of the grouped table;
    attrs 10-15 — including the cluster AABB in the pad columns that
    ``_lane_slab`` reads — pass through unchanged):
        0-2  n2 = e2 x e1     (det = d . n2)
        3-5  uvec = e2 x T    (u = (d . uvec) * inv)
        6-8  vvec = T x e1    (v = (d . vvec) * inv)
        9    tconst = e2 . vvec   (t = tconst * inv)
    Degenerate padding triangles (e1 = e2 = 0) bake to n2 = 0 => det = 0
    => miss, exactly like the unbaked table.
    """
    R8, L = tri_tab.shape
    C = R8 // 8
    a = tri_tab.reshape(C, 8, 8, 16)  # (cluster, sublane, group, attr)
    c = lambda j: a[..., j]
    v0x, v0y, v0z = c(0), c(1), c(2)
    e1x, e1y, e1z = c(3), c(4), c(5)
    e2x, e2y, e2z = c(6), c(7), c(8)
    origin = jnp.asarray(origin, jnp.float32)
    tx = origin[0] - v0x
    ty = origin[1] - v0y
    tz = origin[2] - v0z
    n2x = e2y * e1z - e2z * e1y
    n2y = e2z * e1x - e2x * e1z
    n2z = e2x * e1y - e2y * e1x
    ux = e2y * tz - e2z * ty
    uy = e2z * tx - e2x * tz
    uz = e2x * ty - e2y * tx
    vx = ty * e1z - tz * e1y
    vy = tz * e1x - tx * e1z
    vz = tx * e1y - ty * e1x
    tc = e2x * vx + e2y * vy + e2z * vz
    # ONE stacked materialization: the original 10 sequential
    # .at[..., j].set() full-array updates each copied the 64 MB table
    # (measured 122 ms/bake on v5e — more than the ~18 ms the baked
    # kernel saves per 1M-ray trace); stacking lets XLA emit a single
    # fused relayout pass
    out = jnp.stack(
        [n2x, n2y, n2z, ux, uy, uz, vx, vy, vz, tc]
        + [c(j) for j in range(10, 16)],
        axis=-1,
    )  # (C, 8, 8, 16)
    return out.reshape(R8, L)


def _mt_chunk_baked(c, dx, dy, dz):
    """Shared-origin Moller-Trumbore for one baked (8, 16) chunk accessor
    (see :func:`bake_shared_origin_tab` for the column layout) vs
    (ROWS, 128) ray direction planes.  Returns (hit, t) — the packed-key
    kernel never consumes per-chunk (u, v); exact values are recomputed
    post-trace from the unbaked geometry."""
    d_x, d_y, d_z = dx[None], dy[None], dz[None]
    det = d_x * c(0) + d_y * c(1) + d_z * c(2)
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    u = (d_x * c(3) + d_y * c(4) + d_z * c(5)) * inv
    v = (d_x * c(6) + d_y * c(7) + d_z * c(8)) * inv
    t = c(9) * inv
    hit = (
        (jnp.abs(det) >= 1e-12)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > 0.0)
    )
    return hit, t


def _key_t_up(key):
    """Conservative per-lane t decode of a packed key: OR-ing the local
    bits back gives an f32 >= the true hit t (positive-float bit order)."""
    return jax.lax.bitcast_convert_type(key | _LOCAL_MASK, jnp.float32)


def _closest_cluster_kernel(cid_bits: int, maxv: int, row_mode: bool,
                            cnt_ref, scale_ref, lst_ref, tri_hbm,
                            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                            tmax_ref, key0_ref, cid0_ref,
                            key_ref, cid_ref,
                            lst_scr, buf, sems, lsem, tb_ref, *,
                            baked: bool = False):
    """Branchless packed-key closest hit, _VISIT_GROUP clusters/iteration.

    Per lane the running state is ONE int32 ``key = (f32 bits of t with
    the low 6 bits cleared) | local-triangle-id`` plus the winning cluster
    id: positive-float bits are monotone, so a single ``min`` replaces the
    argmin + per-attribute selects of the old kernel AND the
    ``pl.when(any(improved))`` vector->scalar sync per chunk.  Exact
    (t, u, v, prim) are recomputed post-trace from the packed geometry
    table (one row gather by the decoded sorted id) — cheaper than
    carrying four f32 planes through the hot loop, and bit-identical
    because the Moller-Trumbore arithmetic is repeated operation-for-
    operation on the same inputs.  The ~2^-17-relative t quantization
    only affects ordering of nearly-coincident hits.

    DMA scheduling is UNCONDITIONAL and perfectly balanced (every start
    has exactly one wait): ``lst_at`` clamps any cursor to a real list
    entry and every list entry — including the non-overlap sentinels and
    edge padding — carries a valid cluster id, so prefetching past ``cnt``
    fetches a harmless (unhittable or repeated) cluster instead of
    needing a ``pl.when`` per DMA in the hot loop.  Visits past ``cnt``
    within the final group cannot corrupt the result: sentinel clusters
    failed the conservative tile frustum test (no lane can hit them) and
    repeated clusters are idempotent under the key min.
    """
    ti = pl.program_id(0)
    cmask = (1 << cid_bits) - 1
    near_scale = scale_ref[ti]
    cnt = cnt_ref[ti]
    lw = maxv // 8
    G = _VISIT_GROUP
    # ROW MODE (incoherent traces): one grid step per 128-ray ROW.  The
    # (8, 128) ray/output blocks are shared by 8 consecutive steps (index
    # map t // 8, Mosaic re-fetches/flushes only on block-index change);
    # each step reads and writes ONLY its own sublane r = t %% 8, so the
    # 8 steps of a window jointly fill the output block.  Lists, counts
    # and scales are per ROW.  This is how sub-8-row ray tiles exist at
    # all on hardware: Mosaic rejects (rows<8, 128) BlockSpecs outside
    # interpret mode, so the granularity lives in the GRID, not the block.
    if row_mode:
        r = ti % 8
        ld = lambda ref: ref[pl.ds(r, 1), :]       # (1, 128) row view

        def stv(ref, v):
            ref[pl.ds(r, 1), :] = v
    else:
        ld = lambda ref: ref[:]

        def stv(ref, v):
            ref[:] = v

    lcopy = pltpu.make_async_copy(lst_ref, lst_scr, lsem)
    lcopy.start()

    # init from the warm-start refs: the cold pass feeds the per-lane t
    # bound packed as a key (worst local id, cid = -1); the overflow
    # fallback feeds the first pass's RESULT keys, so its front-to-back
    # early-out starts at the already-achieved hit distances and only the
    # clusters that could still improve are visited
    stv(key_ref, ld(key0_ref))
    stv(cid_ref, ld(cid0_ref))

    lcopy.wait()

    def lst_at(k):
        k = jnp.minimum(k, maxv - 1)  # prefetch cursor can pass the end
        return lst_scr[k // lw, k % lw]

    def cluster_dma(slot, k):
        cid = lst_at(k) & cmask
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(cid * 8, 8), :], buf.at[slot], sems.at[slot]
        )

    @pl.when(cnt > 0)
    def _run():
        for i in range(_PF_GROUPS * G):  # fill the ring
            cluster_dma(i % _N_BUF, i).start()
        ox, oy, oz = ld(ox_ref), ld(oy_ref), ld(oz_ref)
        dx, dy, dz = ld(dx_ref), ld(dy_ref), ld(dz_ref)
        ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
        # front-to-back cut-off bound: SMEM so the skipped-group path pays
        # no vector->scalar sync; recomputed only when a group improves.
        # In row mode this bound covers ONE row instead of the whole
        # tile, so it is no longer hostage to the tile's worst lane —
        # the early-out actually fires for incoherent rays.
        tb_ref[0] = jnp.max(_key_t_up(ld(key_ref)))

        def cond(g):
            k0 = g * G
            near_k = (lst_at(k0) >> cid_bits).astype(jnp.float32) * near_scale
            return (k0 < cnt) & (near_k < tb_ref[0])

        def visit(g):
            k0 = g * G
            for j in range(G):
                cluster_dma((k0 + _PF_GROUPS * G + j) % _N_BUF,
                            k0 + _PF_GROUPS * G + j).start()
            blks = []
            for j in range(G):
                cluster_dma((k0 + j) % _N_BUF, k0 + j).wait()
                blks.append(buf[(k0 + j) % _N_BUF])  # (8, 128) values

            # per-lane AABB pretest: skip the whole G x 64-triangle MT
            # body when no ray in the tile can improve inside ANY cluster
            # of the group — ONE any() sync per G visits.  (A/B-measured
            # alternatives, all slower on v5e: per-row-group pl.when
            # guards — 8 vector->scalar any() syncs per visit, 8.6 -> 3.4
            # Mrays/s on the 1M terrain; a sublane-triangle (8,1)x(1,128)
            # MT layout with per-stripe masking, 8.6 -> 4.5.)
            kt_up = _key_t_up(ld(key_ref))
            live = None
            for j in range(G):
                near_l, far_l = _lane_slab(blks[j], ox, oy, oz, ix, iy, iz)
                lv = (near_l <= far_l) & (far_l > 0.0) & (near_l < kt_up)
                live = lv if live is None else (live | lv)
            if _X_SKIP_MT:  # A/B floor: DMA+pretest+loop only (WRONG results)
                live = live & False
            gate = jnp.bool_(True) if _X_NO_PRETEST else jnp.any(live)

            @pl.when(gate)
            def _test():
                key = ld(key_ref)
                cidv = ld(cid_ref)
                for j in range(G):
                    key_prev = key
                    kc_min = None
                    for ci in range(GROUP_CLUSTER // TRI_SUB):  # static
                        # chunks are independent (no running-t
                        # dependency): ordering is in the packed keys
                        if baked:  # shared-origin table: ~2x fewer VPU ops
                            hit, tc = _mt_chunk_baked(
                                _chunk_cols(blks[j], ci), dx, dy, dz)
                        else:
                            hit, tc, _, _ = _mt_chunk(
                                _chunk_cols(blks[j], ci),
                                ox, oy, oz, dx, dy, dz, None,
                            )
                        bits = jax.lax.bitcast_convert_type(tc, jnp.int32)
                        local = jax.lax.broadcasted_iota(
                            jnp.int32, bits.shape, 0) + ci * TRI_SUB
                        kc = jnp.where(
                            hit, (bits & ~_LOCAL_MASK) | local, _MISS_KEY)
                        kc = jnp.min(kc, axis=0)
                        kc_min = kc if kc_min is None else jnp.minimum(kc_min, kc)
                    key = jnp.minimum(key, kc_min)
                    cidv = jnp.where(key < key_prev, lst_at(k0 + j) & cmask, cidv)
                stv(cid_ref, cidv)
                stv(key_ref, key)
                tb_ref[0] = jnp.max(_key_t_up(key))

            return g + 1

        g_end = jax.lax.while_loop(cond, visit, jnp.int32(0))

        # drain: early termination leaves exactly _PF_GROUPS groups of
        # DMAs in flight (starts are unconditional), and a DMA
        # outstanding at kernel exit is undefined behaviour
        def _wait_one(k, _):
            cluster_dma(k % _N_BUF, k).wait()
            return 0
        jax.lax.fori_loop(
            g_end * G, (g_end + _PF_GROUPS) * G, _wait_one, 0
        )


def _any_cluster_kernel(cid_bits: int, maxv: int, row_mode: bool,
                        cnt_ref, scale_ref, lst_ref, tri_hbm,
                        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
                        tmax_ref, occ_ref,
                        lst_scr, buf, sems, lsem, done_ref):
    """Occlusion kernel, _VISIT_GROUP clusters/iteration (same grouping
    and unconditional DMA-balance arguments as _closest_cluster_kernel;
    the all-lanes-occluded early-out flag lives in SMEM and is refreshed
    only when a group actually occluded new lanes).  Visits past ``cnt``
    in the final group are harmless: sentinel clusters cannot be hit and
    repeated clusters are idempotent under the occlusion OR."""
    ti = pl.program_id(0)
    cmask = (1 << cid_bits) - 1
    cnt = cnt_ref[ti]
    lw = maxv // 8
    G = _VISIT_GROUP
    if row_mode:  # see _closest_cluster_kernel: one grid step per ROW
        r = ti % 8
        ld = lambda ref: ref[pl.ds(r, 1), :]

        def stv(ref, v):
            ref[pl.ds(r, 1), :] = v

        occ_shape = (1, occ_ref.shape[1])
    else:
        ld = lambda ref: ref[:]

        def stv(ref, v):
            ref[:] = v

        occ_shape = occ_ref.shape

    lcopy = pltpu.make_async_copy(lst_ref, lst_scr, lsem)
    lcopy.start()
    stv(occ_ref, jnp.zeros(occ_shape, jnp.int32))
    lcopy.wait()

    def lst_at(k):
        k = jnp.minimum(k, maxv - 1)
        return lst_scr[k // lw, k % lw]

    def cluster_dma(slot, k):
        cid = lst_at(k) & cmask
        return pltpu.make_async_copy(
            tri_hbm.at[pl.ds(cid * 8, 8), :], buf.at[slot], sems.at[slot]
        )

    @pl.when(cnt > 0)
    def _run():
        for i in range(_PF_GROUPS * G):  # fill the ring
            cluster_dma(i % _N_BUF, i).start()
        ox, oy, oz = ld(ox_ref), ld(oy_ref), ld(oz_ref)
        dx, dy, dz = ld(dx_ref), ld(dy_ref), ld(dz_ref)
        ix, iy, iz = _inv_dir(dx), _inv_dir(dy), _inv_dir(dz)
        tmax = ld(tmax_ref)
        done_ref[0] = jnp.int32(0)

        def cond(g):
            return (g * G < cnt) & (done_ref[0] == 0)

        def visit(g):
            k0 = g * G
            for j in range(G):
                cluster_dma((k0 + _PF_GROUPS * G + j) % _N_BUF,
                            k0 + _PF_GROUPS * G + j).start()
            blks = []
            for j in range(G):
                cluster_dma((k0 + j) % _N_BUF, k0 + j).wait()
                blks.append(buf[(k0 + j) % _N_BUF])

            unocc = ld(occ_ref) == 0
            live = None
            for j in range(G):
                near_l, far_l = _lane_slab(blks[j], ox, oy, oz, ix, iy, iz)
                lv = (near_l <= far_l) & (far_l > 0.0) & (near_l < tmax)
                live = lv if live is None else (live | lv)
            live = live & unocc

            @pl.when(jnp.any(live))
            def _test():
                occ = ld(occ_ref)
                for j in range(G):
                    for ci in range(GROUP_CLUSTER // TRI_SUB):
                        hit, _, _, _ = _mt_chunk(
                            _chunk_cols(blks[j], ci),
                            ox, oy, oz, dx, dy, dz, tmax,
                        )
                        occ = occ | jnp.any(hit, axis=0).astype(jnp.int32)
                stv(occ_ref, occ)
                done_ref[0] = jnp.min(occ)

            return g + 1

        g_end = jax.lax.while_loop(cond, visit, jnp.int32(0))

        def _wait_one(k, _):
            cluster_dma(k % _N_BUF, k).wait()
            return 0
        jax.lax.fori_loop(
            g_end * G, (g_end + _PF_GROUPS) * G, _wait_one, 0
        )


def _planes(rays: Ray, tmax, n_pad: int):
    n = rays.origin.shape[0]
    pad = n_pad - n

    def plane(a):
        # edge-replicate padding (see cull_clusters): keeps padded lanes
        # finite so the in-kernel slab pretest never sees inf*0 NaNs
        return jnp.pad(a, (0, pad), mode="edge").reshape(-1, LANES)

    o, d = rays.origin, rays.direction
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    return (
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0]), plane(d[:, 1]), plane(d[:, 2]),
        plane(tmax),
    )


def _grid_spec(tiles: int, maxv: int, n_out: int, shared_lists: bool,
               tile_rows: int, row_mode: bool = False):
    if row_mode:
        # one grid step per ROW; 8 consecutive steps share one (8, 128)
        # ray/output block (index t // 8) and touch only sublane t %% 8
        tile_spec = pl.BlockSpec(
            (8, LANES), lambda t, cnt, sc: (t // 8, 0),
            memory_space=pltpu.VMEM)
    else:
        tile_spec = pl.BlockSpec(
            (tile_rows, LANES), lambda t, cnt, sc: (t, 0),
            memory_space=pltpu.VMEM)
    lidx = (lambda t, cnt, sc: (0, 0)) if shared_lists else (lambda t, cnt, sc: (t, 0))
    lst_spec = pl.BlockSpec((8, maxv // 8), lidx, memory_space=pltpu.VMEM)
    out_specs = [tile_spec] * n_out if n_out > 1 else tile_spec
    n_in = 7 if n_out == 1 else 9  # any-hit: 7 planes; closest: + key0/cid0
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles,),
        in_specs=[lst_spec, pl.BlockSpec(memory_space=pl.ANY)] + [tile_spec] * n_in,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.SMEM((8, maxv // 8), jnp.int32),
            pltpu.VMEM((_N_BUF, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((_N_BUF,)),
            pltpu.SemaphoreType.DMA(()),
            # early-out scalar: f32 t bound (closest) / i32 done (any)
            pltpu.SMEM((1,), jnp.float32 if n_out > 1 else jnp.int32),
        ],
    )


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _decode_hits(key, cid, geom_tab, rays, t_eff, n):
    """Packed (key, cid) kernel outputs -> exact Hit.

    One (N, 16) row gather of the winning triangle's geometry (sorted
    order), then the same Moller-Trumbore arithmetic as the kernel
    recomputes exact (t, u, v) and reads the ORIGINAL prim id from the
    row — four f32 planes less VMEM/HBM traffic in the hot loop.
    """
    flat = lambda a: a.reshape(-1)[:n]
    key = flat(key)
    cid = flat(cid)
    valid = cid >= 0
    tri_sorted = jnp.where(valid, cid * GROUP_CLUSTER + (key & _LOCAL_MASK), 0)
    rows = jnp.take(geom_tab, tri_sorted, axis=0)  # (N, 16)
    # componentwise MT recompute: (N, 3) operands (jnp.cross) would pad
    # the trailing triple 3 -> 128 lanes on TPU; column slices stay dense
    c = lambda j: rows[:, j]
    v0x, v0y, v0z = c(0), c(1), c(2)
    e1x, e1y, e1z = c(3), c(4), c(5)
    e2x, e2y, e2z = c(6), c(7), c(8)
    prim = c(9)
    ox, oy, oz = rays.origin[:, 0], rays.origin[:, 1], rays.origin[:, 2]
    dx, dy, dz = (rays.direction[:, 0], rays.direction[:, 1],
                  rays.direction[:, 2])
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv
    t = (e2x * qx + e2y * qy + e2z * qz) * inv
    return Hit(
        t=jnp.where(valid, t, t_eff),
        tri_id=jnp.where(valid, prim.astype(jnp.int32), -1),
        bary_u=jnp.where(valid, u, 0.0),
        bary_v=jnp.where(valid, v, 0.0),
    )


def trace_closest_clusters_packed(
    tri_tab: jnp.ndarray,
    cluster_min: jnp.ndarray,
    cluster_max: jnp.ndarray,
    rays: Ray,
    t_max=_INF,
    *,
    max_visits: int = DEFAULT_MAX_VISITS,
    tile_rows: int = TILE_ROWS,
    refine: bool = False,
    interpret: bool = False,
    return_lists: bool = False,
    t_eff: jnp.ndarray | None = None,
    baked_tab: jnp.ndarray | None = None,
):
    """Raw packed trace: returns (key (N,) i32, cid (N,) i32, stats).

    ``baked_tab`` (optional, same (C*8, 128) grouped shape as
    ``tri_tab``): a shared-origin table from
    :func:`bake_shared_origin_tab`.  When provided, the kernels (main
    pass AND the checked overflow fallback) intersect with the ~2x
    cheaper baked arithmetic; only valid when every ray's origin equals
    the baked origin (primary rays).  Culling, decode and shading still
    use the unbaked tables, so results are identical up to float
    reordering of the SAME Moller-Trumbore products (winner selection
    among hits tied within the key quantum was already arbitrary).

    ``t_eff`` (optional (N,) f32): precomputed per-ray conservative t
    bound, exactly :func:`ray_t_bounds`'s contract (any real hit has
    ``t_hit <= t_eff``; 0 for provable misses).  Callers that already ran
    the supercluster sweep — :func:`corridor_keys_and_t_bounds` derives
    the coherence sort key and this bound from ONE sweep — pass it to
    skip the second sweep.

    ``return_lists=True`` appends the PASS-1 cull products
    ``(cids (tiles, maxv) i32 decoded cluster ids, counts (tiles,))`` to
    the return tuple for reuse by :func:`fetch_winner_attrs`.  They are
    the first pass's lists: when the checked overflow fallback re-traced
    a tile, that tile's winner may not appear in them — consumers must
    run the found-check (fetch_winner_attrs does).

    ``key`` is the winning (quantized t | local tri id) per lane and
    ``cid`` its cluster (-1 = miss); the winning SORTED triangle id is
    ``cid * 64 + (key & 63)``.  The fused decode+shade path
    (engine.shade) turns these into a SurfaceInteraction (winner-attr
    kernel on coherent traces, or one shade_tab row gather per lane) and
    recomputes exact (t, u, v) itself; :func:`trace_closest_clusters`
    wraps this with the geom_tab decode for callers that want a Hit.

    Exact regardless of ``max_visits``: overflowing tiles whose result is
    not provably complete are re-traced against the full cluster list.
    """
    n = rays.origin.shape[0]
    C = cluster_min.shape[0]
    assert tri_tab.shape[0] == C * 8 and tri_tab.shape[1] == 128, (
        "big-scene tier needs the grouped (C*8, 128) table (pack_tri_table_grouped)"
    )
    row_mode = refine and _ROW_BOUNCE
    if row_mode:  # incoherent rays: row-granular lists + kernel grid
        n_pad = -(-n // (8 * LANES)) * (8 * LANES)  # whole (8,128) blocks
        tile = LANES
        grid_n = n_pad // LANES  # one grid step per ROW
        out_rep = 1
    else:
        tile = tile_rows * LANES
        grid_n = -(-n // tile)
        n_pad = grid_n * tile
        out_rep = tile_rows

    if t_eff is None:
        t_eff = ray_t_bounds(cluster_min, cluster_max, rays, t_max)
    if refine:  # incoherent rays: per-lane cull (see its docstring)
        maxv = (_pad128(min(_ROW_MAX_VISITS, C)) if row_mode
                else _pad128(min(_SC_KEEP * _SC_GROUP, C)))
        lists, counts, scales, overflow, near_dropped = cull_clusters_per_lane(
            cluster_min, cluster_max, rays, t_eff, n_pad, maxv, tile
        )
    else:
        maxv = _pad128(min(max_visits, C))
        lists, counts, scales, overflow, near_dropped = cull_clusters(
            cluster_min, cluster_max, rays, t_eff, n_pad, maxv, tile
        )
    cb = _cid_bits(C)
    cids_p1 = None
    if return_lists:  # decoded pass-1 cluster ids, clamped in-bounds so
        # downstream DMA addresses are always valid even for junk entries
        cids_p1 = jnp.clip(lists & ((1 << cb) - 1), 0, C - 1)
    lists = lists.reshape(grid_n * 8, maxv // 8)
    planes = _planes(rays, t_eff, n_pad)

    out_shape = [jax.ShapeDtypeStruct((grid_n * out_rep, LANES), jnp.int32)] * 2
    tmax_plane = planes[-1]
    tb = jax.lax.bitcast_convert_type(tmax_plane, jnp.int32)
    key_cold = (tb & ~_LOCAL_MASK) | _LOCAL_MASK
    cid_cold = jnp.full(tb.shape, -1, jnp.int32)

    if baked_tab is not None:
        assert baked_tab.shape == tri_tab.shape, (
            "baked_tab must be the grouped table rebaked by "
            "bake_shared_origin_tab (same shape as tri_tab)"
        )
    ktab = tri_tab if baked_tab is None else baked_tab

    def run(lsts, cnts, scls, mv, shared, key0, cid0):
        return pl.pallas_call(
            functools.partial(_closest_cluster_kernel, cb, mv, row_mode,
                              baked=baked_tab is not None),
            grid_spec=_grid_spec(grid_n, mv, 2, shared, tile_rows, row_mode),
            out_shape=out_shape,
            interpret=interpret,
        )(cnts, scls, lsts, ktab, *planes, key0, cid0)

    outs = tuple(run(lists, counts, scales, maxv, False, key_cold, cid_cold))

    if _cull_can_drop(C, maxv, refine):  # overflow possible: checked fallback
        # The fallback RE-CULLS unresolved tiles with the achieved
        # per-lane hit distance as the t bound, single-level (no
        # supercluster cap) at full list width — so it cannot overflow
        # again — and re-traces warm-started from the first pass's keys.
        # The pass-2 lists are therefore (a) minimal: only clusters some
        # lane could still improve inside survive the per-lane `near <
        # t_achieved` test, and (b) near-SORTED, so the kernel's
        # front-to-back early-out works.  The previous unsorted full-list
        # fallback (near bits 0 => the cut never fires) measured 10.8 s
        # for ONE bounce trace on terrain PATH (2383 overflowing rows x
        # 15.6k clusters of pretest+DMA machinery).
        #
        # COMPACTED: the single-level re-cull is a dense rays x ALL-
        # clusters slab sweep whose cost scales with the tiles it SEES,
        # not the tiles that need it — run dense over all 1024 terrain
        # tiles it measured ~1.3 s per bounce trace whenever ANY tile
        # was unresolved (~= the whole main pass).  Unresolved tiles are
        # therefore gathered into _FB_TILES-sized batches (a slice of an
        # argsort permutation: unresolved-first, so batch k is distinct
        # tiles) and re-traced batch by batch in a while_loop that stops
        # when the unresolved count is exhausted.  Duplicate work across
        # batches (the clamped dynamic_slice at the tail) is idempotent:
        # re-tracing a tile warm-started from its own result is a no-op.
        # Two measured dead ends: a two-level stage-2 re-cull before the
        # dense sweep (unresolved tiles are miss/grazing-heavy, so the
        # achieved-t bounds don't tighten them — 2.5 -> 3.2 s), and
        # target-cluster sort keys (winners/tile ~unchanged at ~200).
        t_tile = _key_t_up(outs[0]).reshape(grid_n, -1).max(axis=1)
        unresolved = (overflow > 0) & (t_tile > near_dropped)
        any_un = jnp.any(unresolved)
        maxv_full = _pad128(C)
        fb = min(grid_n, _FB_TILES if tile >= 8 * LANES else 8 * _FB_TILES)

        def run_fb(lsts, cnts, scls, planes_fb, key0, cid0):
            out_sh = [jax.ShapeDtypeStruct((fb * out_rep, LANES), jnp.int32)] * 2
            return pl.pallas_call(
                functools.partial(_closest_cluster_kernel, cb, maxv_full,
                                  row_mode, baked=baked_tab is not None),
                grid_spec=_grid_spec(fb, maxv_full, 2, False, tile_rows,
                                     row_mode),
                out_shape=out_sh,
                interpret=interpret,
            )(cnts, scls, lsts, ktab, *planes_fb, key0, cid0)

        def fallback(o):
            n_un = unresolved.sum()
            # unresolved tiles first, in index order (stable argsort of
            # the resolved flag); any slice of a permutation is distinct
            order = jnp.argsort(jnp.where(unresolved, 0, 1).astype(jnp.int32))
            ro_g = jnp.pad(rays.origin, ((0, n_pad - n), (0, 0)),
                           mode="edge").reshape(grid_n, tile, 3)
            rd_g = jnp.pad(rays.direction, ((0, n_pad - n), (0, 0)),
                           mode="edge").reshape(grid_n, tile, 3)
            # per-lane bound: conservative upper decode of the achieved
            # key (>= true best t; t_eff where no hit).  Any cluster
            # holding an improving triangle has near <= t_true < bound.
            t_up = jnp.minimum(_key_t_up(o[0]).reshape(-1)[:n], t_eff)
            t_up = jnp.pad(t_up, (0, n_pad - n)).reshape(grid_n, tile)
            # a lane with t_up <= near_dropped is already EXACT — every
            # dropped cluster has true near >= near_dropped (the packed
            # near UNDERestimates) >= its achieved t — so treat it as
            # dead (t=0) in the re-cull: pass-2 lists shrink to the
            # demand of the lanes that actually kept the tile
            # unresolved (same tie semantics as the tile-level
            # `t_tile > near_dropped` check; the warm-start keys carry
            # the masked lanes' results through the re-trace unchanged)
            t_up = jnp.where(t_up <= near_dropped[:, None], 0.0, t_up)
            cull2 = cull_clusters_per_lane if refine else cull_clusters

            def body(st):
                o, i = st
                # dynamic_slice clamps the start near the end; compute
                # the clamped start explicitly so `live` masks the
                # entries the slice ACTUALLY returned
                start = jnp.minimum(i * fb, jnp.int32(grid_n - fb))
                sel = jax.lax.dynamic_slice(order, (start,), (fb,))
                live = (start + jnp.arange(fb, dtype=jnp.int32)) < n_un
                rfb = Ray(
                    origin=jnp.take(ro_g, sel, axis=0).reshape(fb * tile, 3),
                    direction=jnp.take(rd_g, sel, axis=0).reshape(fb * tile, 3),
                )
                t2 = jnp.take(t_up, sel, axis=0).reshape(fb * tile)
                t2 = jnp.where(jnp.repeat(live, tile), t2, 0.0)
                l2, c2, s2, _, _ = cull2(
                    cluster_min, cluster_max, rfb, t2, fb * tile,
                    maxv_full, tile, single_level=True)
                ok_g = o[0].reshape(grid_n, out_rep, LANES)
                oc_g = o[1].reshape(grid_n, out_rep, LANES)
                key0 = jnp.take(ok_g, sel, axis=0).reshape(fb * out_rep, LANES)
                cid0 = jnp.take(oc_g, sel, axis=0).reshape(fb * out_rep, LANES)
                outs_f = run_fb(
                    l2.reshape(fb * 8, maxv_full // 8),
                    jnp.where(live, c2, 0), s2,
                    _planes(rfb, t2, fb * tile), key0, cid0)
                m = live[:, None, None]
                newk = jnp.where(m, outs_f[0].reshape(fb, out_rep, LANES),
                                 key0.reshape(fb, out_rep, LANES))
                newc = jnp.where(m, outs_f[1].reshape(fb, out_rep, LANES),
                                 cid0.reshape(fb, out_rep, LANES))
                o = (ok_g.at[sel].set(newk).reshape(grid_n * out_rep, LANES),
                     oc_g.at[sel].set(newc).reshape(grid_n * out_rep, LANES))
                return o, i + 1

            o, _ = jax.lax.while_loop(
                lambda st: st[1] * fb < n_un, body, (o, jnp.int32(0)))
            return o

        outs = jax.lax.cond(any_un, fallback, lambda o: o, outs)
        stats = {
            "overflow": overflow.sum(),
            "retraced": any_un.astype(jnp.int32),
            "unresolved_tiles": unresolved.sum().astype(jnp.int32),
        }
    else:
        stats = zero_trace_stats()

    flat = lambda a: a.reshape(-1)[:n]
    if return_lists:
        return flat(outs[0]), flat(outs[1]), t_eff, stats, (cids_p1, counts)
    return flat(outs[0]), flat(outs[1]), t_eff, stats


@functools.partial(jax.jit, static_argnames=("max_visits", "tile_rows", "refine", "interpret"))
def trace_closest_clusters(
    tri_tab: jnp.ndarray,
    geom_tab: jnp.ndarray,
    cluster_min: jnp.ndarray,
    cluster_max: jnp.ndarray,
    rays: Ray,
    t_max=_INF,
    *,
    max_visits: int = DEFAULT_MAX_VISITS,
    tile_rows: int = TILE_ROWS,
    refine: bool = False,
    interpret: bool = False,
    baked_tab: jnp.ndarray | None = None,
):
    """Returns (Hit in ORIGINAL triangle ids, stats dict — see
    ``zero_trace_stats`` keys).  The kernel tracks only a packed
    (quantized t | local tri) key + cluster id per lane; exact (t, u, v)
    and the original prim id are recomputed post-trace from ``geom_tab``
    (accel.build.BVH.geom_tab, sorted order).  The renderer's hot path
    skips this Hit materialization entirely and fuses decode into
    shading (engine.shade via :func:`trace_closest_clusters_packed`).
    """
    n = rays.origin.shape[0]
    key, cid, t_eff, stats = trace_closest_clusters_packed(
        tri_tab, cluster_min, cluster_max, rays, t_max,
        max_visits=max_visits, tile_rows=tile_rows, refine=refine,
        interpret=interpret, baked_tab=baked_tab,
    )
    hit = _decode_hits(key, cid, geom_tab, rays, t_eff, n)
    return hit, stats


@functools.partial(jax.jit, static_argnames=("max_visits", "tile_rows", "refine", "interpret"))
def trace_any_clusters(
    tri_tab: jnp.ndarray,
    cluster_min: jnp.ndarray,
    cluster_max: jnp.ndarray,
    rays: Ray,
    t_max=_INF,
    *,
    max_visits: int = DEFAULT_MAX_VISITS,
    tile_rows: int = TILE_ROWS,
    refine: bool = False,
    interpret: bool = False,
    t_eff: jnp.ndarray | None = None,
):
    """Occlusion query; returns (occluded (N,) bool, stats dict).

    Like trace_closest_clusters, cull overflow is checked: a tile that
    dropped clusters and still has unoccluded lanes is re-traced against
    the full list.

    ``t_eff`` (optional (N,) f32): precomputed conservative per-ray t
    bound (same contract as in :func:`trace_closest_clusters_packed`);
    callers that already ran the supercluster sweep — e.g. the sorted
    shadow-trace path deriving its coherence keys from
    :func:`corridor_keys_and_t_bounds` — pass it to skip a second sweep.
    """
    n = rays.origin.shape[0]
    C = cluster_min.shape[0]
    assert tri_tab.shape[0] == C * 8 and tri_tab.shape[1] == 128, (
        "big-scene tier needs the grouped (C*8, 128) table (pack_tri_table_grouped)"
    )
    row_mode = refine and _ROW_BOUNCE
    if row_mode:
        n_pad = -(-n // (8 * LANES)) * (8 * LANES)
        tile = LANES
        grid_n = n_pad // LANES
        out_rep = 1
    else:
        tile = tile_rows * LANES
        grid_n = -(-n // tile)
        n_pad = grid_n * tile
        out_rep = tile_rows

    if t_eff is None:
        t_eff = ray_t_bounds(cluster_min, cluster_max, rays, t_max)
    if refine:
        maxv = (_pad128(min(_ROW_MAX_VISITS, C)) if row_mode
                else _pad128(min(_SC_KEEP * _SC_GROUP, C)))
        lists, counts, scales, overflow, _near_dropped = cull_clusters_per_lane(
            cluster_min, cluster_max, rays, t_eff, n_pad, maxv, tile
        )
    else:
        maxv = _pad128(min(max_visits, C))
        lists, counts, scales, overflow, _near_dropped = cull_clusters(
            cluster_min, cluster_max, rays, t_eff, n_pad, maxv, tile
        )
    cb = _cid_bits(C)
    lists = lists.reshape(grid_n * 8, maxv // 8)
    planes = _planes(rays, t_eff, n_pad)
    out_shape = jax.ShapeDtypeStruct((grid_n * out_rep, LANES), jnp.int32)

    def run(lsts, cnts, scls, mv, shared):
        return pl.pallas_call(
            functools.partial(_any_cluster_kernel, cb, mv, row_mode),
            grid_spec=_grid_spec(grid_n, mv, 1, shared, tile_rows, row_mode),
            out_shape=out_shape,
            interpret=interpret,
        )(cnts, scls, lsts, tri_tab, *planes)

    occ = run(lists, counts, scales, maxv, False)

    if _cull_can_drop(C, maxv, refine):
        all_occ = occ.reshape(grid_n, -1).min(axis=1) > 0
        unresolved = (overflow > 0) & ~all_occ
        any_un = jnp.any(unresolved)
        maxv_full = _pad128(C)
        fb = min(grid_n, _FB_TILES if tile >= 8 * LANES else 8 * _FB_TILES)

        def run_fb(lsts, cnts, scls, planes_fb):
            return pl.pallas_call(
                functools.partial(_any_cluster_kernel, cb, maxv_full,
                                  row_mode),
                grid_spec=_grid_spec(fb, maxv_full, 1, False, tile_rows,
                                     row_mode),
                out_shape=jax.ShapeDtypeStruct((fb * out_rep, LANES),
                                               jnp.int32),
                interpret=interpret,
            )(cnts, scls, lsts, tri_tab, *planes_fb)

        def fallback(o):
            # re-cull with t=0 for lanes already occluded (or outside
            # unresolved tiles): pass-2 lists hold only clusters some
            # still-unoccluded lane overlaps in range, single-level at
            # full width so they cannot overflow.  Pass-2 re-tests from
            # scratch, so OR-merge keeps pass-1 occlusions (whose
            # clusters were deliberately culled out of pass 2).
            #
            # COMPACTED exactly like the closest-trace fallback: the
            # dense full-width re-cull costs ~1.3 s when run over every
            # tile, and the NEE shadow trace of each later PATH bounce
            # was paying that whole-frame (this was most of the
            # depth-sweep's +3.3 s per-bounce cost, round 4).
            # Unresolved tiles are gathered into _FB_TILES batches and
            # re-traced batch by batch in a while_loop.
            n_un = unresolved.sum()
            order = jnp.argsort(jnp.where(unresolved, 0, 1).astype(jnp.int32))
            lane_open = (o.reshape(-1)[:n] == 0) & jnp.repeat(
                unresolved, n_pad // grid_n)[:n]
            t2_all = jnp.where(lane_open, t_eff, 0.0)
            t2_g = jnp.pad(t2_all, (0, n_pad - n)).reshape(grid_n, tile)
            ro_g = jnp.pad(rays.origin, ((0, n_pad - n), (0, 0)),
                           mode="edge").reshape(grid_n, tile, 3)
            rd_g = jnp.pad(rays.direction, ((0, n_pad - n), (0, 0)),
                           mode="edge").reshape(grid_n, tile, 3)
            cull2 = cull_clusters_per_lane if refine else cull_clusters

            def body(st):
                o, i = st
                start = jnp.minimum(i * fb, jnp.int32(grid_n - fb))
                sel = jax.lax.dynamic_slice(order, (start,), (fb,))
                live = (start + jnp.arange(fb, dtype=jnp.int32)) < n_un
                rfb = Ray(
                    origin=jnp.take(ro_g, sel, axis=0).reshape(fb * tile, 3),
                    direction=jnp.take(rd_g, sel, axis=0).reshape(fb * tile, 3),
                )
                t2 = jnp.take(t2_g, sel, axis=0).reshape(fb * tile)
                t2 = jnp.where(jnp.repeat(live, tile), t2, 0.0)
                l2, c2, s2, _, _ = cull2(
                    cluster_min, cluster_max, rfb, t2, fb * tile,
                    maxv_full, tile, single_level=True)
                occ_f = run_fb(
                    l2.reshape(fb * 8, maxv_full // 8),
                    jnp.where(live, c2, 0), s2,
                    _planes(rfb, t2, fb * tile),
                ).reshape(fb, out_rep, LANES)
                o_g = o.reshape(grid_n, out_rep, LANES)
                sel_prev = jnp.take(o_g, sel, axis=0)
                merged = sel_prev | jnp.where(live[:, None, None], occ_f, 0)
                o = o_g.at[sel].set(merged).reshape(grid_n * out_rep, LANES)
                return o, i + 1

            o, _ = jax.lax.while_loop(
                lambda st: st[1] * fb < n_un, body, (o, jnp.int32(0)))
            return o

        occ = jax.lax.cond(any_un, fallback, lambda o: o, occ)
        stats = {
            "overflow": overflow.sum(),
            "retraced": any_un.astype(jnp.int32),
            "unresolved_tiles": unresolved.sum().astype(jnp.int32),
        }
    else:
        stats = zero_trace_stats()
    return occ.reshape(-1)[:n] != 0, stats



# ---------------------------------------------------------------------------
# Winner-attribute fetch: SurfaceInteraction inputs without per-lane gathers
# ---------------------------------------------------------------------------

N_SHADE_ATTR = 26  # used rows of the grouped shade block (A 20 + uv 6)
_SG_COLS = 32      # block attr rows (build.SHADE_G_COLS)
_TILE_N = 8 * LANES  # lanes per ray tile (the coherent-trace tile)


def _winner_attr_kernel(maxv: int, lst_ref, nxt_ref, atab_hbm,
                        key_ref, cid_ref, out_ref,
                        lst_scr, nxt_scr, buf, sems, lsem, nsem):
    """Per-tile winner-attribute fetch (the TPU answer to the per-lane
    shade-row gather, which XLA lowers at ~52 ns/ROW — 40-55 ms/Mray).

    Walks ONLY the tile's winner visits — list positions whose cluster
    holds some lane's winning triangle, linked by a precomputed
    next-pointer skip array (primaries average ~13 winner clusters out
    of ~60 visited per 1024-ray tile on the 1M-tri terrain).  Each visit
    DMAs the cluster's ATTR-MAJOR (32 attrs, 128) shade block and
    selects every matching lane's winning row with ONE one-hot matmul:

        acc (32, 1024) += block[:, :64] (32, 64) @ oh (64, 1024)
        oh = (local_id == iota_tri) * (cid == list[k])

    The (64, 1024) local-id one-hot is built ONCE per tile; the per-
    visit mask is a single (1, 1024) compare broadcast over it.  MXU
    work at Precision.HIGHEST is exact for 0/1 selection (same argument
    as engine.shade._shade_onehot).  Measured history on the terrain
    primary workload (13.2k winner visits): per-(chunk, attr) broadcast
    selection in VPU vregs cost 1.78 ms/attr (59 ms total, WORSE than
    the 39 ms gather it replaced — (8,1,1) lane-extract broadcasts are
    ~25x the naive op count); this matmul form moves the selection to
    the idle MXU.

    Ray key/cid planes arrive as (8, 1024) FLAT-tile blocks shared by 8
    consecutive grid steps (index map t//8, row t%8): Mosaic rejects
    (1, N) blocks on hardware, and the flat view costs XLA nothing (the
    arrays are row-major (N,) already).

    Correctness contract: every lane's winning cluster must appear in
    the tile's list (positions < cnt).  That holds for pass-1 results by
    construction (a winner must have been visited); when the checked
    overflow fallback replaced a tile's result, the caller's found-check
    routes the WHOLE call to the exact gather path instead (see
    fetch_winner_attrs).  Miss lanes match no list cluster (cid = -1,
    ids are clamped >= 0) and come out zero.
    """
    ti = pl.program_id(0)
    r = ti % 8
    lw = maxv // 8
    nw = (maxv + 8) // 8
    lcopy = pltpu.make_async_copy(lst_ref, lst_scr, lsem)
    lcopy.start()
    ncopy = pltpu.make_async_copy(nxt_ref, nxt_scr, nsem)
    ncopy.start()
    lcopy.wait()
    ncopy.wait()
    sentinel = maxv

    def lst_at(k):
        k = jnp.minimum(k, maxv - 1)  # sentinel cursors read a junk entry;
        return lst_scr[k // lw, k % lw]  # ids are pre-clamped in-bounds

    def nxt_at(k):
        k = jnp.minimum(k, maxv + 7)
        return nxt_scr[k // nw, k % nw]

    def attr_dma(slot, k):
        cid = lst_at(k)
        return pltpu.make_async_copy(
            atab_hbm.at[pl.ds(cid * _SG_COLS, _SG_COLS), :],
            buf.at[slot], sems.at[slot],
        )

    k0 = nxt_at(0)
    k1 = nxt_at(k0 + 1)
    attr_dma(0, k0).start()
    attr_dma(1, k1).start()

    # hoisted per-tile: this tile's flat key/cid rows and the (tri,
    # lane) local-id one-hot
    keyf = key_ref[pl.ds(r, 1), :]  # (1, TILE_N)
    cidf = cid_ref[pl.ds(r, 1), :]
    loc = keyf & _LOCAL_MASK
    iota_tri = jax.lax.broadcasted_iota(
        jnp.int32, (GROUP_CLUSTER, _TILE_N), 0)
    oh_loc = (loc == iota_tri).astype(jnp.float32)  # (64, TILE_N)

    def cond(st):
        return st[0][0] < sentinel

    def body(st):
        (k, kn, p), acc = st
        attr_dma(p, k).wait()
        blk = buf[p]  # (32, 128): attr rows, tri lanes (64-127 pad)
        maskv = (cidf == lst_at(k)).astype(jnp.float32)  # (1, TILE_N)
        oh = oh_loc * maskv
        # winners are unique per lane, so per-visit contributions are
        # disjoint and the accumulation is exact
        acc = acc + jax.lax.dot_general(
            blk[:, :GROUP_CLUSTER], oh,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        k2 = nxt_at(kn + 1)
        attr_dma(p, k2).start()
        return (kn, k2, p ^ 1), acc

    (k_f, kn_f, p_f), acc = jax.lax.while_loop(
        cond, body,
        ((k0, k1, jnp.int32(0)),
         jnp.zeros((_SG_COLS, _TILE_N), jnp.float32)),
    )
    out_ref[...] = acc
    # drain: exactly two DMAs are always in flight (slot p_f holds k_f's,
    # slot p_f^1 holds kn_f's) and starts/waits must balance
    attr_dma(p_f, k_f).wait()
    attr_dma(p_f ^ 1, kn_f).wait()


def fetch_winner_attrs(shade_gtab, cids, counts, key, cid, n: int,
                       interpret: bool = False, fallback_fn=None,
                       retraced=None):
    """Winner shade attributes for a COHERENT packed trace.

    Args: ``shade_gtab`` (C*32, 128) attr-major grouped shade table
    (build.pack_shade_table_grouped); ``cids``/``counts`` the pass-1 cull
    lists from ``trace_closest_clusters_packed(..., return_lists=True)``
    ((tiles, maxv) i32 decoded+clamped ids, (tiles,) i32); ``key``/
    ``cid`` the packed winners ((N,) i32).

    Returns ``(attrs (N_SHADE_ATTR, n) f32, ok () bool)``: row j is
    fused shade column j per lane (0..19 = shade_a, 20..25 = shade_b
    uv), zeros for miss lanes.  ``ok`` is False when some lane's winning
    cluster is absent from its tile's pass-1 list (possible only when
    the checked overflow fallback replaced that tile's result) — then
    the result is exact only via ``fallback_fn`` (a nullary returning
    the same (N_SHADE_ATTR, n) columns from the row-gather path), which
    runs under ``lax.cond`` so the common case never pays it.  Without a
    fallback_fn, attrs are garbage for those lanes (test/probe use).
    Everything before the kernel is dense XLA (no per-lane gathers).

    ``retraced`` (optional () i32, the trace stats' ``retraced`` flag):
    winners can only be absent when the overflow fallback actually
    re-traced something, so when given, the found-check — as expensive
    as the marks sweep itself — runs under ``lax.cond`` on it.
    """
    tiles, maxv = cids.shape
    n_pad = tiles * _TILE_N
    pad = n_pad - n
    # flat (tiles, 1024) views of the winner planes — row-major (N,)
    # already, so these reshapes are free
    key_fl = jnp.pad(key, (0, pad), mode="edge").reshape(tiles, _TILE_N)
    cid_fl = jnp.pad(cid, (0, pad), mode="edge").reshape(tiles, _TILE_N)
    # pad the tile axis to a multiple of 8: the kernel's key/cid blocks
    # cover 8 tiles each (Mosaic rejects (1, N) blocks on hardware)
    tiles8 = -(-tiles // 8) * 8
    if tiles8 != tiles:
        key_fl = jnp.pad(key_fl, ((0, tiles8 - tiles), (0, 0)))
        cid_fl = jnp.pad(cid_fl, ((0, tiles8 - tiles), (0, 0)),
                         constant_values=-1)

    # winner marks per list position + per-lane found flags, streamed in
    # position chunks so XLA never materializes (tiles, maxv, lanes)
    cid_t = cid_fl[:tiles]
    live_p = jax.lax.broadcasted_iota(jnp.int32, (tiles, maxv), 1) < counts[:, None]
    step = 128

    def _sweep(with_found: bool):
        marks = jnp.zeros((tiles, maxv), jnp.bool_)
        found = cid_t < 0  # miss lanes need no row
        for p0 in range(0, maxv, step):
            sl = cids[:, p0:p0 + step]
            eq = sl[:, :, None] == cid_t[:, None, :]
            eq = eq & live_p[:, p0:p0 + step, None]
            marks = marks.at[:, p0:p0 + step].set(eq.any(-1))
            if with_found:
                found = found | eq.any(1)
        return marks, found.all()

    marks, ok = _sweep(with_found=retraced is None)
    if retraced is not None:
        # a winner can be missing from the pass-1 lists only when the
        # checked overflow fallback replaced a tile's result
        ok = jax.lax.cond(retraced > 0, lambda: _sweep(True)[1],
                          lambda: jnp.bool_(True))

    # next-winner skip pointers: nxt[p] = min marked position >= p, else
    # maxv (sentinel); padded 8 wide so the kernel can read nxt[k+1] at
    # the last real position
    pos = jnp.where(marks, jax.lax.broadcasted_iota(jnp.int32, (tiles, maxv), 1), maxv)
    nxt = jax.lax.associative_scan(jnp.minimum, pos, reverse=True, axis=1)
    nxt = jnp.pad(nxt, ((0, 0), (0, 8)), constant_values=maxv)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((8, maxv // 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, (maxv + 8) // 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, _TILE_N), lambda t: (t // 8, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TILE_N), lambda t: (t // 8, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_SG_COLS, _TILE_N), lambda t: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SMEM((8, maxv // 8), jnp.int32),
            pltpu.SMEM((8, (maxv + 8) // 8), jnp.int32),
            pltpu.VMEM((2, _SG_COLS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def run_kernel():
        out = pl.pallas_call(
            functools.partial(_winner_attr_kernel, maxv),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (_SG_COLS, tiles * _TILE_N), jnp.float32),
            interpret=interpret,
        )(
            cids.reshape(tiles * 8, maxv // 8),
            nxt.reshape(tiles * 8, (maxv + 8) // 8),
            shade_gtab,
            key_fl,
            cid_fl,
        )
        return out[:N_SHADE_ATTR, :n]

    if fallback_fn is None:
        return run_kernel(), ok
    return jax.lax.cond(ok, run_kernel, fallback_fn), ok
