"""Clustered traversal tier (accel.pallas_cluster) vs the jnp oracle, in
interpret mode, on a real parsed scene above the brute-force cutoff."""

import numpy as np
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.accel import pallas_cluster as pc
from optix_renderer_tpu.accel.traverse import intersect_brute
from optix_renderer_tpu.core import rng as rnglib
from optix_renderer_tpu.core.types import Ray
from optix_renderer_tpu.engine import camera as cameralib
from optix_renderer_tpu.engine.modes import RendererType
from optix_renderer_tpu.engine.renderer import Renderer
from optix_renderer_tpu.engine.shade import build_surface_interaction_fused
from optix_renderer_tpu.scene import procedural
from optix_renderer_tpu.scene.config import parse_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("terrain")
    # grid=60 -> ~7k triangles: above PALLAS_BRUTE_MAX_TRIS, small enough
    # for the brute oracle
    path = procedural.write_terrain_scene(str(d), grid=60, width=64, height=64)
    scene = parse_scene(path)
    r = Renderer(scene, width=64, height=64, mode=RendererType.MASK)
    W = H = 64
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    rstate = rnglib.make_rng(10007, lin)
    rstate, ju = rnglib.lcg_randomf(rstate)
    rstate, jv = rnglib.lcg_randomf(rstate)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    return r, rays


def test_cluster_closest_matches_brute(setup):
    r, rays = setup
    bvh = r.bvh
    assert bvh.tri_v0.shape[0] > 4096  # actually exercises the cluster tier
    ch, stats = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays, interpret=True
    )
    assert int(stats["overflow"]) == 0
    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2], axis=1
    )
    want = intersect_brute(tris, rays)
    # brute returns sorted-slot ids; map to original prim ids
    want_ids = np.where(
        np.asarray(want.tri_id) >= 0,
        np.asarray(bvh.prim_id)[np.maximum(np.asarray(want.tri_id), 0)],
        -1,
    )
    assert (np.asarray(ch.tri_id) == want_ids).mean() > 0.999  # t-ties may differ
    m = want_ids >= 0
    assert m.mean() > 0.8  # camera actually sees the scene
    np.testing.assert_allclose(np.asarray(ch.t)[m], np.asarray(want.t)[m], rtol=1e-4, atol=1e-3)


def test_cluster_si_matches_reference_attrs(setup):
    r, rays = setup
    ds, bvh = r.device_scene, r.bvh
    key, cid, t_eff, _ = pc.trace_closest_clusters_packed(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays, interpret=True
    )
    ch = pc._decode_hits(key, cid, bvh.geom_tab, rays, t_eff,
                         rays.origin.shape[0])
    si = build_surface_interaction_fused(ds, rays, key, cid, bvh.shade_tab)
    m = np.asarray(si.hit)
    tid = np.asarray(ch.tri_id)[m]

    # mesh-table attributes must match the scene exactly
    mesh = np.asarray(ds.tri_mesh)[tid]
    np.testing.assert_allclose(
        np.asarray(si.diffuse)[m], np.asarray(ds.mesh_diffuse)[mesh], atol=1e-6
    )
    assert (np.asarray(si.material_id)[m] == np.asarray(ds.mesh_material_id)[mesh]).all()
    assert (np.asarray(si.is_light)[m] == np.asarray(ds.mesh_is_light)[mesh]).all()

    # normal = barycentric interpolation of the corner normals
    idx = np.asarray(ds.tri_index)[tid]
    nc = np.asarray(ds.normals)[idx]  # (H, 3, 3)
    u = np.asarray(ch.bary_u)[m][:, None]
    v = np.asarray(ch.bary_v)[m][:, None]
    w = 1.0 - u - v
    ni = w * nc[:, 0] + u * nc[:, 1] + v * nc[:, 2]
    ni /= np.maximum(np.linalg.norm(ni, axis=-1, keepdims=True), 1e-20)
    np.testing.assert_allclose(np.asarray(si.n_geom)[m], ni, atol=1e-4)

    # p consistent with ray parametrization
    p = np.asarray(rays.origin)[m] + np.asarray(ch.t)[m, None] * np.asarray(rays.direction)[m]
    np.testing.assert_allclose(np.asarray(si.p)[m], p, atol=1e-3)


def test_cluster_any_occlusion(setup):
    r, rays = setup
    bvh = r.bvh
    occ, stats = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((rays.origin.shape[0],), 1e4, jnp.float32),
        interpret=True,
    )
    assert int(stats["overflow"]) == 0
    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2], axis=1
    )
    want = intersect_brute(tris, rays, t_max=1e4)
    assert (np.asarray(occ) == (np.asarray(want.tri_id) >= 0)).all()


@pytest.fixture(scope="module")
def big_setup(tmp_path_factory):
    """~20k tris / 300+ clusters: enough clusters that a small max_visits
    genuinely overflows (the cap floor is one 128-entry list block)."""
    d = tmp_path_factory.mktemp("terrain_big")
    path = procedural.write_terrain_scene(str(d), grid=100, width=32, height=32)
    scene = parse_scene(path)
    r = Renderer(scene, width=32, height=32, mode=RendererType.MASK)
    return r


def test_overflow_is_checked_not_silent(big_setup):
    """VERDICT r2 item 1: a tile overflowing max_visits must degrade to a
    re-trace, never to a wrong image.  Incoherent random rays + a partial
    final tile (n % 1024 != 0, the r2 zero-pad frustum bug) + max_visits
    far below the cluster count: the result must still equal the oracle,
    and the stress must actually overflow."""
    r = big_setup
    bvh = r.bvh
    C = bvh.cluster_min.shape[0]
    assert C > 128

    rng = np.random.default_rng(7)
    n = 1000  # partial tile on purpose
    lo = np.asarray(bvh.cluster_min.min(axis=0))
    hi = np.asarray(bvh.cluster_max.max(axis=0))
    o = lo + rng.random((n, 3), np.float32) * (hi - lo)
    o[:, 1] = hi[1] * 1.2  # above the terrain, looking around
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.asarray(o, jnp.float32), direction=jnp.asarray(d, jnp.float32))

    ch, stats = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        max_visits=128, interpret=True,
    )
    assert int(stats["overflow"]) > 0  # the stress actually stressed

    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2], axis=1
    )
    want = intersect_brute(tris, rays)
    want_ids = np.where(
        np.asarray(want.tri_id) >= 0,
        np.asarray(bvh.prim_id)[np.maximum(np.asarray(want.tri_id), 0)],
        -1,
    )
    assert (np.asarray(ch.tri_id) == want_ids).mean() > 0.999  # t-ties only
    m = want_ids >= 0
    assert m.mean() > 0.2
    np.testing.assert_allclose(
        np.asarray(ch.t)[m], np.asarray(want.t)[m], rtol=1e-4, atol=1e-3
    )

    # any-hit under the same stress
    occ, astats = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((n,), 1e5, jnp.float32),
        max_visits=128, interpret=True,
    )
    assert (np.asarray(occ) == (want_ids >= 0)).all()


@pytest.fixture(scope="module")
def gallery_setup(tmp_path_factory):
    """Textured, smooth-normal multi-mesh scene above the brute cutoff:
    the workload where the cluster tier's full-fidelity shading (VERDICT
    r2 item 3 / hit_miss.cuh:30-44 parity) must engage."""
    d = tmp_path_factory.mktemp("gallery")
    path = procedural.write_gallery_scene(str(d), width=64, height=64)
    scene = parse_scene(path)
    r = Renderer(scene, width=64, height=64, mode=RendererType.MASK)
    W = H = 64
    n = W * H
    lin = jnp.arange(n, dtype=jnp.uint32)
    rstate = rnglib.make_rng(10007, lin)
    rstate, ju = rnglib.lcg_randomf(rstate)
    rstate, jv = rnglib.lcg_randomf(rstate)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    return r, rays


def test_cluster_full_fidelity_matches_gather_path(gallery_setup):
    """On textured/smooth scenes the cluster tier must interpolate normals
    and uvs and sample diffuse textures exactly like the gather path
    (hit_miss.cuh:30-44) — the r2 fast path's uv=0 / representative-normal
    shortcuts are only allowed when provably exact."""
    from optix_renderer_tpu.core.types import Hit
    from optix_renderer_tpu.engine.shade import build_surface_interaction

    r, rays = gallery_setup
    ds, bvh = r.device_scene, r.bvh
    assert ds.num_tris > 4096  # cluster tier
    assert ds.has_textures
    assert bvh.shade_tab[0].shape[0] >= ds.num_tris

    key, cid, t_eff, stats = pc.trace_closest_clusters_packed(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays, interpret=True
    )
    ch = pc._decode_hits(key, cid, bvh.geom_tab, rays, t_eff,
                         rays.origin.shape[0])
    si_c = build_surface_interaction_fused(ds, rays, key, cid, bvh.shade_tab)
    hit = Hit(t=ch.t, tri_id=ch.tri_id, bary_u=ch.bary_u, bary_v=ch.bary_v)
    si_g = build_surface_interaction(ds, rays, hit)

    m = np.asarray(si_g.hit)
    assert m.mean() > 0.8
    assert (np.asarray(si_c.hit) == m).all()
    for name in ("n_geom", "uv", "diffuse", "emit"):
        got = np.asarray(getattr(si_c, name))[m]
        want = np.asarray(getattr(si_g, name))[m]
        np.testing.assert_allclose(got, want, atol=1e-3, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(si_c.alpha)[m], np.asarray(si_g.alpha)[m], atol=1e-5
    )
    assert (np.asarray(si_c.material_id)[m] == np.asarray(si_g.material_id)[m]).all()
    # textures actually sampled: the checker floor must vary per pixel
    diff = np.asarray(si_c.diffuse)[m]
    assert diff.std(axis=0).max() > 0.05


def test_coherence_sorted_trace_matches_unsorted(setup):
    """trace_closest_si with coherent=False (sort -> trace -> unsort) must
    produce the same SurfaceInteraction as the direct path: the cull is
    conservative, so closest hits don't depend on tile grouping."""
    import jax

    r, rays = setup
    ds, bvh = r.device_scene, r.bvh
    if jax.default_backend() == "cpu":
        # the big-scene branch is TPU-only; exercise the sort machinery via
        # the internal helpers against the interpret-mode cluster kernel
        from optix_renderer_tpu.core.types import Ray
        from optix_renderer_tpu.engine import shade

        lo = bvh.cluster_min.min(axis=0)
        hi = bvh.cluster_max.max(axis=0)
        perm = jnp.argsort(shade._coherence_keys(rays, lo, hi))
        od = jnp.concatenate([rays.origin, rays.direction], axis=1)
        od_s = jnp.take(od, perm, axis=0)
        sorted_rays = Ray(origin=od_s[:, 0:3], direction=od_s[:, 3:6])
        key_s, cid_s, _te, _ = pc.trace_closest_clusters_packed(
            bvh.tri_tab, bvh.cluster_min, bvh.cluster_max,
            sorted_rays, interpret=True
        )
        n = rays.origin.shape[0]
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
        # the production unsort: one (N, 2) packed row gather of the raw
        # kernel outputs (winning sorted ids are lane-order independent)
        pack = jnp.stack([key_s, cid_s], axis=1)
        rows = jnp.take(pack, inv, axis=0)
        key, cid = rows[:, 0], rows[:, 1]
        wkey, wcid, _te2, _ = pc.trace_closest_clusters_packed(
            bvh.tri_tab, bvh.cluster_min, bvh.cluster_max,
            rays, interpret=True
        )
        # packed keys are min-reduced over the same candidate set either
        # way: bit-identical regardless of tile grouping
        np.testing.assert_array_equal(np.asarray(cid), np.asarray(wcid))
        np.testing.assert_array_equal(np.asarray(key), np.asarray(wkey))
        si = shade.build_surface_interaction_fused(ds, rays, key, cid,
                                                   bvh.shade_tab)
        want_si = shade.build_surface_interaction_fused(ds, rays, wkey, wcid,
                                                        bvh.shade_tab)
        np.testing.assert_array_equal(np.asarray(si.p), np.asarray(want_si.p))
        np.testing.assert_array_equal(np.asarray(si.n_geom),
                                      np.asarray(want_si.n_geom))


def test_ray_t_bounds_conservative(setup):
    """ray_t_bounds is a valid upper bound: never below the true closest
    hit t, and exactly 0 for rays that provably miss everything."""
    r, rays = setup
    bvh = r.bvh
    tb = np.asarray(pc.ray_t_bounds(bvh.cluster_min, bvh.cluster_max, rays, pc._INF))

    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2], axis=1
    )
    hit = intersect_brute(tris, rays)
    t = np.asarray(hit.t)
    hit_mask = np.asarray(hit.tri_id) >= 0
    # conservative: every real hit lies within the bound
    assert (tb[hit_mask] >= t[hit_mask]).all()
    # sky rays (no supercluster overlap) must have a zero bound when the
    # direction points away from the whole scene
    up_rays = Ray(
        origin=jnp.asarray(np.full((8, 3), 1e4, np.float32)),
        direction=jnp.asarray(np.tile(np.array([0, 1, 0], np.float32), (8, 1))),
    )
    tb_up = np.asarray(pc.ray_t_bounds(bvh.cluster_min, bvh.cluster_max, up_rays, pc._INF))
    assert (tb_up == 0.0).all()
    # and the incoming t_max is respected
    tb_c = np.asarray(pc.ray_t_bounds(bvh.cluster_min, bvh.cluster_max, rays, 0.125))
    assert (tb_c <= 0.125 + 1e-6).all()


def test_ray_t_bounds_supercluster_grouping():
    """The grouped (>512 clusters) path agrees with the exact per-cluster
    path on containment: grouped bounds can only be looser (larger)."""
    rng = np.random.default_rng(7)
    C = 700  # forces the 64-cluster supercluster grouping
    cmin = rng.uniform(0, 100, (C, 3)).astype(np.float32)
    cmax = cmin + rng.uniform(0.1, 5, (C, 3)).astype(np.float32)
    n = 256
    o = rng.uniform(-20, 120, (n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.asarray(o), direction=jnp.asarray(d))

    grouped = np.asarray(pc.ray_t_bounds(jnp.asarray(cmin), jnp.asarray(cmax), rays, pc._INF))
    # exact (per-cluster) reference, same formula with G=1
    import optix_renderer_tpu.accel.pallas_cluster as mod
    old = mod._SC_GROUP
    try:
        mod._SC_GROUP = 1
        exact = np.asarray(pc.ray_t_bounds(jnp.asarray(cmin), jnp.asarray(cmax), rays, pc._INF))
    finally:
        mod._SC_GROUP = old
    assert (grouped >= exact - 1e-3).all()
    # rays with a zero exact bound may still get a loose grouped bound,
    # but never the other way around
    assert ((exact == 0) | (grouped > 0)).all()


def test_corridor_keys_and_t_bounds(setup):
    """The fused key+bound sweep returns EXACTLY ray_t_bounds' bound, and
    keys send no-overlap rays to INT32_MAX (inert tiles sort last)."""
    r, rays = setup
    bvh = r.bvh
    keys, te = pc.corridor_keys_and_t_bounds(
        bvh.cluster_min, bvh.cluster_max, rays)
    ref = pc.ray_t_bounds(bvh.cluster_min, bvh.cluster_max, rays, pc._INF)
    np.testing.assert_array_equal(np.asarray(te), np.asarray(ref))
    k = np.asarray(keys)
    assert (k >= 0).all()
    # rays overlapping nothing: key must be INT32_MAX, bound 0
    up_rays = Ray(
        origin=jnp.asarray(np.full((16, 3), 1e4, np.float32)),
        direction=jnp.asarray(np.tile(np.array([0, 1, 0], np.float32),
                                      (16, 1))),
    )
    ku, tu = pc.corridor_keys_and_t_bounds(
        bvh.cluster_min, bvh.cluster_max, up_rays)
    assert (np.asarray(ku) == 0x7FFFFFFF).all()
    assert (np.asarray(tu) == 0.0).all()
    # t_max clamp flows through like ray_t_bounds
    _, tc = pc.corridor_keys_and_t_bounds(
        bvh.cluster_min, bvh.cluster_max, rays, 0.125)
    assert (np.asarray(tc) <= 0.125 + 1e-6).all()


@pytest.mark.parametrize("tile_rows", [1, 2, 4])
def test_tile_rows_invariance(setup, tile_rows):
    """Results are identical for every kernel tile size (the tile is a
    perf knob: tighter frusta vs more per-tile overhead)."""
    r, rays = setup
    bvh = r.bvh
    want, _ = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        interpret=True,
    )
    got, _ = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        tile_rows=tile_rows, interpret=True,
    )
    assert (np.asarray(got.tri_id) == np.asarray(want.tri_id)).all()
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))

    w_occ, _ = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((rays.origin.shape[0],), 1e4, jnp.float32), interpret=True,
    )
    g_occ, _ = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((rays.origin.shape[0],), 1e4, jnp.float32),
        tile_rows=tile_rows, interpret=True,
    )
    assert (np.asarray(g_occ) == np.asarray(w_occ)).all()


def test_refined_lists_match_unrefined(big_setup):
    """Per-lane list refinement must be invisible in results: it only
    drops entries no individual lane can hit within its own bound."""
    r = big_setup
    bvh = r.bvh
    rng = np.random.default_rng(11)
    n = 2048
    lo = np.asarray(bvh.cluster_min.min(axis=0))
    hi = np.asarray(bvh.cluster_max.max(axis=0))
    o = lo + rng.random((n, 3), np.float32) * (hi - lo)
    o[:, 1] = hi[1] * 1.1
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.asarray(o, jnp.float32), direction=jnp.asarray(d, jnp.float32))

    want, _ = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        interpret=True,
    )
    got, _ = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        refine=True, interpret=True,
    )
    assert (np.asarray(got.tri_id) == np.asarray(want.tri_id)).all()
    np.testing.assert_array_equal(np.asarray(got.t), np.asarray(want.t))

    w_occ, _ = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((n,), 1e5, jnp.float32), interpret=True,
    )
    g_occ, _ = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((n,), 1e5, jnp.float32), refine=True, interpret=True,
    )
    assert (np.asarray(g_occ) == np.asarray(w_occ)).all()


def test_two_level_per_lane_cull_matches_single_level(big_setup, monkeypatch):
    """The supercluster-first per-lane cull must list exactly the same
    live clusters as the single-level sweep when nothing overflows (L1
    is monotone under box enclosure), and report conservative overflow
    info when its SC cap drops live superclusters."""
    r = big_setup
    bvh = r.bvh
    C = bvh.cluster_min.shape[0]
    rng = np.random.default_rng(3)
    n = pc.TILE * 2
    lo = np.asarray(bvh.cluster_min.min(axis=0))
    hi = np.asarray(bvh.cluster_max.max(axis=0))
    o = lo + rng.random((n, 3), np.float32) * (hi - lo)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.asarray(o, jnp.float32),
               direction=jnp.asarray(d, jnp.float32))
    t_max = jnp.full((n,), 1e5, jnp.float32)
    maxv = pc._pad128(C)
    cb = pc._cid_bits(C)

    def entry_sets(lists, counts):
        e = np.asarray(lists) & ((1 << cb) - 1)
        return [set(row[:c]) for row, c in zip(e, np.asarray(counts))]

    single = pc.cull_clusters_per_lane(
        bvh.cluster_min, bvh.cluster_max, rays, t_max, n, maxv)
    # force the two-level path on this small fixture
    monkeypatch.setattr(pc, "_TWO_LEVEL_MIN_C", 1)
    two = pc.cull_clusters_per_lane(
        bvh.cluster_min, bvh.cluster_max, rays, t_max, n, maxv)
    assert int(np.asarray(two[3]).sum()) == 0  # no SC overflow at K1=64
    assert entry_sets(two[0], two[1]) == entry_sets(single[0], single[1])

    # tiny SC cap: overflow must be flagged with a conservative
    # near_dropped (<= the true entry distance of every dropped cluster)
    monkeypatch.setattr(pc, "_SC_CAND_LANE", 2)
    cap = pc.cull_clusters_per_lane(
        bvh.cluster_min, bvh.cluster_max, rays, t_max, n, maxv)
    ov = np.asarray(cap[3])
    nd = np.asarray(cap[4])
    assert ov.sum() > 0  # the stress actually drops superclusters
    kept = entry_sets(cap[0], cap[1])
    want = entry_sets(single[0], single[1])
    # decode true entry distance of every single-level entry per tile
    e_single = np.asarray(single[0])
    scale_s = np.asarray(single[2])
    for t in range(len(want)):
        dropped = want[t] - kept[t]
        if not dropped:
            continue
        assert ov[t] > 0
        nearq = (e_single[t] >> cb).astype(np.float32) * scale_s[t]
        ids = e_single[t] & ((1 << cb) - 1)
        for cid in dropped:
            true_near = nearq[np.nonzero(ids == cid)[0][0]]
            # +1 quantum slack: both sides quantize with a -1 floor
            assert nd[t] <= true_near + 2.0 * scale_s[t]


def test_two_level_tile_cull_matches_single_level(big_setup, monkeypatch):
    """Same contract for the coherent (tile-frustum) cull: the
    supercluster-first path lists the same clusters as the single-level
    slab when its SC cap holds, and flags conservative overflow when it
    doesn't (previously only exercised on the 15k-cluster benchmark
    scene, never in the suite)."""
    r = big_setup
    bvh = r.bvh
    C = bvh.cluster_min.shape[0]
    n = pc.TILE * 2
    W = H = 64
    lin = jnp.arange(W * H, dtype=jnp.uint32)
    rs = rnglib.make_rng(5, lin)
    rs, ju = rnglib.lcg_randomf(rs)
    rs, jv = rnglib.lcg_randomf(rs)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    rays = Ray(origin=rays.origin[:n], direction=rays.direction[:n])
    t_max = jnp.full((n,), 1e5, jnp.float32)
    maxv = pc._pad128(C)
    cb = pc._cid_bits(C)

    def entry_sets(lists, counts):
        e = np.asarray(lists) & ((1 << cb) - 1)
        return [set(row[:c]) for row, c in zip(e, np.asarray(counts))]

    single = pc.cull_clusters(
        bvh.cluster_min, bvh.cluster_max, rays, t_max, n, maxv)
    monkeypatch.setattr(pc, "_TWO_LEVEL_MIN_C", 1)
    two = pc.cull_clusters(
        bvh.cluster_min, bvh.cluster_max, rays, t_max, n, maxv)
    assert int(np.asarray(two[3]).sum()) == 0
    assert entry_sets(two[0], two[1]) == entry_sets(single[0], single[1])

    monkeypatch.setattr(pc, "_SC_CAND", 2)
    cap = pc.cull_clusters(
        bvh.cluster_min, bvh.cluster_max, rays, t_max, n, maxv)
    ov = np.asarray(cap[3])
    nd = np.asarray(cap[4])
    assert ov.sum() > 0
    kept = entry_sets(cap[0], cap[1])
    want = entry_sets(single[0], single[1])
    e_single = np.asarray(single[0])
    scale_s = np.asarray(single[2])
    for t in range(len(want)):
        dropped = want[t] - kept[t]
        if not dropped:
            continue
        assert ov[t] > 0
        nearq = (e_single[t] >> cb).astype(np.float32) * scale_s[t]
        ids = e_single[t] & ((1 << cb) - 1)
        for cid in dropped:
            true_near = nearq[np.nonzero(ids == cid)[0][0]]
            assert nd[t] <= true_near + 2.0 * scale_s[t]


def test_row_mode_overflow_is_checked(big_setup, monkeypatch):
    """Row-granularity traces cap per-ROW lists at _ROW_MAX_VISITS; an
    overflowing row must land in the checked full-list fallback, never
    in a dropped hit.  (The tile-mode twin is
    test_overflow_is_checked_not_silent.)"""
    r = big_setup
    bvh = r.bvh
    # the list-width floor is one 128-entry block, which random rows on
    # this 330-cluster fixture rarely exceed — stress the SC level
    # instead: force the two-level per-lane cull with a 2-supercluster
    # cap, so rows overlapping more superclusters overflow and must be
    # resolved by the full-list fallback
    monkeypatch.setattr(pc, "_ROW_BOUNCE", True)     # row mode is opt-in
    monkeypatch.setattr(pc, "_ROW_MAX_VISITS", 16)   # floor: 128 entries
    monkeypatch.setattr(pc, "_TWO_LEVEL_MIN_C", 1)
    monkeypatch.setattr(pc, "_SC_CAND_LANE", 2)

    rng = np.random.default_rng(13)
    n = 999  # unique shape: defeats the jit cache, forces a retrace
    lo = np.asarray(bvh.cluster_min.min(axis=0))
    hi = np.asarray(bvh.cluster_max.max(axis=0))
    o = lo + rng.random((n, 3), np.float32) * (hi - lo)
    o[:, 1] = hi[1] * 1.2
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.asarray(o, jnp.float32),
               direction=jnp.asarray(d, jnp.float32))

    ch, stats = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        refine=True, interpret=True,
    )
    assert int(stats["overflow"]) > 0  # rows really overflowed the cap

    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2], axis=1
    )
    want = intersect_brute(tris, rays)
    want_ids = np.where(
        np.asarray(want.tri_id) >= 0,
        np.asarray(bvh.prim_id)[np.maximum(np.asarray(want.tri_id), 0)],
        -1,
    )
    assert (np.asarray(ch.tri_id) == want_ids).mean() > 0.999
    m = want_ids >= 0
    np.testing.assert_allclose(
        np.asarray(ch.t)[m], np.asarray(want.t)[m], rtol=1e-4, atol=1e-3
    )

    occ, astats = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((n,), 1e5, jnp.float32), refine=True, interpret=True,
    )
    assert int(astats["overflow"]) > 0
    assert (np.asarray(occ) == (want_ids >= 0)).all()


def test_sc_cap_overflow_checked_at_full_list_width(big_setup, monkeypatch):
    """Round-4 regression: the checked fallback must compile in whenever
    the TWO-LEVEL cull can drop superclusters, even when the list width
    covers every cluster (C <= max_visits).  The old ``C > maxv`` guard
    compiled it out, and an SC-cap drop (_SC_CAND_LANE binding) silently
    lost 4.8%% of terrain bounce hits at OPTIX_TPU_SC_KEEP=246."""
    r = big_setup
    bvh = r.bvh
    C = bvh.cluster_min.shape[0]

    rng = np.random.default_rng(11)
    n = pc.TILE * 2
    lo = np.asarray(bvh.cluster_min.min(axis=0))
    hi = np.asarray(bvh.cluster_max.max(axis=0))
    o = lo + rng.random((n, 3), np.float32) * (hi - lo)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.asarray(o, jnp.float32),
               direction=jnp.asarray(d, jnp.float32))

    # force the two-level per-lane cull with a tiny SC cap, and a list
    # width that holds every cluster: overflow now comes ONLY from
    # dropped superclusters
    monkeypatch.setattr(pc, "_TWO_LEVEL_MIN_C", 1)
    monkeypatch.setattr(pc, "_SC_CAND_LANE", 2)
    monkeypatch.setattr(pc, "_SC_KEEP", -(-C // pc._SC_GROUP) + 1)
    assert pc._SC_KEEP * pc._SC_GROUP >= C

    ch, stats = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        max_visits=pc._pad128(C), refine=True, interpret=True,
    )
    assert int(stats["overflow"]) > 0  # SC drops actually happened

    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2], axis=1
    )
    want = intersect_brute(tris, rays)
    want_ids = np.where(
        np.asarray(want.tri_id) >= 0,
        np.asarray(bvh.prim_id)[np.maximum(np.asarray(want.tri_id), 0)],
        -1,
    )
    assert (np.asarray(ch.tri_id) == want_ids).mean() > 0.999  # t-ties only
    m = want_ids >= 0
    np.testing.assert_allclose(
        np.asarray(ch.t)[m], np.asarray(want.t)[m], rtol=1e-4, atol=1e-3
    )

    occ, astats = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((n,), 1e5, jnp.float32), refine=True, interpret=True,
    )
    assert (np.asarray(occ) == (want_ids >= 0)).all()


def test_sorted_any_trace_matches_oracle(big_setup):
    """The corridor-sorted shadow trace (traverse.trace_any_clusters_
    sorted — PATH's NEE path on big scenes) must equal the brute oracle
    with per-ray finite t_max, including dead lanes (t_max = 0, the
    masked path lanes) that the sort packs into inert tiles."""
    from optix_renderer_tpu.accel.traverse import trace_any_clusters_sorted

    r = big_setup
    bvh = r.bvh

    rng = np.random.default_rng(23)
    n = 1000  # partial tile on purpose
    lo = np.asarray(bvh.cluster_min.min(axis=0))
    hi = np.asarray(bvh.cluster_max.max(axis=0))
    o = lo + rng.random((n, 3), np.float32) * (hi - lo)
    o[:, 1] = hi[1] * 1.2
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.asarray(o, jnp.float32),
               direction=jnp.asarray(d, jnp.float32))
    scale = float(np.linalg.norm(hi - lo))
    t_max = (rng.random(n, np.float32) * scale).astype(np.float32)
    t_max[::5] = 0.0  # dead path lanes

    occ, _ = trace_any_clusters_sorted(
        bvh, rays, t_max=jnp.asarray(t_max), interpret=True)

    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2], axis=1
    )
    want = intersect_brute(tris, rays)
    want_t = np.asarray(want.t)
    want_occ = (np.asarray(want.tri_id) >= 0) & (want_t < t_max)
    # exclude closest hits within quantization reach of the t_max cut
    clear = np.abs(want_t - t_max) > 1e-3 * np.maximum(t_max, 1.0)
    assert want_occ[clear].mean() > 0.1  # the case is non-trivial
    assert (~want_occ[t_max == 0.0]).all()
    assert (np.asarray(occ)[clear] == want_occ[clear]).all()
