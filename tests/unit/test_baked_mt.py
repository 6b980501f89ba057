"""Shared-origin baked Moller-Trumbore (accel.pallas_cluster.
bake_shared_origin_tab + the kernels' ``baked`` path) vs the unbaked
kernel and the jnp oracle, in interpret mode.

Primary rays all share the camera origin, so the renderer rebakes the
grouped cluster table per frame and the visit loop runs three dot
products per (triangle, ray) instead of full Moller-Trumbore; these
tests pin the algebraic identities (triple-product factoring) against
the original arithmetic on a real scene above the brute cutoff.
"""

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
from optix_renderer_tpu.scene import procedural
from optix_renderer_tpu.scene.config import parse_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("terrain_baked")
    # grid=60 -> ~7k tris: cluster tier, small enough for the brute oracle
    path = procedural.write_terrain_scene(str(d), grid=60, width=64, height=64)
    scene = parse_scene(path)
    r = Renderer(scene, width=64, height=64, mode=RendererType.MASK)
    W = H = 64
    lin = jnp.arange(W * H, dtype=jnp.uint32)
    rstate = rnglib.make_rng(10007, lin)
    rstate, ju = rnglib.lcg_randomf(rstate)
    rstate, jv = rnglib.lcg_randomf(rstate)
    rays = cameralib.primary_rays(r.state.camera, W, H, ju, jv, lin=lin)
    return r.bvh, rays


def test_bake_preserves_passthrough_columns(setup):
    bvh, rays = setup
    origin = rays.origin[0]
    baked = pc.bake_shared_origin_tab(bvh.tri_tab, origin)
    assert baked.shape == bvh.tri_tab.shape
    a = np.asarray(bvh.tri_tab).reshape(-1, 8, 16)
    b = np.asarray(baked).reshape(-1, 8, 16)
    # attrs 10-15 (normals/mesh/area pads + the cluster AABB the kernel's
    # per-lane slab pretest reads from column 15) must pass through intact
    np.testing.assert_array_equal(a[:, :, 10:], b[:, :, 10:])
    # degenerate padding rows must stay degenerate: n2 = 0 -> det = 0
    pad = (a[:, :, 3:9] == 0.0).all(axis=2)  # e1 = e2 = 0
    assert (b[:, :, 0:3][pad] == 0.0).all()


def test_baked_trace_matches_unbaked_and_oracle(setup):
    bvh, rays = setup
    origin = rays.origin[0]
    assert bool(jnp.all(rays.origin == origin[None, :]))  # shared origin
    baked = pc.bake_shared_origin_tab(bvh.tri_tab, origin)

    ch_b, stats_b = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        interpret=True, baked_tab=baked,
    )
    ch, _ = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        interpret=True,
    )
    # same winners up to float-reordering ties of the SAME MT products
    ids_b = np.asarray(ch_b.tri_id)
    ids = np.asarray(ch.tri_id)
    assert (ids_b == ids).mean() > 0.999
    m = (ids >= 0) & (ids_b >= 0)
    np.testing.assert_allclose(
        np.asarray(ch_b.t)[m], np.asarray(ch.t)[m], rtol=1e-4, atol=1e-3)

    # and against the brute oracle (original prim ids)
    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2],
        axis=1)
    want = intersect_brute(tris, rays)
    want_ids = np.where(
        np.asarray(want.tri_id) >= 0,
        np.asarray(bvh.prim_id)[np.maximum(np.asarray(want.tri_id), 0)],
        -1,
    )
    assert (ids_b == want_ids).mean() > 0.999
    mo = want_ids >= 0
    assert mo.mean() > 0.8
    np.testing.assert_allclose(
        np.asarray(ch_b.t)[mo], np.asarray(want.t)[mo], rtol=1e-4, atol=1e-3)


def test_baked_survives_overflow_fallback(tmp_path_factory):
    """Force tiny visit caps so the checked fallback fires: the fallback
    kernel must consume the SAME baked table (its rays are the same
    shared-origin primaries).  Needs > 128 clusters (the list cap floors
    at _pad128), hence the bigger grid than the shared fixture."""
    d = tmp_path_factory.mktemp("terrain_baked_of")
    path = procedural.write_terrain_scene(str(d), grid=74, width=64, height=64)
    scene = parse_scene(path)
    r = Renderer(scene, width=64, height=64, mode=RendererType.MASK)
    assert r.bvh.num_clusters > 128
    lin = jnp.arange(64 * 64, dtype=jnp.uint32)
    rstate = rnglib.make_rng(10007, lin)
    rstate, ju = rnglib.lcg_randomf(rstate)
    rstate, jv = rnglib.lcg_randomf(rstate)
    rays = cameralib.primary_rays(r.state.camera, 64, 64, ju, jv, lin=lin)
    bvh = r.bvh
    origin = rays.origin[0]
    baked = pc.bake_shared_origin_tab(bvh.tri_tab, origin)
    ch_b, stats = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        interpret=True, baked_tab=baked, max_visits=16,
    )
    assert int(stats["overflow"]) > 0  # the cap actually bound
    ch, _ = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.geom_tab, bvh.cluster_min, bvh.cluster_max, rays,
        interpret=True,
    )
    assert (np.asarray(ch_b.tri_id) == np.asarray(ch.tri_id)).mean() > 0.999
