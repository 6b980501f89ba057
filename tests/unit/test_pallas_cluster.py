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
from optix_renderer_tpu.engine.shade import build_surface_interaction_from_cluster
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
    ch, overflow = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays, interpret=True
    )
    assert int(overflow) == 0
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
    ch, _ = pc.trace_closest_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays, interpret=True
    )
    si = build_surface_interaction_from_cluster(ds, rays, ch)
    m = np.asarray(si.hit)
    tid = np.asarray(ch.tri_id)[m]

    # mesh-table attributes must match the scene exactly
    mesh = np.asarray(ds.tri_mesh)[tid]
    np.testing.assert_allclose(
        np.asarray(si.diffuse)[m], np.asarray(ds.mesh_diffuse)[mesh], atol=1e-6
    )
    assert (np.asarray(si.material_id)[m] == np.asarray(ds.mesh_material_id)[mesh]).all()
    assert (np.asarray(si.is_light)[m] == np.asarray(ds.mesh_is_light)[mesh]).all()

    # normal = representative (normalized vertex-normal sum) of the hit tri
    idx = np.asarray(ds.tri_index)[tid]
    nsum = np.asarray(ds.normals)[idx].sum(axis=1)
    nrep = nsum / np.maximum(np.linalg.norm(nsum, axis=-1, keepdims=True), 1e-20)
    np.testing.assert_allclose(np.asarray(si.n_geom)[m], nrep, atol=1e-4)

    # p consistent with ray parametrization
    p = np.asarray(rays.origin)[m] + np.asarray(ch.t)[m, None] * np.asarray(rays.direction)[m]
    np.testing.assert_allclose(np.asarray(si.p)[m], p, atol=1e-3)


def test_cluster_any_occlusion(setup):
    r, rays = setup
    bvh = r.bvh
    occ, overflow = pc.trace_any_clusters(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        t_max=jnp.full((rays.origin.shape[0],), 1e4, jnp.float32),
        interpret=True,
    )
    assert int(overflow) == 0
    tris = jnp.stack(
        [bvh.tri_v0, bvh.tri_v0 + bvh.tri_e1, bvh.tri_v0 + bvh.tri_e2], axis=1
    )
    want = intersect_brute(tris, rays, t_max=1e4)
    assert (np.asarray(occ) == (np.asarray(want.tri_id) >= 0)).all()


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
        ch_s, _ = pc.trace_closest_clusters(
            bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, sorted_rays, interpret=True
        )
        n = rays.origin.shape[0]
        inv = jnp.zeros((n,), jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
        ch = shade._permute_cluster_hit(ch_s, inv)
        want, _ = pc.trace_closest_clusters(
            bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays, interpret=True
        )
        assert (np.asarray(ch.tri_id) == np.asarray(want.tri_id)).all()
        np.testing.assert_array_equal(np.asarray(ch.t), np.asarray(want.t))
        np.testing.assert_array_equal(np.asarray(ch.normal), np.asarray(want.normal))
        assert (np.asarray(ch.mesh_id) == np.asarray(want.mesh_id)).all()
