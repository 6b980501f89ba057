"""BVH build + traversal validated ray-for-ray against the brute-force oracle."""

import jax
import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.accel.build import build_bvh
from optix_renderer_tpu.accel.traverse import (
    intersect_brute,
    trace_any,
    trace_any_bvh,
    trace_closest,
    trace_closest_brute,
    trace_closest_bvh,
)
from optix_renderer_tpu.core.types import Ray
from optix_renderer_tpu.scene import procedural
from optix_renderer_tpu.scene.config import parse_scene
from optix_renderer_tpu.scene.device import build_device_scene


def random_soup(n_tri, seed=0, scale=1.0):
    r = np.random.default_rng(seed)
    base = r.random((n_tri, 1, 3), dtype=np.float32) * scale
    verts = base + (r.random((n_tri, 3, 3), dtype=np.float32) - 0.5) * 0.2 * scale
    return verts.astype(np.float32)


def random_rays(n, seed=1, origin_scale=1.0):
    r = np.random.default_rng(seed)
    o = (r.random((n, 3), dtype=np.float32) - 0.5) * 2 * origin_scale
    d = r.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return Ray(origin=jnp.asarray(o), direction=jnp.asarray(d))


def check_matches_brute(tri_verts, rays, t_min=0.0, tracer=trace_closest):
    bvh = build_bvh(tri_verts)
    got = tracer(bvh, rays, t_min=t_min)
    want = intersect_brute(jnp.asarray(tri_verts), rays, t_min=t_min)
    # same hit/miss classification
    np.testing.assert_array_equal(np.asarray(got.tri_id >= 0), np.asarray(want.tri_id >= 0))
    hit = np.asarray(want.tri_id >= 0)
    # same t (tri ids can differ only for exactly-tied t at shared edges)
    np.testing.assert_allclose(
        np.asarray(got.t)[hit], np.asarray(want.t)[hit], rtol=1e-4, atol=1e-5
    )
    same_tri = np.asarray(got.tri_id) == np.asarray(want.tri_id)
    assert same_tri[hit].mean() > 0.99
    np.testing.assert_allclose(
        np.asarray(got.bary_u)[hit & same_tri], np.asarray(want.bary_u)[hit & same_tri], atol=1e-4
    )


def test_traversal_matches_brute_soup():
    # both implementations, regardless of the size-based dispatch
    check_matches_brute(random_soup(300), random_rays(512), tracer=trace_closest_bvh)
    check_matches_brute(random_soup(300), random_rays(512), tracer=trace_closest_brute)


def test_traversal_matches_brute_clustered():
    # clustered geometry exercises deep subtrees
    a = random_soup(100, seed=2, scale=0.1)
    b = random_soup(100, seed=3, scale=0.1) + np.float32([5, 0, 0])
    tris = np.concatenate([a, b])
    # rays aimed at random triangle centroids -> guaranteed hit coverage
    r = np.random.default_rng(4)
    o = (r.random((512, 3), dtype=np.float32) - 0.5) * 2 + np.float32([2.5, 0, -3])
    targets = tris[r.integers(0, len(tris), 512)].mean(axis=1)
    d = targets - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(origin=jnp.asarray(o), direction=jnp.asarray(d.astype(np.float32)))
    assert int(np.asarray(intersect_brute(jnp.asarray(tris), rays).tri_id >= 0).sum()) > 400
    check_matches_brute(tris, rays)


def test_traversal_single_triangle():
    tri = np.asarray([[[0, 0, 1], [1, 0, 1], [0, 1, 1]]], np.float32)
    rays = Ray(
        origin=jnp.asarray([[0.2, 0.2, 0.0], [0.9, 0.9, 0.0]]),
        direction=jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]]),
    )
    hit = trace_closest(build_bvh(tri), rays)
    assert int(hit.tri_id[0]) == 0 and abs(float(hit.t[0]) - 1.0) < 1e-6
    assert int(hit.tri_id[1]) == -1


def test_traversal_cornell(tmp_path):
    scene = parse_scene(procedural.write_cornell_scene(str(tmp_path / "c")))
    ds = build_device_scene(scene)
    tri_verts = np.asarray(ds.vertices)[np.asarray(ds.tri_index)]
    # rays from the camera into the box
    cam = scene.cameras[0]
    n = 256
    r = np.random.default_rng(7)
    uv = r.random((n, 2), dtype=np.float32)
    # simple look-at ray fan
    fwd = cam.at - cam.from_
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, cam.up)
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    d = fwd + (uv[:, :1] - 0.5) * right * 0.6 + (uv[:, 1:] - 0.5) * up * 0.6
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = Ray(
        origin=jnp.tile(jnp.asarray(cam.from_), (n, 1)), direction=jnp.asarray(d, jnp.float32)
    )
    check_matches_brute(tri_verts, rays)
    # all camera rays into a closed box must hit something
    hit = trace_closest(build_bvh(tri_verts), rays)
    assert (np.asarray(hit.tri_id) >= 0).all()


def test_trace_any_matches_closest():
    tri = random_soup(200, seed=5)
    rays = random_rays(512, seed=6)
    bvh = build_bvh(tri)
    closest = trace_closest(bvh, rays)
    for anyfn in (trace_any, trace_any_bvh):
        occluded = anyfn(bvh, rays)
        np.testing.assert_array_equal(np.asarray(occluded), np.asarray(closest.tri_id >= 0))


def test_trace_any_tmax():
    tri = np.asarray([[[0, 0, 1], [1, 0, 1], [0, 1, 1]]], np.float32)
    bvh = build_bvh(tri)
    rays = Ray(origin=jnp.asarray([[0.2, 0.2, 0.0]]), direction=jnp.asarray([[0.0, 0.0, 1.0]]))
    assert bool(trace_any(bvh, rays, t_max=jnp.asarray([2.0]))[0])
    assert not bool(trace_any(bvh, rays, t_max=jnp.asarray([0.5]))[0])


def test_bvh_cache_roundtrip(tmp_path):
    """build_bvh_cached must return the exact same BVH from a cache hit
    as from a build, key on content (different leaf_size = different
    entry), and never serve a stale entry for different geometry."""
    import jax.numpy as jnp

    from optix_renderer_tpu.accel.build import build_bvh, build_bvh_cached

    rng = np.random.default_rng(5)
    tv = rng.random((600, 3, 3)).astype(np.float32)
    d = str(tmp_path / "bake")

    cold = build_bvh_cached(d, tv, leaf_size=4)
    files = list((tmp_path / "bake").glob("bvh-*.npz"))
    assert len(files) == 1
    warm = build_bvh_cached(d, tv, leaf_size=4)
    import dataclasses

    ref = build_bvh(tv, leaf_size=4)
    for fld in dataclasses.fields(ref):
        f = fld.name
        a, b, c = getattr(ref, f), getattr(cold, f), getattr(warm, f)
        for x, y, z in zip(jax.tree.leaves(a), jax.tree.leaves(b), jax.tree.leaves(c)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
            np.testing.assert_array_equal(np.asarray(x), np.asarray(z))

    # a different build parameter or geometry is a different cache entry
    build_bvh_cached(d, tv, leaf_size=8)
    tv2 = tv.copy()
    tv2[0, 0, 0] += 1.0
    other = build_bvh_cached(d, tv2, leaf_size=4)
    assert len(list((tmp_path / "bake").glob("bvh-*.npz"))) == 3
    assert not np.array_equal(
        np.asarray(other.tri_v0), np.asarray(warm.tri_v0))
