"""Winner-attribute fetch kernel (accel.pallas_cluster.fetch_winner_attrs)
vs the per-lane row-gather oracle, in interpret mode, on a cluster-tier
scene.  The kernel replaces the reference's SBT-record/attribute fetch
inputs (cuda_include/hit_miss.cuh:14-50) for coherent traces."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from optix_renderer_tpu.accel import pallas_cluster as pc
from optix_renderer_tpu.core import rng as rnglib
from optix_renderer_tpu.engine import camera as cameralib
from optix_renderer_tpu.engine.modes import RendererType
from optix_renderer_tpu.engine.renderer import Renderer
from optix_renderer_tpu.engine.shade import build_surface_interaction_fused
from optix_renderer_tpu.scene import procedural
from optix_renderer_tpu.scene.config import parse_scene


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("terrain_wa")
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
    bvh = r.bvh
    key, cid, _t_eff, stats, (cids_l, cnts) = pc.trace_closest_clusters_packed(
        bvh.tri_tab, bvh.cluster_min, bvh.cluster_max, rays,
        interpret=True, return_lists=True,
    )
    assert int(stats["overflow"]) == 0
    return r, rays, key, cid, cids_l, cnts


def _gather_oracle(bvh, key, cid):
    tri_sorted = jnp.where(
        cid >= 0, cid * pc.GROUP_CLUSTER + (key & pc._LOCAL_MASK), 0)
    ra = jnp.take(bvh.shade_tab[0], tri_sorted, axis=0)  # (N, 20)
    rb = jnp.take(bvh.shade_tab[1], tri_sorted, axis=0)  # (N, 8)
    cols = np.concatenate(
        [np.asarray(ra), np.asarray(rb)[:, :6]], axis=1).T  # (26, N)
    cols[:, np.asarray(cid) < 0] = 0.0  # kernel zeroes miss lanes
    return cols


def test_winner_attrs_match_gather(setup):
    r, rays, key, cid, cids_l, cnts = setup
    bvh = r.bvh
    n = rays.origin.shape[0]
    cols, ok = pc.fetch_winner_attrs(
        bvh.shade_gtab, cids_l, cnts, key, cid, n, interpret=True)
    assert bool(ok)
    want = _gather_oracle(bvh, key, cid)
    assert (np.asarray(cid) >= 0).mean() > 0.5  # scene actually visible
    np.testing.assert_array_equal(np.asarray(cols), want)


def test_winner_attrs_found_check_routes_to_fallback(setup):
    r, rays, key, cid, cids_l, cnts = setup
    bvh = r.bvh
    n = rays.origin.shape[0]
    # tamper: clear the lists of the first tile that has a hit, so its
    # lanes' winning clusters cannot be found (the situation the checked
    # overflow fallback can create)
    hit_tiles = np.unique(np.nonzero(np.asarray(cid) >= 0)[0] // (8 * pc.LANES))
    t0 = int(hit_tiles[0])
    bad_cnts = jnp.asarray(np.where(np.arange(cnts.shape[0]) == t0, 0,
                                    np.asarray(cnts)), jnp.int32)
    want = _gather_oracle(bvh, key, cid)
    cols, ok = pc.fetch_winner_attrs(
        bvh.shade_gtab, cids_l, bad_cnts, key, cid, n, interpret=True,
        fallback_fn=lambda: jnp.asarray(want))
    assert not bool(ok)
    np.testing.assert_array_equal(np.asarray(cols), want)


def test_si_identical_with_and_without_winner_attrs(setup):
    r, rays, key, cid, cids_l, cnts = setup
    ds, bvh = r.device_scene, r.bvh
    n = rays.origin.shape[0]
    cols, ok = pc.fetch_winner_attrs(
        bvh.shade_gtab, cids_l, cnts, key, cid, n, interpret=True)
    assert bool(ok)
    si_k = build_surface_interaction_fused(
        ds, rays, key, cid, bvh.shade_tab, cols=cols)
    si_g = build_surface_interaction_fused(ds, rays, key, cid, bvh.shade_tab)
    for name in ("hit", "p", "uv", "n_geom", "diffuse", "alpha", "emit",
                 "is_light", "material_id", "area"):
        np.testing.assert_array_equal(
            np.asarray(getattr(si_k, name)), np.asarray(getattr(si_g, name)),
            err_msg=name)
