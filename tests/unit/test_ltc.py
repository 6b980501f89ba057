"""LTC stack vs the scalar oracle: clipping (all 23 cases), LUT fetch,
polygon integration, and the full per-pixel baseline."""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.core import math as cm
from optix_renderer_tpu.shading import ltc
from optix_renderer_tpu.shading.polygon_clip import clip_polygon

from tests.oracles import ltc_oracle as oracle


def random_polys(n, vcount, seed):
    """Random unit-ish vertices with mixed z signs, padded to 5 with v0."""
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, vcount, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    pad = np.repeat(v[:, :1], 5 - vcount, axis=1)
    return np.concatenate([v, pad], axis=1).astype(np.float32)


def test_clip_covers_all_cases_vs_oracle():
    masks_seen = set()
    for vcount, seed in [(3, 0), (3, 1), (4, 2), (4, 3)]:
        polys = random_polys(512, vcount, seed)
        counts = np.full(512, vcount, np.int32)
        got_v, got_vc = clip_polygon(jnp.asarray(polys), jnp.asarray(counts))
        got_v = np.asarray(got_v)
        got_vc = np.asarray(got_vc)
        for i in range(512):
            v = [polys[i, j].astype(np.float64).copy() for j in range(5)]
            bit_mask = vcount
            for k in range(4):
                if v[k][2] > 0 and (k < 3 or k < vcount):
                    bit_mask |= 1 << (k + 3)
            masks_seen.add(bit_mask)
            want_vc = oracle.clip_polygon(vcount, v)
            assert got_vc[i] == want_vc, f"vc mismatch mask={bit_mask}"
            for j in range(want_vc):
                np.testing.assert_allclose(got_v[i, j], v[j], atol=2e-5, err_msg=f"mask={bit_mask} slot={j}")
            # the repeat-first-vertex convention (slot vc) for vc < 5
            if 0 < want_vc < 5:
                np.testing.assert_allclose(got_v[i, want_vc], v[want_vc], atol=2e-5)
    # all triangle masks + all quad masks must have been exercised
    tri_masks = {3, 11, 19, 35, 27, 51, 43, 59}
    quad_masks = {4, 12, 20, 36, 68, 28, 52, 100, 76, 60, 116, 108, 92, 124}
    assert tri_masks <= masks_seen and quad_masks <= masks_seen


def test_fetch_ltc_mat_vs_oracle():
    r = np.random.default_rng(5)
    alphas = r.random(64).astype(np.float32)
    thetas = (r.random(64) * np.pi / 2).astype(np.float32)
    mats, amps = ltc.fetch_ltc_mat(jnp.asarray(alphas), jnp.asarray(thetas))
    mats = np.asarray(mats)
    amps = np.asarray(amps)
    for i in range(64):
        want_m, want_a = oracle.fetch_ltc_mat(float(alphas[i]), float(thetas[i]))
        np.testing.assert_allclose(mats[i], want_m, atol=2e-6)
        np.testing.assert_allclose(amps[i], want_a, atol=2e-6)


def test_integrate_edge_vs_oracle():
    r = np.random.default_rng(6)
    v = r.normal(size=(32, 2, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    got = np.asarray(ltc.integrate_edge_vec(jnp.asarray(v[:, 0], jnp.float32), jnp.asarray(v[:, 1], jnp.float32)))[:, 2]
    want = [oracle.integrate_edge(v[i, 0], v[i, 1]) for i in range(32)]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ltc_pipeline_vs_oracle():
    """Full per-pixel LTC baseline vs scalar oracle at random shading points."""
    r = np.random.default_rng(7)
    n = 64
    cam = np.array([278.0, 273.0, -800.0])
    p = r.random((n, 3)) * [550, 540, 550]
    nrm = r.normal(size=(n, 3))
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    diffuse = r.random((n, 3))
    alpha = np.clip(r.random(n), 0.01, 1.0)
    lights = [
        dict(
            v1=np.array([343.0, 548.7, 227.0]),
            v2=np.array([343.0, 548.7, 332.0]),
            v3=np.array([213.0, 548.7, 332.0]),
            normal=np.array([0.0, -1.0, 0.0]),
            emit=np.array([17.0, 12.0, 4.0]),
        ),
        dict(
            v1=np.array([343.0, 548.7, 227.0]),
            v2=np.array([213.0, 548.7, 332.0]),
            v3=np.array([213.0, 548.7, 227.0]),
            normal=np.array([0.0, -1.0, 0.0]),
            emit=np.array([17.0, 12.0, 4.0]),
        ),
    ]

    # vectorized path
    f32 = lambda x: jnp.asarray(x, jnp.float32)  # noqa: E731
    wo = cm.normalize(f32(cam)[None] - f32(p), eps=1e-30)
    to_local, _ = cm.orthonormal_basis(f32(nrm))
    wo_local = cm.normalize(cm.apply_mat(to_local, wo), eps=1e-30)
    theta = cm.spherical_theta(wo_local)
    mats, amps = ltc.fetch_ltc_mat(f32(alpha), theta)
    inv = cm.matrix_inverse_3x3(mats)
    iso = ltc.iso_frame_from_wo_local(wo_local)
    got = ltc.integrate_over_polygon(
        f32(p), f32(diffuse), to_local, iso, inv, amps,
        f32(np.stack([L["v1"] for L in lights])),
        f32(np.stack([L["v2"] for L in lights])),
        f32(np.stack([L["v3"] for L in lights])),
        f32(np.stack([L["normal"] for L in lights])),
        f32(np.stack([L["emit"] for L in lights])),
    )
    got = np.where(np.asarray(wo_local[:, 2]) >= 0, np.asarray(got).T, 0.0).T

    for i in range(n):
        want = oracle.ltc_direct_baseline(cam, p[i], nrm[i], diffuse[i], float(alpha[i]), lights)
        np.testing.assert_allclose(
            got[i], want, rtol=2e-3, atol=2e-4, err_msg=f"pixel {i}"
        )
