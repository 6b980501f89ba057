"""Unit tests for core.math vs closed-form / numpy references."""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.core import math as cm


def rand_unit(n, seed=0):
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def test_orthonormal_basis_properties():
    # Exclude near-singular normals (nz -> -1): the reference formula
    # (utils.cuh:178-181, a = 1/(1+nz)) loses fp32 precision there by
    # construction; robustness at the pole is covered separately below.
    v = rand_unit(400)
    v = v[v[:, 2] > -0.9][:256]
    assert len(v) == 256
    n = jnp.asarray(v)
    to_local, to_world = cm.orthonormal_basis(n)
    eye = jnp.eye(3)
    # rows orthonormal
    gram = jnp.einsum("nij,nkj->nik", to_local, to_local)
    np.testing.assert_allclose(np.asarray(gram), np.tile(eye, (256, 1, 1)), atol=2e-5)
    # to_world is the inverse
    prod = jnp.einsum("nij,njk->nik", to_local, to_world)
    np.testing.assert_allclose(np.asarray(prod), np.tile(eye, (256, 1, 1)), atol=2e-5)
    # normal maps to +z in local frame
    nz = cm.apply_mat(to_local, n)
    np.testing.assert_allclose(np.asarray(nz), np.tile([0, 0, 1.0], (256, 1)), atol=2e-5)


def test_orthonormal_basis_singular_case():
    n = jnp.asarray([[0.0, 0.0, -1.0]], dtype=jnp.float32)
    to_local, _ = cm.orthonormal_basis(n)
    # reference branch: c1=(0,-1,0), c2=(-1,0,0)  (utils.cuh:171-175)
    np.testing.assert_allclose(np.asarray(to_local[0, 0]), [0, -1, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(to_local[0, 1]), [-1, 0, 0], atol=1e-6)


def test_matrix_inverse():
    r = np.random.default_rng(1)
    m = r.normal(size=(64, 3, 3)).astype(np.float32) + np.eye(3, dtype=np.float32) * 2
    inv = np.asarray(cm.matrix_inverse_3x3(jnp.asarray(m)))
    want = np.linalg.inv(m.astype(np.float64)).astype(np.float32)
    np.testing.assert_allclose(inv, want, rtol=2e-3, atol=2e-4)


def test_cosine_hemisphere_stats():
    r = np.random.default_rng(2)
    u1 = jnp.asarray(r.random(200000, dtype=np.float32))
    u2 = jnp.asarray(r.random(200000, dtype=np.float32))
    d = np.asarray(cm.cosine_sample_hemisphere_concentric(u1, u2))
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)
    assert (d[:, 2] >= 0).all()
    # E[cos theta] = 2/3 for cosine-weighted hemisphere
    assert abs(d[:, 2].mean() - 2.0 / 3.0) < 5e-3


def test_triangle_sampling_uniform():
    v1 = jnp.asarray([[0.0, 0.0, 0.0]])
    v2 = jnp.asarray([[1.0, 0.0, 0.0]])
    v3 = jnp.asarray([[0.0, 1.0, 0.0]])
    r = np.random.default_rng(3)
    u1 = jnp.asarray(r.random((50000, 1), dtype=np.float32))
    u2 = jnp.asarray(r.random((50000, 1), dtype=np.float32))
    p = np.asarray(cm.sample_point_on_triangle(v1, v2, v3, u1, u2)).reshape(-1, 3)
    assert (p[:, 0] >= -1e-6).all() and (p[:, 1] >= -1e-6).all()
    assert (p[:, 0] + p[:, 1] <= 1 + 1e-5).all()
    # centroid of uniform samples ~ triangle centroid (1/3, 1/3)
    np.testing.assert_allclose(p.mean(axis=0), [1 / 3, 1 / 3, 0], atol=4e-3)


def test_balance_heuristic():
    got = float(cm.balance_heuristic(1, jnp.float32(0.25), 1, jnp.float32(0.75)))
    assert abs(got - 0.25) < 1e-6


def test_matrix_roundtrip_apply():
    v = rand_unit(64, seed=5)
    v = v[v[:, 2] > -0.9][:32]
    n = jnp.asarray(v)
    to_local, to_world = cm.orthonormal_basis(n)
    v = jnp.asarray(rand_unit(32, seed=6))
    v2 = cm.apply_mat(to_world, cm.apply_mat(to_local, v))
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=3e-5)


def test_triangle_area():
    a = float(
        cm.triangle_area(
            jnp.asarray([0.0, 0, 0]), jnp.asarray([2.0, 0, 0]), jnp.asarray([0.0, 2, 0])
        )
    )
    assert abs(a - 2.0) < 1e-6
