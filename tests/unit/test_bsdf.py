"""BSDF/material unit tests: closed-form checks, reciprocity, sample/pdf
consistency (chi^2-style integration), and the G2 fix regression."""

import numpy as np
import jax.numpy as jnp

from optix_renderer_tpu.core import math as cm
from optix_renderer_tpu.shading import bsdf, material


def unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_d_ggx_normalization():
    """Integral of D(wh) cos(wh) over the hemisphere = 1."""
    for alpha in [0.1, 0.3, 0.8]:
        n = 400
        theta = (np.arange(n) + 0.5) / n * (np.pi / 2)
        phi_count = 1  # isotropic: phi integral = 2pi
        wh = np.stack([np.sin(theta), np.zeros(n), np.cos(theta)], -1).astype(np.float32)
        d = np.asarray(bsdf.d_ggx(jnp.asarray(wh), jnp.float32(alpha)))
        integrand = d * np.cos(theta) * np.sin(theta)
        total = integrand.sum() * (np.pi / 2 / n) * 2 * np.pi * phi_count
        assert abs(total - 1.0) < 2e-2, (alpha, total)


def test_g2_not_dead():
    """Regression vs quirk #3: G2 must be ~1 for near-normal directions."""
    wi = jnp.asarray([unit([0.1, 0.0, 1.0])])
    wo = jnp.asarray([unit([0.0, 0.1, 1.0])])
    g = float(bsdf.g2_smith_height_correlated_ggx(wi, wo, jnp.asarray([0.3]))[0])
    assert 0.9 < g <= 1.0


def test_ggx_reflection_reciprocity():
    r = np.random.default_rng(0)
    wi = r.normal(size=(64, 3)).astype(np.float32)
    wi[:, 2] = np.abs(wi[:, 2])
    wi /= np.linalg.norm(wi, axis=-1, keepdims=True)
    wo = r.normal(size=(64, 3)).astype(np.float32)
    wo[:, 2] = np.abs(wo[:, 2])
    wo /= np.linalg.norm(wo, axis=-1, keepdims=True)
    f0 = jnp.full((64, 3), 0.7, jnp.float32)
    alpha = jnp.full((64,), 0.4, jnp.float32)
    a = np.asarray(bsdf.microfacet_reflection_ggx(jnp.asarray(wi), jnp.asarray(wo), f0, alpha))
    b = np.asarray(bsdf.microfacet_reflection_ggx(jnp.asarray(wo), jnp.asarray(wi), f0, alpha))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_cosine_pdf_integrates_to_one():
    """pdf over the hemisphere integrates to 1 (grid quadrature)."""
    n_t, n_p = 128, 64
    theta = (np.arange(n_t) + 0.5) / n_t * (np.pi / 2)
    phi = (np.arange(n_p) + 0.5) / n_p * (2 * np.pi)
    T, P = np.meshgrid(theta, phi, indexing="ij")
    wi = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1).reshape(-1, 3)
    wo = np.tile(unit([0.3, 0.2, 0.9]), (len(wi), 1))
    p = np.asarray(bsdf.pdf_cosine_hemisphere(jnp.asarray(wi, jnp.float32), jnp.asarray(wo, jnp.float32)))
    integral = (p.reshape(n_t, n_p) * np.sin(T)).sum() * (np.pi / 2 / n_t) * (2 * np.pi / n_p)
    assert abs(integral - 1.0) < 1e-2


def test_vndf_pdf_matches_sampling_mass():
    """The VNDF reflection pdf integrated over the upper hemisphere equals
    the Monte-Carlo fraction of VNDF samples whose reflection stays above
    the horizon (the below-horizon mass is rejected by sample_direction,
    so the pdf intentionally integrates to < 1)."""
    n_t, n_p = 256, 128
    theta = (np.arange(n_t) + 0.5) / n_t * (np.pi / 2)
    phi = (np.arange(n_p) + 0.5) / n_p * (2 * np.pi)
    T, P = np.meshgrid(theta, phi, indexing="ij")
    wi = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P), np.cos(T)], -1).reshape(-1, 3)
    r = np.random.default_rng(3)
    n_mc = 200_000
    for alpha in [0.3, 0.7]:
        wo1 = unit([0.4, 0.0, 0.8])
        wo = np.tile(wo1, (len(wi), 1))
        p = np.asarray(
            bsdf.pdf_ggx_vndf_reflection(
                jnp.asarray(wi, jnp.float32), jnp.asarray(wo, jnp.float32), jnp.full(len(wi), alpha, jnp.float32)
            )
        )
        integral = (p.reshape(n_t, n_p) * np.sin(T)).sum() * (np.pi / 2 / n_t) * (2 * np.pi / n_p)
        # MC: fraction of reflected VNDF samples above the horizon
        u1 = jnp.asarray(r.random(n_mc, dtype=np.float32))
        u2 = jnp.asarray(r.random(n_mc, dtype=np.float32))
        wom = jnp.asarray(np.tile(wo1, (n_mc, 1)), jnp.float32)
        wh = bsdf.sample_ggx_vndf(wom, jnp.full(n_mc, alpha, jnp.float32), u1, u2)
        wh_n = np.asarray(wh)
        wi_mc = 2 * (wh_n * wo1).sum(-1, keepdims=True) * wh_n - wo1
        frac = (wi_mc[:, 2] > 0).mean()
        assert abs(integral - frac) < 1.5e-2, (alpha, integral, frac)


def test_sample_direction_consistency():
    """Sampled wi land in the upper hemisphere and pdf(wi) matches the
    separately-evaluated material.pdf."""
    r = np.random.default_rng(1)
    n = 4096
    wo = np.tile(unit([0.2, -0.3, 0.93]), (n, 1)).astype(np.float32)
    base = jnp.full((n, 3), 0.6, jnp.float32)
    alpha = jnp.full((n,), 0.5, jnp.float32)
    u1 = jnp.asarray(r.random(n, dtype=np.float32))
    u2 = jnp.asarray(r.random(n, dtype=np.float32))
    wi, p, valid = material.sample_direction(jnp.asarray(wo), u1, u2, base, alpha)
    wi_n, p_n, valid_n = np.asarray(wi), np.asarray(p), np.asarray(valid)
    # ~2/3 specular picks x ~20% below-horizon rejection at alpha=0.5
    assert valid_n.mean() > 0.8
    assert (wi_n[valid_n][:, 2] > 0).all()
    p2 = np.asarray(material.pdf(wi, jnp.asarray(wo), base, alpha))
    np.testing.assert_allclose(p_n[valid_n], p2[valid_n], rtol=1e-4, atol=1e-6)
    # unit vectors
    np.testing.assert_allclose(np.linalg.norm(wi_n[valid_n], axis=-1), 1.0, atol=1e-4)


def test_energy_estimator_bounded():
    """E[f cos / pdf] (directional albedo) stays <= ~1 for white base."""
    r = np.random.default_rng(2)
    n = 200_000
    wo = np.tile(unit([0.1, 0.2, 0.97]), (n, 1)).astype(np.float32)
    base = jnp.ones((n, 3), jnp.float32)
    alpha = jnp.full((n,), 0.4, jnp.float32)
    u1 = jnp.asarray(r.random(n, dtype=np.float32))
    u2 = jnp.asarray(r.random(n, dtype=np.float32))
    wi, p, valid = material.sample_direction(jnp.asarray(wo), u1, u2, base, alpha)
    f = material.evaluate(wi, jnp.asarray(wo), base, alpha)
    cos_i = np.maximum(np.asarray(wi)[:, 2], 0)
    est = np.asarray(f)[:, 0] * cos_i / np.maximum(np.asarray(p), 1e-9)
    est = np.where(np.asarray(valid), est, 0.0)
    assert np.isfinite(est).all()
    assert est.mean() < 1.05  # energy conservation (0.5/0.5 lobes, white f0)
    assert est.mean() > 0.3
