"""Material layer: lobe dispatch over Lambert diffuse + GGX specular.

Re-design of ``cuda_include/material.cuh`` with the intended behaviour
(SURVEY §2.9): probability-weighted lobe selection (quirk #5: the
committed code forces pDiffuse = 1), proper mirror reflection about wh
(quirk #4: committed drops wo), while keeping the reference's *design*
choices — f0 = base_color, 0.5/0.5 lobe weights, and ``evaluate`` using
alpha^2 for the specular lobe while sampling/pdf use raw alpha
(material.cuh:12-21, quirk #6 "keep").
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math as cm
from . import bsdf

EPS = bsdf.EPS


def evaluate(wi, wo, base_color, alpha):
    """BRDF value (material.cuh:6-22): 0.5*Lambert + 0.5*GGX(alpha^2, f0=base)."""
    alpha2 = alpha * alpha
    diffuse = bsdf.diffuse_lambert(wi, wo, base_color)
    specular = bsdf.microfacet_reflection_ggx(wi, wo, base_color, alpha2)
    return 0.5 * diffuse + 0.5 * specular


def compute_lobe_probabilities(wo, base_color):
    """material.cuh:25-41 (with f0 = base_color this yields (1/3, 2/3))."""
    max_base = jnp.max(base_color, axis=-1)
    p_diffuse = max_base * 0.5
    p_specular = max_base
    norm = 1.0 / jnp.where(p_diffuse + p_specular == 0.0, 1.0, p_diffuse + p_specular)
    return p_diffuse * norm, p_specular * norm


def _remap(value, low1, high1, low2, high2):
    """material.cuh:43-47."""
    den = jnp.where(high1 - low1 == 0.0, 1.0, high1 - low1)
    remapped = low2 + (value - low1) * (high2 - low2) / den
    return jnp.clip(remapped, low2, high2)


def sample_direction(wo, u1, u2, base_color, alpha):
    """Sample wi in the local frame (material.cuh:49-91, intended form).

    Returns (wi (..., 3), pdf (...,), valid (...,)). Invalid lanes (the
    reference's ``return vec3(0)`` early-outs) have valid=False.
    """
    p_diffuse, p_specular = compute_lobe_probabilities(wo, base_color)
    sign = jnp.sign(jnp.where(bsdf.cos_theta(wo) == 0.0, 1.0, bsdf.cos_theta(wo)))

    pick_diffuse = u1 < p_diffuse

    # diffuse branch (material.cuh:58-65)
    u1_d = _remap(u1, 0.0, p_diffuse - EPS, 0.0, 1.0 - EPS)
    wi_d = sign[..., None] * bsdf.sample_cosine_hemisphere(u1_d, u2)
    wi_d = cm.normalize(wi_d, eps=1e-30)

    # specular branch (material.cuh:66-84): VNDF in the upper hemisphere
    u1_s = _remap(u1, p_diffuse, p_diffuse + p_specular - EPS, 0.0, 1.0 - EPS)
    wo_upper = sign[..., None] * wo
    wh = sign[..., None] * bsdf.sample_ggx_vndf(wo_upper, alpha, u1_s, u2)
    dot_wo_wh = cm.dot(wo, wh)
    # intended mirror reflection (quirk #4): wi = 2 dot(wh, wo) wh - wo
    wi_s = 2.0 * dot_wo_wh[..., None] * wh - wo
    spec_valid = (dot_wo_wh >= 0.0) & bsdf.same_hemisphere(wi_s, wo)

    wi = jnp.where(pick_diffuse[..., None], wi_d, wi_s)
    valid = pick_diffuse | spec_valid

    p = p_diffuse * bsdf.pdf_cosine_hemisphere(wi, wo) + p_specular * bsdf.pdf_ggx_vndf_reflection(wi, wo, alpha)
    return wi, p, valid


def pdf(wi, wo, base_color, alpha):
    """Combined lobe pdf (material.cuh:93-104)."""
    p_diffuse, p_specular = compute_lobe_probabilities(wo, base_color)
    return p_diffuse * bsdf.pdf_cosine_hemisphere(wi, wo) + p_specular * bsdf.pdf_ggx_vndf_reflection(wi, wo, alpha)
