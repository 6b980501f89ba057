"""Multi-bounce path tracer with full MIS (BASELINE config 2).

Implements the *intended* estimator of ``cuda_include/path/path.cuh`` —
next-event estimation + BSDF sampling combined with the balance heuristic
(the committed kernel is short-circuited to a debug output and its NEE half
is commented out; SURVEY §2.9 quirks 1/4/5/7/8 are fixed, and the frame
convention follows deviceCode.cu:82 rather than path.cuh:162's swapped
matrices).

TPU design: the bounce loop is a ``lax.fori_loop`` over a static depth
with an ``alive`` mask — every lane performs the NEE shadow trace and the
BSDF bounce trace each iteration (masked), keeping shapes static.  Ray
compaction/sorting is a later perf layer; the estimator is already fully
vectorized.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import math as cm
from ..core import rng as rnglib
from ..core.types import Ray, SurfaceInteraction
from ..scene.device import DeviceScene
from ..shading import material
from ..shading.bsdf import EPS, cos_theta


def pdf_area_to_solid_angle(pdf, dist2, cos_t):
    """pdfA2W (path.cuh:24-33)."""
    abs_cos = jnp.abs(cos_t)
    return jnp.where(abs_cos < 1e-8, 0.0, pdf * dist2 / jnp.where(abs_cos < 1e-8, 1.0, abs_cos))


def _clamp_dot(a, b):
    """clampDot(a, b, zero=false) = max(dot, EPS) (frostbite.cuh:13-16)."""
    return jnp.maximum(cm.dot(a, b), EPS)


def path_color(
    ds: DeviceScene,
    bvh,
    rays: Ray,
    si: SurfaceInteraction,
    rng_state: jnp.ndarray,
    max_depth: int = 10,
    ray_eps: float = 1e-3,
):
    """Radiance for each primary ray; returns (color (N, 3), rng_state,
    alive_counts (max_depth,) — lanes alive at each bounce, for ray-count
    accounting (each alive lane traces one NEE shadow ray + one bounce ray).

    Outer PATH-mode wrapping (deviceCode.cu:146-153): miss lanes get the
    background, direct light hits get raw emission; everything else is the
    path estimate (floored at EPS per channel, path.cuh:254-256).
    """
    from ..accel.traverse import trace_closest
    from ..engine.shade import build_surface_interaction

    n = rays.origin.shape[0]
    num_lights = ds.num_lights

    # initial state: first-hit surface; V points back toward the camera
    v0 = cm.normalize(rays.origin - si.p, eps=1e-30)
    init = dict(
        alive_counts=jnp.zeros((max_depth,), jnp.int32),
        color=jnp.zeros((n, 3), jnp.float32),
        tp=jnp.ones((n, 3), jnp.float32),
        alive=si.hit & ~si.is_light,
        p=si.p,
        n=si.n_geom,
        diffuse=si.diffuse,
        alpha=si.alpha,
        v=v0,
        rng=rng_state,
    )

    def bounce(d, s):
        alive = s["alive"]
        alive_counts = s["alive_counts"].at[d].set(jnp.sum(alive.astype(jnp.int32)))
        to_local, to_world = cm.orthonormal_basis(s["n"])
        wo_local = cm.normalize(cm.apply_mat(to_local, s["v"]), eps=1e-30)

        rng = s["rng"]
        rng, l_u1, l_u2 = rnglib.lcg_randomf2(rng)  # rand1 (path.cuh:165)
        rng, b_u1, b_u2 = rnglib.lcg_randomf2(rng)  # rand2 (path.cuh:166)
        rng, l_pick = rnglib.lcg_randomf(rng)  # light index (path.cuh:169)

        light_idx = jnp.clip((l_pick * num_lights).astype(jnp.int32), 0, num_lights - 1)

        # ---- NEE / light sampling (path.cuh:176-205, intended) ----------
        light_pdf_a = 1.0 / (ds.light_area[light_idx] * num_lights)  # sampleLightPdf
        lp = cm.sample_point_on_triangle(
            ds.light_v1[light_idx], ds.light_v2[light_idx], ds.light_v3[light_idx], l_u1, l_u2
        )
        to_light = lp - s["p"]
        dist2 = jnp.sum(to_light * to_light, axis=-1)
        ldir = cm.normalize(to_light, eps=1e-30)

        shadow_ray = Ray(origin=s["p"] + s["n"] * ray_eps, direction=ldir)
        shadow_hit = trace_closest(bvh, shadow_ray)
        shadow_si = build_surface_interaction(ds, shadow_ray, shadow_hit)

        light_pdf_w = pdf_area_to_solid_angle(
            light_pdf_a, dist2, cm.dot(-ldir, shadow_si.n_geom)
        )
        wi_local_nee = cm.normalize(cm.apply_mat(to_local, ldir), eps=1e-30)
        brdf_pdf_nee = material.pdf(wi_local_nee, wo_local, s["diffuse"], s["alpha"])
        brdf_nee = material.evaluate(wi_local_nee, wo_local, s["diffuse"], s["alpha"])
        mis_nee = cm.balance_heuristic(1, light_pdf_w, 1, brdf_pdf_nee)
        nee_ok = alive & shadow_si.is_light & (light_pdf_w > 0.0)
        nee = (
            mis_nee[:, None]
            * shadow_si.emit
            * s["tp"]
            * brdf_nee
            * (_clamp_dot(s["n"], ldir) / jnp.where(light_pdf_w == 0.0, 1.0, light_pdf_w))[:, None]
        )
        color = s["color"] + jnp.where(nee_ok[:, None], cm.check_positive(nee), 0.0)

        # ---- BSDF sampling (path.cuh:207-245, intended) ------------------
        wi_local, bsdf_pdf, valid = material.sample_direction(
            wo_local, b_u1, b_u2, s["diffuse"], s["alpha"]
        )
        cos_i = cos_theta(wi_local)
        sample_ok = alive & valid & (bsdf_pdf > 0.0) & (cos_i > 0.0)

        brdf = material.evaluate(wi_local, wo_local, s["diffuse"], s["alpha"])
        dir_world = cm.normalize(cm.apply_mat(to_world, wi_local), eps=1e-30)
        bounce_ray = Ray(origin=s["p"] + s["n"] * ray_eps, direction=dir_world)
        bounce_hit = trace_closest(bvh, bounce_ray)
        bounce_si = build_surface_interaction(ds, bounce_ray, bounce_hit)

        hit_light = sample_ok & bounce_si.hit & bounce_si.is_light
        d2 = jnp.sum((bounce_si.p - s["p"]) ** 2, axis=-1)
        lpdf_a = 1.0 / (jnp.maximum(bounce_si.area, 1e-20) * num_lights)
        lpdf_w = pdf_area_to_solid_angle(lpdf_a, d2, cos_i)
        mis_b = cm.balance_heuristic(1, bsdf_pdf, 1, lpdf_w)
        safe_pdf = jnp.where(bsdf_pdf == 0.0, 1.0, bsdf_pdf)
        emit_term = (
            mis_b[:, None] * bounce_si.emit * s["tp"] * brdf * (cos_i / safe_pdf)[:, None]
        )
        color = color + jnp.where(hit_light[:, None], cm.check_positive(emit_term), 0.0)

        # ---- advance (path.cuh:240, 249-252 with real alpha, quirk #8) ---
        continue_path = sample_ok & bounce_si.hit & ~bounce_si.is_light
        new_tp = s["tp"] * brdf * (cos_i / safe_pdf)[:, None]
        c = continue_path[:, None]
        return dict(
            alive_counts=alive_counts,
            color=color,
            tp=jnp.where(c, new_tp, s["tp"]),
            alive=continue_path,
            p=jnp.where(c, bounce_si.p, s["p"]),
            n=jnp.where(c, bounce_si.n_geom, s["n"]),
            diffuse=jnp.where(c, bounce_si.diffuse, s["diffuse"]),
            alpha=jnp.where(continue_path, bounce_si.alpha, s["alpha"]),
            v=jnp.where(c, -dir_world, s["v"]),
            rng=rng,
        )

    out = jax.lax.fori_loop(0, max_depth, bounce, init)

    # EPS floor on the estimate (path.cuh:254-256), then the outer mode
    # wrapping (deviceCode.cu:146-153)
    estimate = jnp.maximum(out["color"], EPS)
    color = jnp.where(si.is_light[:, None], si.emit, estimate)
    color = jnp.where(si.hit[:, None], color, ds.miss_color[None, :])
    return color, out["rng"], out["alive_counts"]
