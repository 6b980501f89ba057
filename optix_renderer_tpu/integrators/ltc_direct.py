"""LTC analytic direct lighting (deterministic, BASELINE config 1).

Equivalent of ``ltcDirectLighingBaseline`` (cuda_src/deviceCode.cu:23-56):
per-ray LTC matrix fetch + inverse, isotropic frame, and the analytic
polygon integral summed over every triangle light.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math as cm
from ..core.types import Ray, SurfaceInteraction
from ..scene.device import DeviceScene
from ..shading import ltc


def ltc_direct(ds: DeviceScene, rays: Ray, si: SurfaceInteraction) -> jnp.ndarray:
    """LTC radiance for non-light hit lanes; garbage elsewhere (mask it)."""
    wo = cm.normalize(rays.origin - si.p, eps=1e-30)  # deviceCode.cu:80
    to_local, _ = cm.orthonormal_basis(si.n_geom)
    wo_local = cm.normalize(cm.apply_mat(to_local, wo), eps=1e-30)
    upper = wo_local[..., 2] >= 0.0  # :27-28 (z < 0 -> black)

    theta = cm.spherical_theta(wo_local)  # :36
    ltc_mat, amplitude = ltc.fetch_ltc_mat(si.alpha, theta)  # :38-39
    ltc_mat_inv = cm.matrix_inverse_3x3(ltc_mat)  # :40
    iso = ltc.iso_frame_from_wo_local(wo_local)  # :42-48

    color = ltc.integrate_over_polygon(
        si.p,
        si.diffuse,
        to_local,
        iso,
        ltc_mat_inv,
        amplitude,
        ds.light_v1,
        ds.light_v2,
        ds.light_v3,
        ds.light_normal,
        ds.light_emit,
    )
    return jnp.where(upper[:, None], color, 0.0)


def ltc_baseline_color(ds: DeviceScene, rays: Ray, si: SurfaceInteraction) -> jnp.ndarray:
    """Full LTC_BASELINE mode color (deviceCode.cu:111-116): lights show
    their emission, misses the background, everything else the LTC sum."""
    direct = ltc_direct(ds, rays, si)
    color = jnp.where(si.is_light[:, None], si.emit, direct)
    return jnp.where(si.hit[:, None], color, ds.miss_color[None, :])
