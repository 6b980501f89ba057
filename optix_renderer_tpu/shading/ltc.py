"""LTC analytic area-light integration.

Vectorized re-design of ``cuda_include/ltc/ltc_utils.cuh``: the per-pixel
loop over lights (deviceCode.cu:50-53) becomes a (rays x lights) batch —
the whole polygon pipeline (translate, transform, clip, edge-integrate)
runs as fused VPU arithmetic with no control flow (the clip is the gather
table in ``polygon_clip``).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from ..core import math as cm
from .ltc_tables import LTC_ISO_1, LTC_ISO_2, LTC_ISO_3
from .polygon_clip import clip_polygon

# numpy module constants (not jnp) — see engine.renderer on hoisting
_LTC1 = LTC_ISO_1
_LTC2 = LTC_ISO_2
_LTC3 = LTC_ISO_3
# all three 8x8 RGBA LUTs flattened into one (64, 12) matrix: the bilinear
# corner fetch becomes a one-hot MXU matmul (per-lane gathers lower to
# scalar loops on TPU — ~57 ms per 1M lanes, vs ~free on the MXU)
_LTC_PACKED = np.concatenate(
    [np.asarray(LTC_ISO_1).reshape(64, 4),
     np.asarray(LTC_ISO_2).reshape(64, 4),
     np.asarray(LTC_ISO_3).reshape(64, 4)],
    axis=1,
).astype(np.float32)


def _rows64(idx: jnp.ndarray) -> jnp.ndarray:
    """Fetch packed LUT rows (..., 12) by flat texel index via one-hot."""
    onehot = (idx[..., None] == jnp.arange(64, dtype=jnp.int32)).astype(jnp.float32)
    flat = jax.lax.dot_general(
        onehot.reshape(-1, 64), jnp.asarray(_LTC_PACKED),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return flat.reshape(idx.shape + (12,))


def _bilinear_8x8_packed(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """CUDA tex2D LINEAR+CLAMP over the three packed LUTs at once
    (viewer.hpp:322-327 semantics; texel centers at (i + 0.5) / 8).
    Returns (..., 12) = rows of LTC1|LTC2|LTC3."""
    fx = x * 8.0 - 0.5
    fy = y * 8.0 - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    xi0 = jnp.clip(x0.astype(jnp.int32), 0, 7)
    xi1 = jnp.clip(x0.astype(jnp.int32) + 1, 0, 7)
    yi0 = jnp.clip(y0.astype(jnp.int32), 0, 7)
    yi1 = jnp.clip(y0.astype(jnp.int32) + 1, 0, 7)
    t00 = _rows64(yi0 * 8 + xi0)
    t01 = _rows64(yi0 * 8 + xi1)
    t10 = _rows64(yi1 * 8 + xi0)
    t11 = _rows64(yi1 * 8 + xi1)
    return (t00 * (1 - tx) + t01 * tx) * (1 - ty) + (t10 * (1 - tx) + t11 * tx) * ty


def fetch_ltc_mat(alpha: jnp.ndarray, theta: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(ltc_mat (..., 3, 3) row-major, amplitude (...,)) — ltc_utils.cuh:10-23."""
    x = theta * jnp.float32(0.99 / (0.5 * cm.PI))
    rows = _bilinear_8x8_packed(x, alpha)
    mat = jnp.stack([rows[..., 0:3], rows[..., 4:7], rows[..., 8:11]], axis=-2)
    return mat, rows[..., 11]


def integrate_edge_vec(v1: jnp.ndarray, v2: jnp.ndarray) -> jnp.ndarray:
    """Cubic-fit arc integral (ltc_utils.cuh:26-44); batched (..., 3)."""
    x = cm.dot(v1, v2)
    y = jnp.abs(x)
    a = 0.8543985 + (0.4965155 + 0.0145206 * y) * y
    b = 3.4175940 + (4.1616724 + y) * y
    v = a / b
    neg = 0.5 / jnp.sqrt(jnp.maximum(1.0 - x * x, 1e-7)) - v
    theta_sintheta = jnp.where(x > 0.0, v, neg)
    return jnp.cross(v1, v2) * theta_sintheta[..., None]


def _masked_polygon_integral(verts: jnp.ndarray, vc: jnp.ndarray) -> jnp.ndarray:
    """|sum of edge integrals| over the first vc vertices with wraparound
    (the vc-switch bodies in ltc_utils.cuh:80-123, unrolled + masked)."""
    total = jnp.zeros(verts.shape[:-2], verts.dtype)
    for j in range(5):
        vj = verts[..., j, :]
        # next vertex is static slot j+1, except the closing edge back to
        # slot 0 — a select between two static slices, never a gather
        wrap = (j == vc - 1)[..., None]
        vn = jnp.where(wrap, verts[..., 0, :], verts[..., min(j + 1, 4), :])
        contrib = integrate_edge_vec(vj, vn)[..., 2]
        total = total + jnp.where(j < vc, contrib, 0.0)
    return jnp.abs(total)


def integrate_over_polygon(
    p: jnp.ndarray,  # (R, 3) shading points
    diffuse: jnp.ndarray,  # (R, 3)
    to_local: jnp.ndarray,  # (R, 3, 3)
    iso_frame: jnp.ndarray,  # (R, 3, 3)
    ltc_mat_inv: jnp.ndarray,  # (R, 3, 3)
    amplitude: jnp.ndarray,  # (R,)
    light_v1: jnp.ndarray,  # (L, 3)
    light_v2: jnp.ndarray,
    light_v3: jnp.ndarray,
    light_normal: jnp.ndarray,  # (L, 3)
    light_emit: jnp.ndarray,  # (L, 3)
) -> jnp.ndarray:
    """Summed LTC radiance over all lights (ltc_utils.cuh:47-127), (R, 3)."""
    # translate to origin + normalize: (R, L, 3)
    lv1 = cm.normalize(light_v1[None] - p[:, None], eps=1e-30)
    lv2 = cm.normalize(light_v2[None] - p[:, None], eps=1e-30)
    lv3 = cm.normalize(light_v3[None] - p[:, None], eps=1e-30)

    cg = cm.normalize(lv1 + lv2 + lv3, eps=1e-30)
    facing = cm.dot(-cg, light_normal[None]) >= 0.0  # backface cull :62-64

    def xform(m, v):  # m: (R,3,3), v: (R,L,3) — explicit madds, not einsum
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        out = jnp.stack(
            [
                m[:, None, i, 0] * x + m[:, None, i, 1] * y + m[:, None, i, 2] * z
                for i in range(3)
            ],
            axis=-1,
        )
        return cm.normalize(out, eps=1e-30)

    lv1 = xform(iso_frame, xform(to_local, lv1))
    lv2 = xform(iso_frame, xform(to_local, lv2))
    lv3 = xform(iso_frame, xform(to_local, lv3))

    # first clip: the cosine (diffuse) polygon
    diff_poly = jnp.stack([lv1, lv2, lv3, lv1, lv1], axis=-2)  # (R, L, 5, 3)
    diff_clipped, dvc = clip_polygon(diff_poly, jnp.full(diff_poly.shape[:-2], 3, jnp.int32))
    diffuse_shading = _masked_polygon_integral(diff_clipped, dvc)

    # second clip: LTC-transformed *original* triangle, but with the first
    # clip's vertex count — exactly the reference's (quirky) sequence
    # ltc_utils.cuh:94-101.
    t1 = xform(ltc_mat_inv, lv1)
    t2 = xform(ltc_mat_inv, lv2)
    t3 = xform(ltc_mat_inv, lv3)
    ltc_poly = jnp.stack([t1, t2, t3, t1, t1], axis=-2)
    ltc_clipped, lvc = clip_polygon(ltc_poly, dvc)
    ggx_shading = _masked_polygon_integral(ltc_clipped, lvc)

    color = (
        diffuse[:, None, :] * light_emit[None] * diffuse_shading[..., None]
        + amplitude[:, None, None] * light_emit[None] * ggx_shading[..., None]
    )
    color = jnp.where(facing[..., None], color, 0.0)
    return jnp.sum(color, axis=1)


def iso_frame_from_wo_local(wo_local: jnp.ndarray) -> jnp.ndarray:
    """Isotropic frame aligning wo into the xz-plane (deviceCode.cu:42-48).

    Rows: [normalize(wo.xy, 0), normalize(cross(z, row0)), z].  Degenerate
    head-on view (wo.xy ~ 0) falls back to the x axis (the reference would
    produce NaN there; this keeps the limit value).
    """
    xy = wo_local[..., :2]
    n2 = jnp.sum(xy * xy, axis=-1, keepdims=True)
    safe = n2 > 1e-24
    r0xy = jnp.where(safe, xy / jnp.sqrt(jnp.where(safe, n2, 1.0)), jnp.asarray([1.0, 0.0]))
    row0 = jnp.concatenate([r0xy, jnp.zeros_like(r0xy[..., :1])], axis=-1)
    row2 = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], wo_local.dtype), row0.shape)
    row1 = cm.normalize(jnp.cross(row2, row0), eps=1e-30)
    return jnp.stack([row0, row1, row2], axis=-2)
