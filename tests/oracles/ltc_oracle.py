"""Scalar numpy oracle for the LTC pipeline.

Independent transcription of the reference device code (clipPolygon's
literal switch with in-place assignments, polygon_utils.cuh:33-120;
integrateOverPolygon, ltc_utils.cuh:47-127; ltcDirectLighingBaseline,
deviceCode.cu:23-56) — shares no code with the framework, used as ground
truth in tests."""

import numpy as np

from optix_renderer_tpu.shading.ltc_tables import LTC_ISO_1, LTC_ISO_2, LTC_ISO_3

PI = np.pi


def normalize(v):
    return v / np.linalg.norm(v)


def iz0(lhs, rhs):
    lerp = lhs[2] / (lhs[2] - rhs[2])
    temp = lerp * rhs[:2] + (-lerp * lhs[:2] + lhs[:2])
    return normalize(np.array([temp[0], temp[1], 0.0]))


def clip_polygon(vertex_count, v):
    """Literal transcription of polygon_utils.cuh:33-120 (in-place on v)."""
    if vertex_count == 0:
        return 0
    bit_mask = vertex_count
    for i in range(4):
        if v[i][2] > 0.0 and (i < 3 or i < vertex_count):
            bit_mask |= 1 << (i + 3)
    if bit_mask == 3:
        vc = 0
    elif bit_mask == 59:
        vc = 3
        v[3] = v[0]
    elif bit_mask == 11:
        vc = 3
        v[1] = iz0(v[0], v[1])
        v[2] = iz0(v[2], v[0])
        v[3] = v[0]
    elif bit_mask == 19:
        vc = 3
        v[0] = iz0(v[0], v[1])
        v[2] = iz0(v[1], v[2])
        v[3] = v[0]
    elif bit_mask == 35:
        vc = 3
        v[0] = iz0(v[2], v[0])
        v[1] = iz0(v[1], v[2])
        v[3] = v[0]
    elif bit_mask == 27:
        vc = 4
        v[3] = iz0(v[2], v[0])
        v[2] = iz0(v[1], v[2])
        v[4] = v[0]
    elif bit_mask == 51:
        vc = 4
        v[3] = iz0(v[2], v[0])
        v[0] = iz0(v[0], v[1])
        v[4] = v[0]
    elif bit_mask == 43:
        vc = 4
        v[3] = v[2]
        v[2] = iz0(v[1], v[2])
        v[1] = iz0(v[0], v[1])
        v[4] = v[0]
    elif bit_mask == 4:
        vc = 0
    elif bit_mask == 124:
        vc = 4
        v[4] = v[0]
    elif bit_mask == 12:
        vc = 3
        v[1] = iz0(v[0], v[1])
        v[2] = iz0(v[3], v[0])
        v[3] = v[0]
    elif bit_mask == 20:
        vc = 3
        v[0] = iz0(v[0], v[1])
        v[2] = iz0(v[1], v[2])
        v[3] = v[0]
    elif bit_mask == 36:
        vc = 3
        v[0] = iz0(v[2], v[3])
        v[1] = iz0(v[1], v[2])
        v[3] = v[0]
    elif bit_mask == 68:
        vc = 3
        v[1] = iz0(v[3], v[0])
        v[0] = v[3]
        v[2] = iz0(v[2], v[3])
    elif bit_mask == 28:
        vc = 4
        v[2] = iz0(v[1], v[2])
        v[3] = iz0(v[3], v[0])
        v[4] = v[0]
    elif bit_mask == 52:
        vc = 4
        v[0] = iz0(v[0], v[1])
        v[3] = iz0(v[2], v[3])
        v[4] = v[0]
    elif bit_mask == 100:
        vc = 4
        v[0] = iz0(v[3], v[0])
        v[1] = iz0(v[1], v[2])
        v[4] = v[0]
    elif bit_mask == 76:
        vc = 4
        v[1] = iz0(v[0], v[1])
        v[2] = iz0(v[2], v[3])
        v[4] = v[0]
    elif bit_mask == 60:
        vc = 5
        v[4] = iz0(v[3], v[0])
        v[3] = iz0(v[2], v[3])
    elif bit_mask == 116:
        vc = 5
        v[4] = iz0(v[3], v[0])
        v[0] = iz0(v[0], v[1])
    elif bit_mask == 108:
        vc = 5
        v[4] = v[0]
        v[0] = iz0(v[0], v[1])
        v[1] = iz0(v[1], v[2])
    elif bit_mask == 92:
        vc = 5
        v[4] = v[3]
        v[3] = iz0(v[2], v[3])
        v[2] = iz0(v[1], v[2])
    else:
        vc = 0
    return vc


def tex2d_8x8(table, x, y):
    """tex2D LINEAR+CLAMP on (8,8,4)."""
    fx = np.clip(x * 8.0 - 0.5, -1, 8)
    fy = np.clip(y * 8.0 - 0.5, -1, 8)
    x0 = int(np.floor(fx))
    y0 = int(np.floor(fy))
    tx = fx - x0
    ty = fy - y0
    xi = lambda i: min(max(i, 0), 7)  # noqa: E731
    t00 = table[xi(y0), xi(x0)]
    t01 = table[xi(y0), xi(x0 + 1)]
    t10 = table[xi(y0 + 1), xi(x0)]
    t11 = table[xi(y0 + 1), xi(x0 + 1)]
    return (t00 * (1 - tx) + t01 * tx) * (1 - ty) + (t10 * (1 - tx) + t11 * tx) * ty


def fetch_ltc_mat(alpha, theta):
    x = theta * 0.99 / (0.5 * PI)
    r1 = tex2d_8x8(LTC_ISO_1, x, alpha)
    r2 = tex2d_8x8(LTC_ISO_2, x, alpha)
    r3 = tex2d_8x8(LTC_ISO_3, x, alpha)
    mat = np.stack([r1[:3], r2[:3], r3[:3]])
    return mat, r3[3]


def integrate_edge(v1, v2):
    x = np.dot(v1, v2)
    y = abs(x)
    a = 0.8543985 + (0.4965155 + 0.0145206 * y) * y
    b = 3.4175940 + (4.1616724 + y) * y
    v = a / b
    ts = v if x > 0.0 else 0.5 / np.sqrt(max(1.0 - x * x, 1e-7)) - v
    return (np.cross(v1, v2) * ts)[2]


def _poly_integral(v, vc):
    if vc < 3:
        return 0.0
    s = 0.0
    for j in range(vc):
        s += integrate_edge(v[j], v[(j + 1) % vc])
    return abs(s)


def integrate_over_polygon(p, diffuse, to_local, iso_frame, ltc_mat_inv, amplitude, lv1, lv2, lv3, lnormal, lemit):
    lv1 = normalize(lv1 - p)
    lv2 = normalize(lv2 - p)
    lv3 = normalize(lv3 - p)
    cg = normalize(lv1 + lv2 + lv3)
    if np.dot(-cg, lnormal) < 0.0:
        return np.zeros(3)
    lv1 = normalize(to_local @ lv1)
    lv2 = normalize(to_local @ lv2)
    lv3 = normalize(to_local @ lv3)
    lv1 = normalize(iso_frame @ lv1)
    lv2 = normalize(iso_frame @ lv2)
    lv3 = normalize(iso_frame @ lv3)

    diff_clipped = [lv1.copy(), lv2.copy(), lv3.copy(), lv1.copy(), lv1.copy()]
    dvc = clip_polygon(3, diff_clipped)
    diffuse_shading = _poly_integral(diff_clipped, dvc) if dvc in (3, 4) else 0.0

    tverts = [
        normalize(ltc_mat_inv @ lv1),
        normalize(ltc_mat_inv @ lv2),
        normalize(ltc_mat_inv @ lv3),
        normalize(ltc_mat_inv @ lv1),
        normalize(ltc_mat_inv @ lv1),
    ]
    lvc = clip_polygon(dvc, tverts)
    ggx_shading = _poly_integral(tverts, lvc) if lvc in (3, 4, 5) else 0.0

    return diffuse * lemit * diffuse_shading + amplitude * lemit * ggx_shading


def orthonormal_basis(n):
    if n[2] < -0.999999:
        c1 = np.array([0.0, -1.0, 0.0])
        c2 = np.array([-1.0, 0.0, 0.0])
    else:
        a = 1.0 / (1.0 + n[2])
        b = -n[0] * n[1] * a
        c1 = normalize(np.array([1.0 - n[0] * n[0] * a, b, -n[0]]))
        c2 = normalize(np.array([b, 1.0 - n[1] * n[1] * a, -n[1]]))
    to_local = np.stack([c1, c2, n])
    return to_local, to_local.T


def ltc_direct_baseline(cam_pos, p, n_geom, diffuse, alpha, lights):
    """deviceCode.cu:23-56 for one shading point. lights: list of dicts."""
    wo = normalize(cam_pos - p)
    to_local, _ = orthonormal_basis(n_geom)
    wo_local = normalize(to_local @ wo)
    if wo_local[2] < 0.0:
        return np.zeros(3)
    theta = np.arccos(np.clip(wo_local[2], -1, 1))
    ltc_mat, amplitude = fetch_ltc_mat(alpha, theta)
    ltc_mat_inv = np.linalg.inv(ltc_mat)
    iso = np.zeros((3, 3))
    iso[0] = normalize(np.array([wo_local[0], wo_local[1], 0.0]))
    iso[2] = np.array([0.0, 0.0, 1.0])
    iso[1] = normalize(np.cross(iso[2], iso[0]))
    color = np.zeros(3)
    for L in lights:
        color += integrate_over_polygon(
            p, diffuse, to_local, iso, ltc_mat_inv, amplitude,
            L["v1"], L["v2"], L["v3"], L["normal"], L["emit"],
        )
    return color
