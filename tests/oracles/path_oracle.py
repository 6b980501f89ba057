"""Independent numpy (float64) oracle for direct lighting with the
framework's material model: NEE + BSDF sampling with balance-heuristic MIS.

Transcribed separately from the jnp implementation (different code,
numpy RNG, float64) so estimator bugs on either side show up as a bias
mismatch in statistical tests."""

import numpy as np

PI = np.pi
EPS = 1e-5


# ---- material model (material.cuh semantics, float64, vectorized) -------
def fr_schlick(cos_t, f0):
    a = np.maximum(0.0, 1.0 - cos_t)
    return f0 + (1.0 - f0) * (a**5)[..., None]


def d_ggx(wh, alpha):
    a2 = alpha * alpha
    a = 1.0 + wh[..., 2] ** 2 * (a2 - 1.0)
    return a2 / (PI * a * a)


def lam(w, alpha):
    c2 = np.clip(w[..., 2] ** 2, 1e-12, None)
    t2 = (1.0 - c2) / c2
    return (-1.0 + np.sqrt(alpha * alpha * t2 + 1.0)) / 2.0


def g2(wi, wo, alpha):
    return 1.0 / (1.0 + lam(wi, alpha) + lam(wo, alpha))


def g1(w, alpha):
    return 1.0 / (1.0 + lam(w, alpha))


def evaluate(wi, wo, base, alpha):
    same = wi[..., 2] * wo[..., 2] > 0
    diff = np.where(same[..., None], base / PI, 0.0)
    a2 = alpha * alpha  # evaluate() squares roughness (material.cuh:12)
    wh = wi + wo
    n = np.linalg.norm(wh, axis=-1, keepdims=True)
    wh = wh / np.where(n > 0, n, 1)
    f = fr_schlick(np.abs((wi * wh).sum(-1)), base)
    spec = (
        f
        * (g2(wi, wo, a2) * d_ggx(wh, a2))[..., None]
        / (4.0 * np.abs(wi[..., 2:3]) * np.abs(wo[..., 2:3]) + 1e-30)
    )
    spec = np.where((same & (n[..., 0] > 0))[..., None], spec, 0.0)
    return 0.5 * diff + 0.5 * spec


def pdf_cosine(wi, wo):
    same = wi[..., 2] * wo[..., 2] > 0
    return np.where(same, wi[..., 2] / PI, 0.0)


def pdf_vndf(wi, wo, alpha):
    wh = wi + wo
    n = np.linalg.norm(wh, axis=-1, keepdims=True)
    wh = wh / np.where(n > 0, n, 1)
    p_h = g1(wo, alpha) * d_ggx(wh, alpha) * np.abs((wh * wo).sum(-1)) / np.abs(wo[..., 2])
    dwi = (wi * wh).sum(-1)
    p = p_h / np.where(dwi == 0, 1e-30, 4 * dwi)
    return np.where(wi[..., 2] * wo[..., 2] > 0, p, 0.0)


def lobe_probs(base):
    pd = base.max(-1) * 0.5
    ps = base.max(-1)
    norm = pd + ps
    return pd / norm, ps / norm


def material_pdf(wi, wo, base, alpha):
    pd, ps = lobe_probs(base)
    return pd * pdf_cosine(wi, wo) + ps * pdf_vndf(wi, wo, alpha)


def sample_vndf(wo, alpha, u1, u2, rng_unused=None):
    wo_h = np.stack([alpha * wo[..., 0], alpha * wo[..., 1], wo[..., 2]], -1)
    wo_h /= np.linalg.norm(wo_h, axis=-1, keepdims=True)
    l2 = wo_h[..., 0] ** 2 + wo_h[..., 1] ** 2
    inv = 1.0 / np.sqrt(np.where(l2 > 0, l2, 1))
    b1 = np.where(
        (l2 > 0)[..., None],
        np.stack([-wo_h[..., 1] * inv, wo_h[..., 0] * inv, np.zeros_like(inv)], -1),
        np.array([1.0, 0, 0]),
    )
    b2 = np.cross(wo_h, b1)
    r = np.sqrt(u1)
    phi = 2 * PI * u2
    t1 = r * np.cos(phi)
    t2 = r * np.sin(phi)
    s = 0.5 * (1 + wo_h[..., 2])
    t2 = (1 - s) * np.sqrt(np.maximum(0, 1 - t1 * t1)) + s * t2
    wh_h = (
        t1[..., None] * b1
        + t2[..., None] * b2
        + np.sqrt(np.maximum(0, 1 - t1 * t1 - t2 * t2))[..., None] * wo_h
    )
    wh = np.stack([alpha * wh_h[..., 0], alpha * wh_h[..., 1], np.maximum(0, wh_h[..., 2])], -1)
    return wh / np.linalg.norm(wh, axis=-1, keepdims=True)


def sample_material(wo, base, alpha, rng):
    n = len(wo)
    pd, ps = lobe_probs(base)
    u1 = rng.random(n)
    u2 = rng.random(n)
    pick_d = u1 < pd
    # diffuse
    u1d = np.clip((u1 - 0) * (1 - EPS) / np.maximum(pd - EPS, 1e-9), 0, 1 - EPS)
    ct = np.sqrt(np.maximum(0, 1 - u1d))
    st = np.sqrt(u1d)
    phi = 2 * PI * u2
    wi_d = np.stack([st * np.cos(phi), st * np.sin(phi), ct], -1)
    # specular
    u1s = np.clip((u1 - pd) * (1 - EPS) / np.maximum(ps - EPS, 1e-9), 0, 1 - EPS)
    wh = sample_vndf(wo, alpha, u1s, u2)
    wi_s = 2 * (wh * wo).sum(-1, keepdims=True) * wh - wo
    ok_s = ((wo * wh).sum(-1) >= 0) & (wi_s[..., 2] * wo[..., 2] > 0)
    wi = np.where(pick_d[..., None], wi_d, wi_s)
    valid = pick_d | ok_s
    pdf = material_pdf(wi, wo, base, alpha)
    return wi, pdf, valid


# ---- geometry helpers ----------------------------------------------------
def ray_tri_hits(o, d, tris, t_min=0.0):
    """Vectorized Moller-Trumbore: o,d (N,3), tris (T,3,3) -> t (N,T)."""
    v0 = tris[:, 0][None]
    e1 = (tris[:, 1] - tris[:, 0])[None]
    e2 = (tris[:, 2] - tris[:, 0])[None]
    d = d[:, None]
    o = o[:, None]
    pvec = np.cross(d, e2)
    det = (e1 * pvec).sum(-1)
    inv = 1.0 / np.where(np.abs(det) < 1e-12, 1, det)
    tvec = o - v0
    u = (tvec * pvec).sum(-1) * inv
    qvec = np.cross(tvec, e1)
    v = (d * qvec).sum(-1) * inv
    t = (e2 * qvec).sum(-1) * inv
    ok = (np.abs(det) >= 1e-12) & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > t_min)
    return np.where(ok, t, np.inf)


def onb(n):
    if n[2] < -0.999999:
        c1 = np.array([0.0, -1, 0])
        c2 = np.array([-1.0, 0, 0])
    else:
        a = 1.0 / (1.0 + n[2])
        b = -n[0] * n[1] * a
        c1 = np.array([1 - n[0] ** 2 * a, b, -n[0]])
        c1 /= np.linalg.norm(c1)
        c2 = np.array([b, 1 - n[1] ** 2 * a, -n[1]])
        c2 /= np.linalg.norm(c2)
    return np.stack([c1, c2, n])


def direct_lighting_mc(p, n, base, alpha, cam_pos, tris, tri_is_light, tri_emit, lights, n_samples, seed=0, ray_eps=1e-3):
    """MIS (NEE + BSDF) direct-light estimate at one shading point.

    lights: dict of arrays v1, v2, v3, normal, emit, area. Returns (mean
    rgb, stderr rgb)."""
    rng = np.random.default_rng(seed)
    M = onb(n)
    wo_world = cam_pos - p
    wo_world = wo_world / np.linalg.norm(wo_world)
    wo = M @ wo_world
    wo = np.tile(wo, (n_samples, 1))
    base_v = np.tile(base, (n_samples, 1))
    L = len(lights["area"])

    total = np.zeros((n_samples, 3))

    # --- NEE half (visibility-query semantics: the framework shadow-traces
    # toward the *sampled* point and credits the *sampled* light's emission
    # and normal — integrators/path.py) ---
    li = np.minimum((rng.random(n_samples) * L).astype(int), L - 1)
    u1 = rng.random(n_samples)
    u2 = rng.random(n_samples)
    su = np.sqrt(u1)[:, None]
    pt = (1 - su) * lights["v1"][li] + su * ((1 - u2[:, None]) * lights["v2"][li] + u2[:, None] * lights["v3"][li])
    origin = p + n * ray_eps
    to_l = pt - origin
    dist2 = (to_l**2).sum(-1)
    dist = np.sqrt(dist2)
    ldir = to_l / dist[:, None]
    # visibility: nothing closer than the sampled point
    t_all = ray_tri_hits(np.tile(origin, (n_samples, 1)), ldir, tris)
    vis = t_all.min(-1) >= dist * (1 - 1e-3)
    lpdf_a = 1.0 / (lights["area"][li] * L)
    cos_l = np.abs((-ldir * lights["normal"][li]).sum(-1))
    lpdf_w = np.where(cos_l < 1e-8, 0, lpdf_a * dist2 / np.where(cos_l < 1e-8, 1, cos_l))
    wi = (M[None] @ ldir[..., None])[..., 0]
    f = evaluate(wi, wo, base_v, alpha)
    bp = material_pdf(wi, wo, base_v, alpha)
    mis = lpdf_w / (lpdf_w + bp)
    w = np.maximum((n * ldir).sum(-1), EPS) / np.where(lpdf_w == 0, 1, lpdf_w)
    nee = mis[:, None] * lights["emit"][li] * f * w[:, None]
    total += np.where((vis & (lpdf_w > 0))[:, None], np.maximum(nee, 0), 0)

    # --- BSDF half ---
    wi, bpdf, valid = sample_material(wo, base_v, alpha, rng)
    cos_i = wi[..., 2]
    ok = valid & (bpdf > 0) & (cos_i > 0)
    dir_w = (M.T[None] @ wi[..., None])[..., 0]
    t_all = ray_tri_hits(np.tile(p + n * ray_eps, (n_samples, 1)), dir_w, tris)
    closest = t_all.argmin(-1)
    t_hit = t_all.min(-1)
    hit = np.isfinite(t_hit)
    is_l = hit & tri_is_light[closest]
    # area of hit tri
    e1 = tris[closest, 1] - tris[closest, 0]
    e2c = tris[closest, 2] - tris[closest, 1]
    area = 0.5 * np.linalg.norm(np.cross(tris[closest, 0] - tris[closest, 1], tris[closest, 2] - tris[closest, 1]), axis=-1)
    del e1, e2c
    d2 = t_hit**2
    lpdf_a = 1.0 / (np.maximum(area, 1e-20) * L)
    # cosine at the LIGHT surface (face normal of the hit triangle),
    # matching the NEE arm's area->solid-angle conversion
    fn = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    fn /= np.linalg.norm(fn, axis=-1, keepdims=True)
    safe_closest = np.where(hit, closest, 0)
    cos_t = np.abs((-dir_w * fn[safe_closest]).sum(-1))
    cos_t = np.where(hit, cos_t, 0.0)
    lpdf_w = np.where(cos_t < 1e-8, 0, lpdf_a * d2 / np.where(cos_t < 1e-8, 1, cos_t))
    mis = bpdf / (bpdf + lpdf_w)
    f = evaluate(wi, wo, base_v, alpha)
    term = mis[:, None] * tri_emit[closest] * f * (cos_i / np.where(bpdf == 0, 1, bpdf))[:, None]
    total += np.where((ok & is_l)[:, None], np.maximum(term, 0), 0)

    mean = total.mean(0)
    stderr = total.std(0) / np.sqrt(n_samples)
    return mean, stderr
