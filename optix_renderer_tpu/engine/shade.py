"""Hit shading stage: Hit -> SurfaceInteraction via vectorized gathers.

The TPU equivalent of the reference's closest-hit + miss programs
(cuda_include/hit_miss.cuh:14-63): after traversal returns (tri_id, bary),
gather mesh attributes from the flat DeviceScene pool and interpolate.
Runs as plain fused VPU work for the whole ray batch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import math as cm
from ..core.types import Hit, Ray, SurfaceInteraction
from ..scene.device import DeviceScene
from ..scene.textures import sample_bilinear


def build_surface_interaction(
    ds: DeviceScene, rays: Ray, hit: Hit, miss_color: jnp.ndarray | None = None
) -> SurfaceInteraction:
    """Interpolate attributes at hit points (hit_miss.cuh:14-50); fill miss
    lanes like the miss program (hit_miss.cuh:52-63)."""
    if miss_color is None:
        miss_color = ds.miss_color

    valid = hit.tri_id >= 0
    tid = jnp.maximum(hit.tri_id, 0)
    idx = ds.tri_index[tid]  # (N, 3)
    mesh = ds.tri_mesh[tid]  # (N,)

    u = hit.bary_u[:, None]
    v = hit.bary_v[:, None]
    w = 1.0 - u - v

    v1 = ds.vertices[idx[:, 0]]
    v2 = ds.vertices[idx[:, 1]]
    v3 = ds.vertices[idx[:, 2]]
    p = w * v1 + u * v2 + v * v3  # barycentricInterpolate (utils.cuh:9-18)

    area = cm.triangle_area(v1, v2, v3)  # hit_miss.cuh:24-27

    n1 = ds.normals[idx[:, 0]]
    n2 = ds.normals[idx[:, 1]]
    n3 = ds.normals[idx[:, 2]]
    n_geom = cm.normalize(w * n1 + u * n2 + v * n3, eps=1e-30)

    t1 = ds.uvs[idx[:, 0]]
    t2 = ds.uvs[idx[:, 1]]
    t3 = ds.uvs[idx[:, 2]]
    uv = w * t1 + u * t2 + v * t3
    uv = jnp.abs(jnp.fmod(uv, 1.0))  # hit_miss.cuh:34-35

    diffuse = ds.mesh_diffuse[mesh]
    tex_id = ds.mesh_diffuse_tex[mesh]
    has_tex = tex_id >= 0
    tex_rgba = sample_bilinear(ds.textures, tex_id, uv[:, 0], uv[:, 1])
    diffuse = jnp.where(has_tex[:, None], tex_rgba[:, :3], diffuse)  # hit_miss.cuh:40-44

    alpha = jnp.clip(ds.mesh_alpha[mesh], 0.01, 1.0)  # hit_miss.cuh:45-46
    emit = ds.mesh_emit[mesh]
    is_light = ds.mesh_is_light[mesh]
    material_id = ds.mesh_material_id[mesh]

    # miss lanes (hit_miss.cuh:52-63): hit=false, n_geom=0, diffuse=const
    vmask = valid[:, None]
    zero3 = jnp.zeros_like(p)
    return SurfaceInteraction(
        hit=valid,
        p=jnp.where(vmask, p, zero3),
        uv=jnp.where(vmask, uv, 0.0),
        n_geom=jnp.where(vmask, n_geom, zero3),
        diffuse=jnp.where(vmask, diffuse, miss_color[None, :]),
        alpha=jnp.where(valid, alpha, 0.0),
        emit=jnp.where(vmask, emit, zero3),
        is_light=valid & is_light,
        material_id=jnp.where(valid, material_id, 0),
        area=jnp.where(valid, area, 0.0),
    )
