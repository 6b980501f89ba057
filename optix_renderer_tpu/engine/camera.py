"""Pinhole camera: basis construction and primary ray generation.

Matches the reference exactly: basis from look-at + cos_fovy scale
(include/viewer.hpp:634-641) and per-pixel jittered rays
(cuda_src/deviceCode.cu:68-73).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.types import Camera, Ray


def camera_from_lookat(from_, at, up, cos_fovy: float, width: int, height: int) -> Camera:
    """viewer.hpp:634-641: d00 = normalize(at-from); du = cosFovy*aspect*
    normalize(cross(d00, up)); dv = cosFovy*normalize(cross(du, d00));
    d00 -= (du + dv)/2."""
    from_ = np.asarray(from_, np.float32)
    at = np.asarray(at, np.float32)
    up = np.asarray(up, np.float32)
    d00 = at - from_
    d00 = d00 / np.linalg.norm(d00)
    aspect = width / float(height)
    du = np.cross(d00, up)
    du = cos_fovy * aspect * du / np.linalg.norm(du)
    dv = np.cross(du, d00)
    dv = cos_fovy * dv / np.linalg.norm(dv)
    d00 = d00 - 0.5 * du - 0.5 * dv
    return Camera(
        pos=jnp.asarray(from_),
        dir_00=jnp.asarray(d00.astype(np.float32)),
        dir_du=jnp.asarray(du.astype(np.float32)),
        dir_dv=jnp.asarray(dv.astype(np.float32)),
    )


def primary_rays(camera: Camera, width: int, height: int, jitter_u, jitter_v, lin=None) -> Ray:
    """Jittered primary rays (deviceCode.cu:68-73).

    jitter_u/jitter_v: (N,) uniforms in [0,1). Pixel (x, y) maps to lane
    ``x + y * width`` (fbOfs convention, deviceCode.cu:63); row 0 is the
    v=0 edge (bottom, OpenGL convention — flip when writing PNGs).
    ``lin`` (absolute linear pixel ids) defaults to the full frame; tile
    rendering passes its own slice (engine.renderer.render_tile).
    """
    if lin is None:
        lin = jnp.arange(width * height, dtype=jnp.int32)
    lin = lin.astype(jnp.int32)
    px = (lin % width).astype(jnp.float32)
    py = (lin // width).astype(jnp.float32)
    u = (px + jitter_u) / jnp.float32(width)
    v = (py + jitter_v) / jnp.float32(height)
    d = (
        camera.dir_00[None, :]
        + u[:, None] * camera.dir_du[None, :]
        + v[:, None] * camera.dir_dv[None, :]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(camera.pos[None, :], (lin.shape[0], 3))
    return Ray(origin=o, direction=d)
