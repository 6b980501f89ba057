"""G-buffer visualization modes (primary-hit only).

The seven non-sampling arms of the reference's raygen mode switch
(cuda_src/deviceCode.cu:96-109) as one vectorized select.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.types import SurfaceInteraction
from ..engine.modes import RendererType


def gbuffer_color(mode: RendererType, si: SurfaceInteraction, miss_color: jnp.ndarray) -> jnp.ndarray:
    """Color for one g-buffer mode; (N, 3). ``mode`` is static."""
    n = si.p.shape[0]
    if mode == RendererType.MASK:
        color = jnp.ones((n, 3), jnp.float32)
    elif mode == RendererType.POSITION:
        color = si.p
    elif mode == RendererType.DIFFUSE:
        color = si.diffuse
    elif mode == RendererType.ALPHA:
        color = jnp.broadcast_to(si.alpha[:, None], (n, 3))
    elif mode == RendererType.NORMALS:
        color = si.n_geom
    elif mode == RendererType.SHADE_NORMALS:
        # reference never fills n_shad (stays 0, SURVEY §2.2); we use the
        # interpolated normal (== shading normal absent normal maps)
        color = si.n_geom
    elif mode == RendererType.MATERIAL_ID:
        color = jnp.broadcast_to(si.material_id.astype(jnp.float32)[:, None], (n, 3))
    else:
        raise ValueError(f"not a g-buffer mode: {mode}")
    # miss lanes: background color (reference commits black, deviceCode.cu:91-95;
    # we honor the configurable miss color — SURVEY §2.9 quirk 9, default black)
    return jnp.where(si.hit[:, None], color, miss_color[None, :])
