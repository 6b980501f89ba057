"""Image/buffer IO.

Replaces the reference's raw ``.btc`` float4 dumps + offline converters
(include/viewer.hpp:695-713, save.py): buffers save directly as .npy
(lossless float) and .png (gamma).  A ``.btc``-compatible reader/writer is
provided for interop with reference dumps.
"""

from __future__ import annotations

import numpy as np

from .tonemap import gamma, to_uint8


def save_npy(path: str, img: np.ndarray) -> None:
    np.save(path, np.asarray(img, np.float32))


def save_png(path: str, img: np.ndarray, apply_gamma: bool = True, flip: bool = True) -> None:
    """Write (H, W, 3|1) float image. ``flip`` converts the renderer's
    bottom-up row order (OpenGL convention, see engine.camera) to PNG's
    top-down — the same vertical flip save.py:10 performs."""
    from PIL import Image

    img = np.asarray(img, np.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = np.repeat(img, 3, axis=-1)
    if flip:
        img = img[::-1]
    out = to_uint8(gamma(img) if apply_gamma else np.clip(img, 0, 1))
    Image.fromarray(out[..., :3]).save(path)


def save_btc(path: str, img: np.ndarray) -> None:
    """Raw float4 dump, reference layout (viewer.hpp:710: fwrite of
    W*H float4, row-major from buffer order)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    out = np.ones((h, w, 4), np.float32)
    out[..., : img.shape[-1]] = img.reshape(h, w, -1)
    out.tofile(path)


def load_btc(path: str, width: int) -> np.ndarray:
    """Read a reference .btc dump -> (H, width, 4) float32 (save.py:6-9)."""
    raw = np.fromfile(path, dtype=np.float32)
    return raw.reshape(-1, width, 4)
