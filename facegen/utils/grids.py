"""Image-grid assembly + PNG output.

Replaces torch `image.toDisplayTensor` grids and the `display` browser
server (sample.lua:228-230, nn_utils.lua:191-200) with pure-array grid
assembly and PNG files — the observability artifacts land on disk
instead of a gfx.js dashboard.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Sequence

import numpy as np


def to_grid(
    images: np.ndarray,
    nrow: Optional[int] = None,
    padding: int = 1,
    pad_value: float = 1.0,
) -> np.ndarray:
    """(N, H, W, C) floats in [0,1] -> one (GH, GW, C) grid array."""
    images = np.asarray(images, np.float32)
    n, h, w, c = images.shape
    nrow = nrow or int(math.ceil(math.sqrt(n)))
    ncol = int(math.ceil(n / nrow))
    gh = ncol * (h + padding) + padding
    gw = nrow * (w + padding) + padding
    grid = np.full((gh, gw, c), pad_value, np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = images[i]
    return grid


def save_png(path: str, image: np.ndarray) -> str:
    """Write a [0,1] float (H, W, C) array as PNG (C in {1, 3})."""
    from PIL import Image

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arr = np.clip(np.asarray(image, np.float32) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray(arr).save(path)
    return path


def save_grid(path: str, images, nrow: Optional[int] = None) -> str:
    return save_png(path, to_grid(np.asarray(images), nrow=nrow))


def gaussian_blur(images, sigma: float = 0.25 * 3, kernel: int = 3):
    """3x3 gaussian blur — sample.lua:219-222's `blur()` helper
    (image.convolve with image.gaussian(3), 'same' padding). Accepts
    (H, W, C) or (N, H, W, C) floats."""
    import jax
    import jax.numpy as jnp

    single = np.ndim(images) == 3
    x = jnp.asarray(images, jnp.float32)
    if single:
        x = x[None]
    # torch image.gaussian(3): normalized gaussian, sigma = 0.25 * size
    half = (kernel - 1) / 2.0
    coords = jnp.arange(kernel, dtype=jnp.float32) - half
    g1 = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    k2 = jnp.outer(g1, g1)
    k2 = k2 / k2.max()  # torch default normalizes peak to 1...
    k2 = k2 / k2.sum()  # ...then convolve normalizes by nothing; we keep
    #                     unit-sum so brightness is preserved
    c = x.shape[-1]
    kern = jnp.zeros((kernel, kernel, c, c), jnp.float32)
    for i in range(c):
        kern = kern.at[:, :, i, i].set(k2)
    pad = (kernel - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, kern, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return np.asarray(y[0] if single else y)
