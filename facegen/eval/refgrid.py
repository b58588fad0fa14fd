"""Slice published sample-grid images into individual sample tiles.

The reference repo distributes its trained model's outputs as tiled
grid images (README.md:11-23: `images/color_random1024.jpg` is 1024
random generations laid out 32x32 with 32px tiles, `color_best.jpg`
the 64 best by D score at 8x8). Those grids are the only reference
sample population available without retraining the Lua stack, so this
module turns them back into an (N, H, W, C) array the quality-parity
harness (facegen/eval/parity.py) can score against our generator —
a direct cross-framework comparison on the reference's own artifacts.

Tiles are assumed borderless and square; non-square grids (e.g. the
512x64 neighbour strips) slice row-major just the same.
"""

from __future__ import annotations

import numpy as np


def slice_grid(image: np.ndarray, tile: int = 32) -> np.ndarray:
    """(GH*tile, GW*tile, C) grid image -> (GH*GW, tile, tile, C),
    row-major tile order, float32 in [0, 1]."""
    arr = np.asarray(image)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if h % tile or w % tile:
        raise ValueError(f"grid {h}x{w} not divisible by tile {tile}")
    gh, gw = h // tile, w // tile
    tiles = arr.reshape(gh, tile, gw, tile, c).transpose(0, 2, 1, 3, 4)
    tiles = tiles.reshape(gh * gw, tile, tile, c).astype(np.float32)
    if tiles.max() > 1.5:
        tiles /= 255.0
    return tiles


def load_grid(path: str, tile: int = 32, grayscale: bool = False) -> np.ndarray:
    """Load a grid image file and slice it into sample tiles."""
    from PIL import Image

    im = Image.open(path)
    im = im.convert("L" if grayscale else "RGB")
    return slice_grid(np.asarray(im), tile)
