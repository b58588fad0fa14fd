"""Coarse/fine/diff triples for the refinement GAN.

Rebuild of dataset_c2f.lua:49-109 (_toResult): for each fine image,
coarse = bilinear downscale to coarseSize then upscale back to fineSize
(dataset_c2f.lua:52-56), diff = fine - coarse (:58-61). Built on device
in one jit; the pool stores fine+coarse as uint8 (the signed diff is
reconstructed exactly as fine - coarse at batch time, avoiding a float
pool in HBM).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class C2FPool(NamedTuple):
    fine: jax.Array    # (N, H, W, C) uint8
    coarse: jax.Array  # (N, H, W, C) uint8

    @property
    def size(self) -> int:
        return self.fine.shape[0]


@partial(jax.jit, static_argnames=("coarse_size",))
def make_triples(fine_u8: jax.Array, coarse_size: int) -> C2FPool:
    """(N, fine, fine, C) uint8 -> C2FPool with blurred-coarse channel."""
    n, h, w, c = fine_u8.shape
    x = fine_u8.astype(jnp.float32) / 255.0
    down = jax.image.resize(x, (n, coarse_size, coarse_size, c), "linear")
    up = jax.image.resize(down, (n, h, w, c), "linear")
    coarse_u8 = jnp.clip(up * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
    return C2FPool(fine=fine_u8, coarse=coarse_u8)


def gather_triple(pool: C2FPool, idx: jax.Array, dtype=jnp.float32):
    """Batch gather -> (fine, coarse, diff) floats in [0,1]/[-1,1]."""
    fine = pool.fine[idx].astype(dtype) / jnp.asarray(255.0, dtype)
    coarse = pool.coarse[idx].astype(dtype) / jnp.asarray(255.0, dtype)
    return fine, coarse, fine - coarse
