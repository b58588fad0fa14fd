"""Inference helpers: batched generation, D-scoring, ranking, sanity
probes — the TPU equivalents of utils/nn_utils.lua.

Where the reference loops Lua-side over mini-batches
(nn_utils.lua:45-69, 90-118), we jit one fixed-batch program and fold
the whole request into it; ranking happens with one argsort on device.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facegen.nn.core import Ctx, Module


class GanInference:
    """Eval-mode G/D execution (dropout off, BN running stats —
    nn_utils.lua:207-222 switchToEvaluationMode)."""

    def __init__(self, g: Module, d: Module, noise_dim: int, compute_dtype="bfloat16",
                 mesh=None):
        """`mesh` (optional, axes "data" [x "model"]): data-parallel
        serving — params sharded by the gspmd shape rule, request
        batches split over "data" (facegen/parallel/gspmd.py)."""
        self.g = g
        self.d = d
        self.noise_dim = noise_dim
        self.dtype = jnp.dtype(compute_dtype)
        self.mesh = mesh

        def _gen(params_g, state_g, noise):
            imgs, _ = g.apply(params_g, state_g, noise.astype(self.dtype), Ctx(None, False))
            return imgs.astype(jnp.float32)

        def _score(params_d, state_d, images):
            logits, _ = d.apply(params_d, state_d, images.astype(self.dtype), Ctx(None, False))
            return jax.nn.sigmoid(logits.astype(jnp.float32)).reshape(-1)

        if mesh is not None:
            from facegen.parallel import ensure_mesh2d
            from facegen.parallel.gspmd import gspmd_infer_jit

            self.mesh = mesh = ensure_mesh2d(mesh)
            self._gen = gspmd_infer_jit(_gen, mesh, n_state_args=2)
            self._score = gspmd_infer_jit(_score, mesh, n_state_args=2)
        else:
            self._gen = jax.jit(_gen)
            self._score = jax.jit(_score)

    # nn_utils.lua:35-39 createNoiseInputs: U(-1, 1)
    def noise(self, key: jax.Array, n: int) -> jax.Array:
        return jax.random.uniform(key, (n, self.noise_dim), jnp.float32, -1.0, 1.0)

    # nn_utils.lua:45-78 createImages / createImagesFromNoise
    def generate(self, bundle: dict, noise: jax.Array) -> jax.Array:
        return self._gen(bundle["params_g"], bundle["state_g"], noise)

    def generate_n(self, bundle: dict, key: jax.Array, n: int) -> jax.Array:
        return self.generate(bundle, self.noise(key, n))

    # nn_utils.lua:90-118 sortImagesByPrediction (one argsort, no CPU loop)
    def score(self, bundle: dict, images: jax.Array) -> jax.Array:
        return self._score(bundle["params_d"], bundle["state_d"], images)

    def rank(
        self, bundle: dict, images: jax.Array, ascending: bool = False,
        max_out: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Returns (images sorted by D score, scores). ascending=True
        puts most-fake-looking first (nn_utils.lua:104-108)."""
        scores = self.score(bundle, images)
        order = jnp.argsort(scores if ascending else -scores)
        if max_out is not None:
            order = order[:max_out]
        return images[order], scores[order]


def sanity_image(scale: int, channels: int, key: jax.Array) -> jax.Array:
    """The synthetic diagonal 'non-face' probe D should reject
    (nn_utils.lua:157-169): U(0, 0.5) background, 1.0 main diagonal,
    0.5 at every 4th grid crossing — drawn on the first channel."""
    img = jax.random.uniform(key, (scale, scale, channels), jnp.float32, 0.0, 0.5)
    ii = jnp.arange(scale)
    img = img.at[ii, ii, 0].set(1.0)
    # reference marks (i % 4 == 0 and j % 4 == 0) off-diagonal points at
    # 0.5 with 1-BASED Lua indices — rows/cols 4,8,... = 0-based 3,7,...
    lattice = (
        (ii[:, None] % 4 == 3)
        & (ii[None, :] % 4 == 3)
        & (ii[:, None] != ii[None, :])
    )
    img = img.at[:, :, 0].set(jnp.where(lattice, 0.5, img[:, :, 0]))
    return img


def prepare_nn_dataset(dataset, mesh=None) -> jax.Array:
    """Upload + flatten a dataset once for repeated NN queries.
    uint8 inputs are normalized to [0, 1] floats.

    With `mesh`, rows are sharded over "data" so the search GEMM runs
    data-parallel; a non-divisible row count is padded with sentinel
    rows (value 1e6 — squared distance ~3e15, so they can never enter
    a top-k over real [0,1] images and no index mapping is needed)."""
    arr = np.asarray(dataset)
    flat = arr.reshape(arr.shape[0], -1).astype(np.float32)
    if arr.dtype == np.uint8:
        flat = flat / 255.0
    if mesh is None:
        return jax.device_put(jnp.asarray(flat))
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["data"]
    pad = -flat.shape[0] % dp
    if pad:
        flat = np.concatenate(
            [flat, np.full((pad, flat.shape[1]), 1e6, np.float32)]
        )
    return jax.device_put(jnp.asarray(flat), NamedSharding(mesh, P("data")))


@partial(jax.jit, static_argnames=("k",))
def _nn_search(q: jax.Array, df: jax.Array, k: int):
    """One MXU GEMM over the HBM-resident dataset + on-device top-k."""
    d2 = (
        jnp.sum(q * q, 1, keepdims=True)
        - 2.0 * q @ df.T
        + jnp.sum(df * df, 1)[None, :]
    )
    d2 = jnp.maximum(d2, 0.0)
    neg_top, idx = jax.lax.top_k(-d2, k)
    return idx, jnp.sqrt(-neg_top)


def nearest_neighbours(
    queries: jax.Array, dataset, k: int = 1, mesh=None
) -> Tuple[np.ndarray, np.ndarray]:
    """For each query image, the k nearest dataset images by L2 distance.

    Replaces sample.lua:133-151's O(Q*N) per-pair torch.dist CPU loop
    ("takes long", README.md:59) with one |q|^2 - 2qd + |d|^2 GEMM on
    the MXU plus an on-device top-k; only the final (Q, k) indices and
    distances cross back to the host. ``dataset`` may be a host array
    (uploaded once — prefer `prepare_nn_dataset` for repeated queries)
    or an already-prepared device array. With `mesh`, the dataset rows
    shard over "data" and XLA distributes the GEMM + top-k. Returns
    (indices, distances).
    """
    q = jnp.asarray(queries)
    if q.dtype == jnp.uint8:
        # same [0,1] normalization prepare_nn_dataset applies to the
        # dataset side — mixed scales would silently return garbage
        q = q.astype(jnp.float32) / 255.0
    q = q.reshape(len(queries), -1).astype(jnp.float32)
    if isinstance(dataset, jax.Array) and dataset.ndim == 2:
        df = dataset
    else:
        df = prepare_nn_dataset(dataset, mesh=mesh)
    idx, dist = _nn_search(q, df, k)
    return np.asarray(idx), np.asarray(dist)
