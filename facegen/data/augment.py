"""On-device batched affine augmentation.

TPU-native replacement for the reference's offline Python augmenter
(dataset/ImageAugmenter.py + generate_dataset.py:43-48). The reference
pre-generates 19 augmented JPEG copies of each LFW face once, offline;
we instead apply the SAME augmentation family on device, fully batched
and jit-compiled, so every epoch sees fresh augmentations and the 20x
dataset blow-up on disk disappears.

Semantics parity with generate_dataset.py / ImageAugmenter.py:

- per image: optional horizontal flip p=0.5 (generate_dataset.py:113-115,
  applied BEFORE the warp, ImageAugmenter.py:570-581);
- brightness multiply by U(1-b, 1+b), clip to [0,255]
  (generate_dataset.py:118-120, 127-129);
- affine warp with the center-relative matrix
  to_center . Affine(scale, rotation, shear, translation) . to_topleft
  (ImageAugmenter.py:185-197), bilinear interpolation, constant-0
  outside (tf.warp mode="constant", generate_dataset.py:131);
- default parameter ranges (generate_dataset.py:43-48): equal-axis scale
  U(0.82, 1.10), rotation +-8 deg, shear 0, translation +-5 px,
  brightness +-10%, noise off.

Deviation (documented): the reference draws rotation/translation as
integers (ImageAugmenter.py:165-169 random.randint); we draw continuous
uniforms — a strict superset of the reference's augmentation family.

The affine math uses skimage's convention: coordinates are (x, y) =
(col, row); the forward matrix A = [[sx*cos r, -sy*sin(r+shear), tx],
[sx*sin r, sy*cos(r+shear), ty], [0,0,1]]. Warping samples the INPUT at
the inverse-mapped location of each output pixel.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Defaults = generate_dataset.py:43-48 (the values the reference
    actually trains with). The full ImageAugmenter library surface is
    also covered: per-axis independent scaling
    (scale_axis_equally=False, ImageAugmenter.py:162-167), separate
    x/y translation ranges (translation_x_px/translation_y_px,
    ImageAugmenter.py:68-90) and additive gaussian noise
    (generate_dataset.py:122-125: img += 255*N(mean, std) before the
    clip — in [0,1] units that is += N(mean, std))."""

    hflip: bool = True
    vflip: bool = False  # supported by augment() but off at every call site
    scale_min: float = 0.82
    scale_max: float = 1.10
    scale_axis_equally: bool = True  # generate_dataset.py:45 call-site value
    rotation_deg: float = 8.0
    shear_deg: float = 0.0
    translation_px: float = 5.0       # x-axis range (translation_x_px)
    translation_y: float = -1.0       # y-axis range; <0 = same as x
    brightness: float = 0.10
    noise_mean: float = 0.0
    noise_std: float = 0.0            # generate_dataset.py:48 trains with 0


def sample_affine_params(key: jax.Array, n: int, cfg: AugmentConfig) -> dict:
    """Draw per-image augmentation parameters (one key -> n images)."""
    ks = jax.random.split(key, 8)
    deg = jnp.pi / 180.0
    scale_x = jax.random.uniform(ks[1], (n,), minval=cfg.scale_min,
                                 maxval=cfg.scale_max)
    if cfg.scale_axis_equally:
        scale_y = scale_x  # ImageAugmenter.py:163-164
    else:
        scale_y = jax.random.uniform(ks[7], (n,), minval=cfg.scale_min,
                                     maxval=cfg.scale_max)
    ty_range = cfg.translation_y if cfg.translation_y >= 0 else cfg.translation_px
    tx = jax.random.uniform(ks[4], (n,), minval=-cfg.translation_px,
                            maxval=cfg.translation_px)
    ty = jax.random.uniform(jax.random.fold_in(ks[4], 1), (n,),
                            minval=-ty_range, maxval=ty_range)
    return {
        "flip": jax.random.bernoulli(ks[0], 0.5, (n,)) & jnp.bool_(cfg.hflip),
        "vflip": jax.random.bernoulli(ks[6], 0.5, (n,)) & jnp.bool_(cfg.vflip),
        "scale": scale_x,
        "scale_y": scale_y,
        "rot": jax.random.uniform(ks[2], (n,), minval=-cfg.rotation_deg, maxval=cfg.rotation_deg) * deg,
        "shear": jax.random.uniform(ks[3], (n,), minval=-cfg.shear_deg, maxval=cfg.shear_deg) * deg,
        "trans": jnp.stack([tx, ty], axis=-1),
        "bright": jax.random.uniform(ks[5], (n,), minval=1.0 - cfg.brightness, maxval=1.0 + cfg.brightness),
    }


def inverse_affine_matrices(params: dict, height: int, width: int) -> jax.Array:
    """(N, 2, 3) matrices mapping OUTPUT (x, y, 1) -> INPUT (x, y).

    Composition mirrors ImageAugmenter.py:185-197: shift the center
    int(w/2), int(h/2) to the origin, apply the affine, shift back; the
    whole thing inverted for sampling.
    """
    sx = params["scale"]
    sy = params.get("scale_y", params["scale"])
    r = params["rot"]
    sh = params["shear"]
    tx = params["trans"][:, 0]
    ty = params["trans"][:, 1]
    # forward 2x2 block (skimage AffineTransform convention; per-axis
    # scale sx/sy as in tf.AffineTransform(scale=(sx, sy)),
    # ImageAugmenter.py:187-190)
    a = sx * jnp.cos(r)
    b = -sy * jnp.sin(r + sh)
    c = sx * jnp.sin(r)
    d = sy * jnp.cos(r + sh)
    det = a * d - b * c
    ia = d / det
    ib = -b / det
    ic = -c / det
    id_ = a / det
    cx = jnp.float32(width // 2)
    cy = jnp.float32(height // 2)
    # p_in = A^-1 @ (p_out - centre - t) + centre
    ox = -cx - tx
    oy = -cy - ty
    m02 = ia * ox + ib * oy + cx
    m12 = ic * ox + id_ * oy + cy
    return jnp.stack(
        [jnp.stack([ia, ib, m02], -1), jnp.stack([ic, id_, m12], -1)], axis=1
    )


def warp_bilinear(images: jax.Array, matrices: jax.Array) -> jax.Array:
    """Batched inverse-map bilinear warp, constant-0 outside.

    images: (N, H, W, C) float in [0,1]; matrices: (N, 2, 3) from
    `inverse_affine_matrices`. Pure gather + FMA — vectorizes on the VPU
    and fuses with neighbouring elementwise work under jit.
    """
    n, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W), x=col, y=row
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1)  # (H, W, 3) as (x, y, 1)
    src = jnp.einsum("nij,hwj->nhwi", matrices, coords)  # (N, H, W, 2) = (x, y)
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yi, xi):
        yc = jnp.clip(yi.astype(jnp.int32), 0, h - 1)
        xc = jnp.clip(xi.astype(jnp.int32), 0, w - 1)
        batch = jnp.arange(n)[:, None, None]
        vals = images[batch, yc, xc]  # (N, H, W, C)
        inside = (
            (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
        )[..., None]
        return jnp.where(inside, vals, 0.0)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    top = v00 * (1 - fx) + v01 * fx
    bot = v10 * (1 - fx) + v11 * fx
    return top * (1 - fy) + bot * fy


def warp_bilinear_mxu(
    images: jax.Array, matrices: jax.Array, block: int = 64
) -> jax.Array:
    """The same warp as `warp_bilinear`, re-expressed as per-image GEMMs.

    Bilinear sampling is a hat-kernel contraction: with tri(t) =
    max(0, 1-|t|),

        out[p, c] = sum_y tri(sy[p] - y) * sum_x tri(sx[p] - x) * img[y, x, c]

    restricted to valid x in [0, w) / y in [0, h) — which reproduces the
    4-corner gather's constant-0 border EXACTLY (an out-of-range corner
    contributes 0 either way; an in-range corner's hat weight equals its
    bilinear weight). The inner contraction over x is one (P, W) @
    (W, H*C) matmul per image — MXU work instead of the 4-way dynamic
    gather, which XLA lowers to serialized per-element addressing on
    TPU. The outer contraction has only 2 live y's per output pixel and
    stays a cheap VPU multiply-reduce.

    `block` bounds peak memory: images are processed `block` at a time
    under `lax.map` (the (block, P, H, C) hat-weighted intermediate is
    the big buffer: block=64 at 64x64x3 is ~190 MB fp32).

    Product selection between this and the gather path is measured, not
    assumed — see docs/KERNELS.md (round 3) and `_WARP_IMPL` below.
    """
    from jax import lax

    n, h, w, c = images.shape
    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W), x=col, y=row
    coords = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (H, W, 3)

    def one(img, mat):
        src = jnp.einsum("ij,hwj->hwi", mat, coords)  # (H, W, 2) = (x, y)
        sx = src[..., 0].reshape(-1)  # (P,)
        sy = src[..., 1].reshape(-1)
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[:, None] - xs[None, :]))  # (P, W)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(sy[:, None] - ys[None, :]))  # (P, H)
        t = jnp.einsum("px,yxc->pyc", wx, img,
                       precision=lax.Precision.HIGHEST)  # GEMM
        out = jnp.einsum("py,pyc->pc", wy, t,
                         precision=lax.Precision.HIGHEST)
        return out.reshape(h, w, c)

    if n <= block:
        return jax.vmap(one)(images, matrices)
    pad = (-n) % block
    if pad:
        images = jnp.concatenate(
            [images, jnp.zeros((pad, h, w, c), images.dtype)])
        eye = jnp.broadcast_to(jnp.eye(2, 3), (pad, 2, 3)).astype(matrices.dtype)
        matrices = jnp.concatenate([matrices, eye])
    nb = images.shape[0] // block
    out = lax.map(
        lambda args: jax.vmap(one)(*args),
        (images.reshape(nb, block, h, w, c),
         matrices.reshape(nb, block, 2, 3)),
    ).reshape(nb * block, h, w, c)
    return out[:n]


# Product warp selection: "gather" (warp_bilinear) or "mxu"
# (warp_bilinear_mxu), overridable via FACEGEN_WARP. The default is
# measured per backend — docs/KERNELS.md (round 3).
import os as _os

_WARP_IMPL = _os.environ.get("FACEGEN_WARP", "auto")


def _warp(images: jax.Array, matrices: jax.Array) -> jax.Array:
    impl = _WARP_IMPL
    if impl == "auto":
        impl = "mxu" if jax.default_backend() == "tpu" else "gather"
    return (warp_bilinear_mxu if impl == "mxu" else warp_bilinear)(
        images, matrices)


def pregenerate_matrices(
    key: jax.Array, n: int, height: int, width: int,
    cfg: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    """Draw n inverse warp matrices up front (ImageAugmenter.py:478-518
    `pregenerate_matrices`: amortize matrix generation across batches).

    Returns (n, 2, 3) float32; apply with `warp_bilinear`/`_mxu`, e.g.
    cycling slices of the pregenerated pool. Under jit the matrices are
    device-resident, so unlike the reference's host-side amortization
    this mainly serves reproducibility/debugging: fixing the matrix pool
    fixes the geometric augmentation across epochs.
    """
    return inverse_affine_matrices(
        sample_affine_params(key, n, cfg), height, width
    )


def plot_augmentations(
    key: jax.Array,
    image: jax.Array,
    path: str,
    n: int = 49,
    cfg: AugmentConfig = AugmentConfig(),
) -> str:
    """Debug grid of n augmentations of one image (the matplotlib
    `ImageAugmenter.plot_image` API, ImageAugmenter.py:654-745, as a PNG
    grid — no GUI dependency). Returns the written path."""
    from facegen.utils import grids

    img = jnp.asarray(image)
    if img.ndim == 2:
        img = img[..., None]
    batch = jnp.broadcast_to(img[None], (n,) + img.shape)
    out = augment_batch(key, batch, cfg)
    return grids.save_grid(path, out)


def augment_batch(
    key: jax.Array,
    images: jax.Array,
    cfg: AugmentConfig = AugmentConfig(),
) -> jax.Array:
    """Full augmentation: flip -> brightness+clip -> affine warp.

    images: (N, H, W, C) uint8 or float in [0,1].
    Returns float32 in [0,1] (like ImageAugmenter's output contract,
    ImageAugmenter.py:615-619).
    """
    n, h, w, c = images.shape
    if images.dtype == jnp.uint8:
        x = images.astype(jnp.float32) / 255.0
    else:
        x = images.astype(jnp.float32)
    k_params, k_noise = jax.random.split(key)
    params = sample_affine_params(k_params, n, cfg)
    flip = params["flip"][:, None, None, None]
    x = jnp.where(flip, x[:, :, ::-1, :], x)
    vflip = params["vflip"][:, None, None, None]
    x = jnp.where(vflip, x[:, ::-1, :, :], x)
    x = x * params["bright"][:, None, None, None]
    if cfg.noise_std > 0:
        # generate_dataset.py:122-125: += 255*N(mean,std) on the 0-255
        # scale, i.e. += N(mean,std) in [0,1] units, before the clip
        x = x + (cfg.noise_mean
                 + cfg.noise_std * jax.random.normal(k_noise, x.shape))
    x = jnp.clip(x, 0.0, 1.0)
    mats = inverse_affine_matrices(params, h, w)
    return _warp(x, mats)
