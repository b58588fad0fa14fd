"""Procedural face-like dataset, generated on device.

The environment carries no LFW images (the reference expects the user to
download LFW and run generate_dataset.py, README.md:49-54). For tests,
demos and throughput benchmarking we synthesize face-like 64x64 images
directly on the TPU: an elliptical skin-tone head on a dark background,
two eye blobs, a mouth bar — with per-image jitter in position, scale
and hue. Not photorealistic, but it has the coarse spatial statistics a
32x32 face GAN trains against, and it exercises the exact same pipeline
(crop/resize/augment/pool) as real LFW data.

Everything is jit-compiled jnp; generating a 10k-image pool takes
milliseconds on a v5e chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gauss2d(gy, gx, cy, cx, sy, sx):
    return jnp.exp(-(((gy - cy) / sy) ** 2 + ((gx - cx) / sx) ** 2))


def synthetic_faces(key: jax.Array, n: int, size: int = 64) -> jax.Array:
    """Generate (n, size, size, 3) uint8 face-like images."""
    # split(key, 10)[0] kept verbatim for stream stability: committed
    # artifacts (parity trajectories, demo checkpoints) were generated
    # under this keying
    k_imgs = jax.random.split(key, 10)[0]
    ys = jnp.linspace(0.0, 1.0, size)
    xs = jnp.linspace(0.0, 1.0, size)
    gx, gy = jnp.meshgrid(xs, ys)

    def one(k):
        kk = jax.random.split(k, 8)
        u = lambda i, lo, hi: jax.random.uniform(kk[i], (), minval=lo, maxval=hi)
        cy = u(0, 0.45, 0.55)
        cx = u(1, 0.45, 0.55)
        ry = u(2, 0.28, 0.36)
        rx = ry * u(3, 0.72, 0.82)
        # head: soft ellipse mask
        d = ((gy - cy) / ry) ** 2 + ((gx - cx) / rx) ** 2
        head = jax.nn.sigmoid((1.0 - d) * 12.0)
        # skin tone
        tone = jnp.stack(
            [u(4, 0.6, 0.85), u(4, 0.6, 0.85) * 0.78, u(4, 0.6, 0.85) * 0.62]
        )
        # eyes
        eye_dy = cy - 0.08
        eye_dx = rx * 0.45
        eyes = _gauss2d(gy, gx, eye_dy, cx - eye_dx, 0.03, 0.045) + _gauss2d(
            gy, gx, eye_dy, cx + eye_dx, 0.03, 0.045
        )
        # mouth
        mouth = _gauss2d(gy, gx, cy + ry * 0.55, cx, 0.025, 0.10)
        # hair: darker cap above the forehead
        hair = jax.nn.sigmoid(((cy - ry * 0.45) - gy) * 18.0) * head
        # background gradient
        bg_a = u(5, 0.05, 0.35)
        bg_b = u(6, 0.05, 0.35)
        bg = bg_a + (bg_b - bg_a) * gy
        img = bg[..., None] * jnp.ones((3,))
        img = img * (1 - head[..., None]) + head[..., None] * tone
        img = img * (1 - 0.8 * hair[..., None])
        img = img * (1 - 0.85 * eyes[..., None])
        img = img * (1 - 0.6 * mouth[..., None] * jnp.array([0.2, 0.8, 0.8]))
        noise = 0.02 * jax.random.normal(kk[7], (size, size, 3))
        return jnp.clip(img + noise, 0.0, 1.0)

    imgs = jax.vmap(one)(jax.random.split(k_imgs, n))
    return (imgs * 255.0 + 0.5).astype(jnp.uint8)
