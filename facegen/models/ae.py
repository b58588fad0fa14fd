"""Autoencoder + denoiser model family.

- `create_autoencoder` — the flat grayscale autoencoder of
  train_autoencoder.lua:79-92: flatten -> 512 ReLU -> noiseDim tanh ->
  dropout 0.5 -> 256 ReLU -> input_sz sigmoid -> image. Trained with L1
  (AbsCriterion, train_autoencoder.lua:98).
- `create_denoiser` — the two-stage denoising AE of
  train_denoiser.lua:83-117: AE1 = [WhiteNoise(0, 0.1) encoder] +
  conv decoder (2 x [3x3 VALID conv to 8ch + BN + LeakyReLU(1/3)] ->
  dropout 0.2 -> Linear 8*(s-4)^2 -> 2048 + BN + LeakyReLU + dropout ->
  Linear -> input_sz sigmoid); AE2 = an identically-shaped second
  decoder applied to AE1's output. Both trained with BCE
  (train_denoiser.lua:127-128).

Checkpoints store the three sub-bundles under the same keys the
reference uses — AE1_ENCODER / AE1_DECODER / AE2_DECODER
(train_denoiser.lua:352-363) — and train.lua's `--denoise` hook loads
ONLY AE1_DECODER (train.lua:101-110), which we mirror in
`load_denoiser_fn`.
"""

from __future__ import annotations

import os
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from facegen.nn import init as winit, layers as L, sequential
from facegen.nn.core import Ctx, Module

DENOISER_CKPT_FMT = "denoiser_{c}x{h}x{w}"  # logs/denoiser_CxHxW.net equiv
AE_CKPT_NAME = "autoencoder"


def create_autoencoder(scale: int, channels: int, noise_dim: int = 256) -> Module:
    input_sz = scale * scale * channels
    return sequential(
        L.flatten(),
        L.dense(512, name="enc1"),
        L.relu(),
        L.dense(noise_dim, name="enc2"),
        L.tanh(),
        L.dropout(0.5),
        L.dense(256, name="dec1"),
        L.relu(),
        L.dense(input_sz, name="dec2"),
        L.sigmoid(),
        L.reshape((scale, scale, channels)),
        name="AE",
    )


def _valid_conv(features: int, kernel: int, name: str) -> Module:
    """3x3 VALID-padding conv (train_denoiser.lua:89,92 pad=0)."""
    return L.conv2d(features, kernel, padding="VALID", name=name)


def create_denoiser_encoder() -> Module:
    return sequential(L.white_noise(0.0, 0.1), name="AE1_ENCODER")


def create_denoiser_decoder(scale: int, channels: int, name: str = "DECODER") -> Module:
    input_sz = scale * scale * channels
    inner = (scale - 4) * (scale - 4) * 8
    return sequential(
        _valid_conv(8, 3, "conv1"),
        L.batch_norm(),
        L.leaky_relu(1.0 / 3.0),
        _valid_conv(8, 3, "conv2"),
        L.batch_norm(),
        L.leaky_relu(1.0 / 3.0),
        L.dropout(0.2),
        L.flatten(),
        L.dense(2048, name="fc1"),
        L.batch_norm(),
        L.leaky_relu(1.0 / 3.0),
        L.dropout(0.2),
        L.dense(input_sz, name="fc_out"),
        L.sigmoid(),
        L.reshape((scale, scale, channels)),
        name=name,
    )


def init_denoiser(key: jax.Array, scale: int, channels: int) -> Tuple[Module, Module, Module, dict]:
    """Returns (encoder, decoder1, decoder2, bundle). Gaussian init like
    NN_UTILS.initializeWeights (train_denoiser.lua:108-109)."""
    enc = create_denoiser_encoder()
    dec1 = create_denoiser_decoder(scale, channels, "AE1_DECODER")
    dec2 = create_denoiser_decoder(scale, channels, "AE2_DECODER")
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p_enc, s_enc, _ = enc.init(k1, (scale, scale, channels))
    p_d1, s_d1, _ = dec1.init(k2, (scale, scale, channels))
    p_d2, s_d2, _ = dec2.init(k3, (scale, scale, channels))
    p_d1 = winit.gaussian_overwrite(p_d1, jax.random.fold_in(k4, 0))
    p_d2 = winit.gaussian_overwrite(p_d2, jax.random.fold_in(k4, 1))
    bundle = {
        "AE1_ENCODER": {"params": p_enc, "state": s_enc},
        "AE1_DECODER": {"params": p_d1, "state": s_d1},
        "AE2_DECODER": {"params": p_d2, "state": s_d2},
    }
    return enc, dec1, dec2, bundle


def denoiser_ckpt_name(scale: int, channels: int) -> str:
    return DENOISER_CKPT_FMT.format(c=channels, h=scale, w=scale)


def load_denoiser_fn(cfg) -> Callable[[jax.Array], jax.Array]:
    """Load `<save>/denoiser_CxHxW/` and return a jitted image->image
    denoising function using ONLY AE1_DECODER, exactly like train.lua's
    `--denoise` path (train.lua:101-110)."""
    from facegen.utils import checkpoint as ckpt

    enc, dec1, dec2, template = init_denoiser(
        jax.random.key(0), cfg.scale, cfg.channels
    )
    name = denoiser_ckpt_name(cfg.scale, cfg.channels)
    bundle, _ = ckpt.load(cfg.save, name, template)
    p = bundle["AE1_DECODER"]["params"]
    s = bundle["AE1_DECODER"]["state"]

    @jax.jit
    def denoise(images: jax.Array) -> jax.Array:
        y, _ = dec1.apply(p, s, images.astype(jnp.float32), Ctx(None, False))
        return y

    return denoise
