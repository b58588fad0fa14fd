"""Multi-epoch compiled driver: semantics match sequential epochs."""

import jax
import jax.numpy as jnp
import numpy as np

from facegen.config import TrainConfig
from facegen.models import gan
from facegen.train.step import (
    init_state,
    make_epoch_fn,
    make_multi_epoch_fn,
    reset_epoch_stats,
)


def test_multi_epoch_matches_sequential():
    # SGD, not adam: the contract is trajectory equivalence between two
    # differently-fused programs, and adam's m/sqrt(v) normalization
    # amplifies float-noise-level gradient differences into full-lr sign
    # flips on near-zero-gradient coordinates (BN biases), making strict
    # param comparison meaningless under it.
    cfg = TrainConfig(
        batch_size=8, scale=16, grayscale=True, noise_dim=16, n_epoch=8,
        compute_dtype="float32", reference_init=False,
        d_optmethod="sgd", g_optmethod="sgd",
    ).validate()
    g, d, bundle = gan.init_gan(jax.random.key(0), 16, 1, 16, reference_init=False)
    k = 2
    pools = jax.random.randint(
        jax.random.key(1), (k, 16, 16, 16, 1), 0, 256, jnp.uint8
    )

    # sequential reference
    epoch = jax.jit(make_epoch_fn(g, d, cfg))
    s_seq = init_state(cfg, bundle)
    rng = jax.random.key(7)
    seq_losses = []
    for i in range(k):
        s_seq, ms = epoch(s_seq, jax.random.fold_in(rng, i), pools[i])
        seq_losses.append(float(jnp.mean(ms.loss_d)))
        s_seq = reset_epoch_stats(s_seq)

    # one compiled program
    multi = jax.jit(make_multi_epoch_fn(g, d, cfg, k))
    s_multi, summaries = multi(init_state(cfg, bundle), rng, pools)

    np.testing.assert_allclose(
        np.asarray(summaries.loss_d), np.asarray(seq_losses), rtol=1e-5
    )
    assert int(s_multi.epoch) == int(s_seq.epoch) == k + 1
    for a, b in zip(jax.tree.leaves(s_multi.params_g), jax.tree.leaves(s_seq.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    assert summaries.trained_d.shape == (k,)


def test_gaussian_blur_helper():
    from facegen.utils.grids import gaussian_blur

    img = np.zeros((8, 8, 1), np.float32)
    img[4, 4, 0] = 1.0
    out = gaussian_blur(img)
    assert out.shape == (8, 8, 1)
    # energy preserved, spread over neighbours
    np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-5)
    assert out[4, 4, 0] < 1.0 and out[3, 4, 0] > 0.0


def test_vflip_augment():
    from facegen.data.augment import AugmentConfig, augment_batch

    cfg = AugmentConfig(hflip=False, vflip=True, scale_min=1.0, scale_max=1.0,
                        rotation_deg=0.0, translation_px=0.0, brightness=0.0)
    imgs = jax.random.randint(jax.random.key(0), (16, 8, 8, 1), 0, 256, jnp.uint8)
    out = np.asarray(augment_batch(jax.random.key(3), imgs, cfg))
    src = np.asarray(imgs, np.float32) / 255.0
    same = [np.allclose(out[i], src[i], atol=1e-5) for i in range(16)]
    flipped = [np.allclose(out[i], src[i, ::-1, :, :], atol=1e-5) for i in range(16)]
    assert all(s or f for s, f in zip(same, flipped))
    assert any(flipped) and any(same)
