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


def test_trainer_epochs_per_compile_matches_sequential(tmp_path):
    """--epochsPerCompile N: same RNG stream, same params trajectory,
    one metrics row per epoch (VERDICT r2 item 2)."""
    import json
    import os

    from facegen.train.loop import Trainer

    def cfg_for(sub, epc):
        return TrainConfig(
            batch_size=8, scale=16, grayscale=True, noise_dim=16, n_epoch=8,
            compute_dtype="float32", reference_init=False, synthetic_data=True,
            save=str(tmp_path / sub), noplot=True, epochs=3, save_freq=100,
            d_optmethod="sgd", g_optmethod="sgd", epochs_per_compile=epc,
        ).validate()

    tr_seq = Trainer(cfg_for("seq", 1), verbose=False)
    seq_stats = list(tr_seq.run())

    tr_chunk = Trainer(cfg_for("chunk", 2), verbose=False)  # 2 + tail of 1
    assert tr_chunk.epochs_per_compile == 2
    chunk_stats = list(tr_chunk.run())

    assert len(seq_stats) == len(chunk_stats) == 3
    for s, c in zip(seq_stats, chunk_stats):
        assert s["epoch"] == c["epoch"]
        np.testing.assert_allclose(s["loss_d_mean"], c["loss_d_mean"],
                                   rtol=1e-4)
        assert s["trained_d"] == c["trained_d"]
    for a, b in zip(jax.tree.leaves(tr_seq.state.params_g),
                    jax.tree.leaves(tr_chunk.state.params_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
    # one metrics.jsonl row per epoch in both modes
    with open(os.path.join(tr_chunk.cfg.save, "metrics.jsonl")) as f:
        rows = [json.loads(l) for l in f if l.strip()]
    assert [r["epoch"] for r in rows] == [1, 2, 3]


def test_trainer_epochs_per_compile_auto(tmp_path):
    """auto (0): engages under --noplot, stays sequential with viz."""
    from facegen.train.loop import Trainer

    base = dict(
        batch_size=8, scale=16, grayscale=True, noise_dim=16, n_epoch=8,
        compute_dtype="float32", reference_init=False, synthetic_data=True,
        epochs=1,
    )
    t1 = Trainer(TrainConfig(save=str(tmp_path / "a"), noplot=True,
                             **base).validate(), verbose=False)
    assert t1.epochs_per_compile == 8
    t2 = Trainer(TrainConfig(save=str(tmp_path / "b"), noplot=False,
                             **base).validate(), verbose=False)
    assert t2.epochs_per_compile == 1
    t3 = Trainer(TrainConfig(save=str(tmp_path / "c"), noplot=True,
                             weights_vis_freq=2, epochs_per_compile=4,
                             **base).validate(), verbose=False)
    assert t3.epochs_per_compile == 1  # segmented path wins


def test_multi_epoch_stacked_keys_match_fold():
    """Stacked per-epoch keys reproduce the scalar fold_in stream."""
    cfg = TrainConfig(
        batch_size=8, scale=16, grayscale=True, noise_dim=16, n_epoch=8,
        compute_dtype="float32", reference_init=False,
        d_optmethod="sgd", g_optmethod="sgd",
    ).validate()
    g, d, bundle = gan.init_gan(jax.random.key(0), 16, 1, 16, reference_init=False)
    pools = jax.random.randint(
        jax.random.key(1), (2, 16, 16, 16, 1), 0, 256, jnp.uint8
    )
    rng = jax.random.key(7)
    multi = jax.jit(make_multi_epoch_fn(g, d, cfg, 2))
    s_a, sum_a = multi(init_state(cfg, bundle), rng, pools)
    keys = jnp.stack([jax.random.fold_in(rng, i) for i in range(2)])
    s_b, sum_b = multi(init_state(cfg, bundle), keys, pools)
    np.testing.assert_allclose(np.asarray(sum_a.loss_d),
                               np.asarray(sum_b.loss_d), rtol=1e-6)


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
