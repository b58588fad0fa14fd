"""Coarse-to-fine path tests: triple construction, conditional models,
training engine, approxParzen, best-checkpoint selection, refinement."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.config import C2FConfig
from facegen.data.c2f import gather_triple, make_triples
from facegen.models import c2f as c2f_models
from facegen.nn.core import Ctx


def tiny_cfg(tmp_path=None, **kw):
    base = dict(
        batch_size=8, coarse_size=4, fine_size=8, grayscale=True,
        n_epoch=16, compute_dtype="float32", synthetic_data=True,
        seed=3, save_freq=1, epochs=1, val_size=16, parzen_samples=8,
    )
    if tmp_path is not None:
        base["save"] = str(tmp_path / "logs")
    base.update(kw)
    return C2FConfig(**base).validate()


def test_make_triples_reconstruction():
    fine = jax.random.randint(jax.random.key(0), (4, 16, 16, 3), 0, 256, jnp.uint8)
    pool = make_triples(fine, 8)
    assert pool.fine.shape == (4, 16, 16, 3)
    assert pool.coarse.shape == (4, 16, 16, 3)
    f, c, d = gather_triple(pool, jnp.arange(4))
    np.testing.assert_allclose(np.asarray(f - c), np.asarray(d), atol=1e-6)
    # coarse is a blurred version: less high-frequency energy
    def hf_energy(x):
        return float(jnp.abs(jnp.diff(x, axis=1)).mean())
    assert hf_energy(c) < hf_energy(f) + 1e-6


def test_c2f_g_shapes_and_signed_output():
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), 16, 1)
    z = jax.random.uniform(jax.random.key(1), (4, 16, 16, 1), minval=-1, maxval=1)
    cond = jax.random.uniform(jax.random.key(2), (4, 16, 16, 1))
    diff, _ = g.apply(bundle["params_g"], bundle["state_g"], (z, cond),
                      Ctx(jax.random.key(3), False))
    assert diff.shape == (4, 16, 16, 1)
    # no sigmoid on the diff: signed values possible
    assert float(diff.min()) < 0 or float(diff.max()) > 0


def test_c2f_d_adds_diff_and_coarse():
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), 16, 1)
    diff = jnp.full((2, 16, 16, 1), 0.25)
    cond = jnp.full((2, 16, 16, 1), 0.5)
    # D(diff, cond) must equal D(diff + delta, cond - delta): only the sum enters
    delta = jnp.full((2, 16, 16, 1), 0.1)
    ctx = Ctx(jax.random.key(1), False)
    y1, _ = d.apply(bundle["params_d"], bundle["state_d"], (diff, cond), ctx)
    y2, _ = d.apply(bundle["params_d"], bundle["state_d"], (diff + delta, cond - delta), ctx)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_c2f_epoch_runs_and_trains(tmp_path):
    from facegen.train.c2f import C2FTrainer

    cfg = tiny_cfg(tmp_path)
    tr = C2FTrainer(cfg, verbose=False)
    before = jax.tree.leaves(tr.state.params_g)
    stats = tr.train_epoch(0)
    after = jax.tree.leaves(tr.state.params_g)
    assert np.isfinite(stats["loss_d_mean"]) and np.isfinite(stats["loss_g_mean"])
    assert np.isfinite(stats["parzen"]) and stats["parzen"] > 0
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(before, after))


def test_c2f_bestnet_checkpoint(tmp_path):
    from facegen.train.c2f import C2FTrainer, ckpt_name
    from facegen.utils import checkpoint as ckpt

    cfg = tiny_cfg(tmp_path)
    tr = C2FTrainer(cfg, verbose=False)
    tr.train_epoch(0)
    # first epoch always improves on inf -> bestnet saved
    assert ckpt.exists(cfg.save, ckpt_name(cfg, best=True))
    assert ckpt.exists(cfg.save, ckpt_name(cfg))


def test_c2f_resume(tmp_path):
    from facegen.train.c2f import C2FTrainer, ckpt_name

    cfg = tiny_cfg(tmp_path)
    tr = C2FTrainer(cfg, verbose=False)
    tr.train_epoch(0)
    cfg2 = tiny_cfg(tmp_path, network=ckpt_name(cfg))
    tr2 = C2FTrainer(cfg2, verbose=False)
    assert int(tr2.state.epoch) == int(tr.state.epoch)
    # c2f resume restores optimizer state too (train_c2f.lua:114)
    for a, b in zip(jax.tree.leaves(tr2.state.opt_g), jax.tree.leaves(tr.state.opt_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_parzen_distances_reasonable():
    from facegen.train.c2f import init_c2f_state, make_parzen_fn

    cfg = tiny_cfg()
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), cfg.fine_size, 1)
    parzen = make_parzen_fn(g, cfg, nneighbors=4)
    fine = jax.random.randint(jax.random.key(1),
                           (16, cfg.fine_size, cfg.fine_size, 1), 0, 256,
                           jnp.uint8)
    pool = make_triples(fine, cfg.coarse_size)
    dists = parzen(bundle["params_g"], bundle["state_g"], jax.random.key(2), pool)
    assert dists.shape == (cfg.parzen_samples,)
    assert bool(jnp.isfinite(dists).all()) and float(dists.min()) >= 0


def test_get_samples_grid(tmp_path):
    from facegen.train.c2f import C2FTrainer

    cfg = tiny_cfg(tmp_path)
    tr = C2FTrainer(cfg, verbose=False)
    grid = tr.get_samples_grid(jax.random.key(0), 4)
    # 4 rows x 5 columns of fine_size tiles (+padding)
    assert grid.shape[1] == 5 * (cfg.fine_size + 1) + 1
    assert grid.min() >= 0.0 and grid.max() <= 1.0


def test_refine_c2f_shapes():
    from facegen.sample import refine_c2f

    cfg = tiny_cfg()
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), cfg.fine_size, 1)
    coarse_imgs = jax.random.uniform(
        jax.random.key(1), (3, cfg.coarse_size, cfg.coarse_size, 1))
    out = refine_c2f(cfg, bundle, coarse_imgs, jax.random.key(2), tries=4)
    assert out.shape == (3, cfg.fine_size, cfg.fine_size, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_refine_c2f_picks_max_d_score_candidate():
    """Semantic pin for the sampler's c2f() refinement (sample.lua:176-214):
    per image, generate `tries` candidate diffs, keep the one the c2f D
    scores highest, add it to the bilinearly upscaled coarse. Brute-forced
    here with a per-image/per-try python loop over the same nets and the
    same noise tensor."""
    from facegen.sample import refine_c2f

    cfg = tiny_cfg()
    fs, c, tries, n = cfg.fine_size, 1, 4, 3
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), fs, c)
    coarse_imgs = jax.random.uniform(
        jax.random.key(1), (n, cfg.coarse_size, cfg.coarse_size, c))
    key = jax.random.key(2)
    out = np.asarray(refine_c2f(cfg, bundle, coarse_imgs, key, tries=tries))

    # brute force with the identical noise draw (refine_c2f's internal
    # (n, tries, fs, fs, 1) uniform from the same key)
    up = jax.image.resize(coarse_imgs.astype(jnp.float32), (n, fs, fs, c),
                          "linear")
    z = jax.random.uniform(key, (n, tries, fs, fs, 1), jnp.float32, -1.0, 1.0)
    for i in range(n):
        best_score, best_diff = None, None
        for t in range(tries):
            diff, _ = g.apply(bundle["params_g"], bundle["state_g"],
                              (z[i, t][None], up[i][None]), Ctx(None, False))
            logit, _ = d.apply(bundle["params_d"], bundle["state_d"],
                               (diff, up[i][None]), Ctx(None, False))
            s = float(logit.reshape(()))
            if best_score is None or s > best_score:
                best_score, best_diff = s, diff[0]
        want = np.clip(np.asarray(up[i] + best_diff), 0.0, 1.0)
        np.testing.assert_allclose(out[i], want, atol=1e-5)


@pytest.mark.slow  # 200s: pins an off-by-default experiment (--boundaryPad)
def test_c2f_boundary_pad_is_exact():
    """--boundaryPad on the c2f engine (train/c2f.py) is a pure
    reparameterization of the diff/coarse interface: losses and
    gradients through the padded chain equal the unpadded chain
    (G_d's padded output lanes emit exactly 0, CAddTable pad sums are
    0, D_c's pad input rows have zero weights)."""
    import dataclasses

    from facegen.train.c2f import make_epoch_fn, init_c2f_state
    from facegen.train.step import make_boundary_padder

    base = C2FConfig(batch_size=8, n_epoch=16, coarse_size=8, fine_size=16,
                     compute_dtype="float32", seed=3)
    g, d, bundle = c2f_models.init_c2f(jax.random.key(3), base.fine_size,
                                       base.channels)
    padder = make_boundary_padder(dataclasses.replace(base, boundary_pad=8))
    assert padder[0](bundle["params_g"])[1] == 1
    assert padder[1](bundle["params_d"])[1] >= 1
    assert not padder[3](bundle["params_d"])

    fine = jax.random.randint(jax.random.key(5), (64, 16, 16, 3), 0, 256,
                              jnp.uint8)
    pool = make_triples(fine, base.coarse_size)
    runs = {}
    for bp in (0, 8):
        cfg = dataclasses.replace(base, boundary_pad=bp)
        state = init_c2f_state(cfg, bundle)
        epoch = jax.jit(make_epoch_fn(g, d, cfg))
        new_state, ms = epoch(state, jax.random.key(11), pool)
        runs[bp] = (new_state, ms)
    s0, m0 = runs[0]
    s8, m8 = runs[8]
    np.testing.assert_allclose(m0.loss_d, m8.loss_d, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(m0.loss_g, m8.loss_g, atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(s0.confusion),
                                  np.asarray(s8.confusion))
