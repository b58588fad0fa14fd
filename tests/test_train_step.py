"""Train-step tests: gate semantics, optimizer gating, penalties,
single-step convergence smoke, determinism (SURVEY.md section 4 plan).
Uses a tiny in-memory random dataset — no disk, like the plan's "fake
in-memory dataset"."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from facegen.config import TrainConfig
from facegen.models import gan
from facegen.train import losses, metrics
from facegen.train.optim import gated_update, make_optimizer
from facegen.train.step import (
    GanState,
    init_state,
    make_epoch_fn,
    make_train_step,
    steps_per_epoch,
)


def tiny_cfg(**kw):
    base = dict(
        batch_size=8,
        scale=16,
        grayscale=True,
        noise_dim=16,
        n_epoch=16,
        compute_dtype="float32",
        reference_init=False,
        seed=3,
    )
    base.update(kw)
    return TrainConfig(**base).validate()


def setup(cfg):
    g, d, bundle = gan.init_gan(
        jax.random.key(cfg.seed), cfg.scale, cfg.channels, cfg.noise_dim,
        reference_init=cfg.reference_init,
    )
    state = init_state(cfg, bundle)
    pool = jax.random.randint(
        jax.random.key(7), (64,) + cfg.img_shape, 0, 256, jnp.uint8
    )
    return g, d, state, pool


def test_steps_per_epoch_matches_reference_loop():
    # N=1000, bs=32: t = 1, 17, ..., 993 -> 63 batches, all >= 4 remaining
    assert steps_per_epoch(TrainConfig(batch_size=32, n_epoch=1000)) == 63
    # N=10, bs=8: t=1 (10 left), t=5 (6 left), t=9 (2 left -> skipped)
    assert steps_per_epoch(tiny_cfg(batch_size=8, n_epoch=10)) == 2
    # N_epoch=-1 -> whole pool
    assert steps_per_epoch(tiny_cfg(batch_size=8, n_epoch=-1), pool_size=32) == 8


def test_single_step_updates_both_networks():
    cfg = tiny_cfg()
    g, d, state, pool = setup(cfg)
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, m = step(state, jax.random.key(0), pool)
    # params changed
    def max_delta(a, b):
        return max(
            float(jnp.abs(x - y).max())
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
        )
    assert max_delta(new_state.params_d, state.params_d) > 0
    assert max_delta(new_state.params_g, state.params_g) > 0
    assert float(new_state.trained_d) == 1
    assert jnp.isfinite(m.loss_d) and jnp.isfinite(m.loss_g)
    # confusion accumulated one full batch
    assert int(new_state.confusion.sum()) == cfg.batch_size


def test_gate_closes_when_accuracy_exceeds_max():
    cfg = tiny_cfg(d_max_acc=0.0)  # gate always closed
    g, d, state, pool = setup(cfg)
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, m = step(state, jax.random.key(0), pool)
    # D params and optimizer state untouched
    for a, b in zip(jax.tree.leaves(new_state.params_d), jax.tree.leaves(state.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(new_state.opt_d), jax.tree.leaves(state.opt_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(new_state.not_trained_d) == 1
    assert float(m.gate_open) == 0.0
    # G still trains
    changed = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(new_state.params_g), jax.tree.leaves(state.params_g))
    )
    assert changed


def test_gate_uses_rolling_mean_not_current():
    # Ring starts empty; with d_max_acc=0.5, a first batch at acc<=0.5
    # trains D, then many acc=1.0 entries close the gate.
    cfg = tiny_cfg(d_max_acc=0.5)
    g, d, state, pool = setup(cfg)
    # preload ring with perfect accuracies
    accs = state.accs.at[:].set(1.0)
    state = state._replace(accs=accs, accs_n=jnp.int32(cfg.accs_interval))
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, m = step(state, jax.random.key(0), pool)
    # mean of ring (mostly 1.0) >= 0.5 -> gate closed regardless of batch acc
    assert float(m.gate_open) == 0.0


def test_gated_update_skips_optimizer_state():
    tx = optax.adam(1e-3)
    params = {"w": jnp.ones((4,))}
    opt = tx.init(params)
    grads = {"w": jnp.full((4,), 0.5)}
    p1, o1 = gated_update(tx, grads, opt, params, jnp.bool_(False))
    np.testing.assert_array_equal(np.asarray(p1["w"]), np.asarray(params["w"]))
    assert int(jax.tree.leaves(o1)[0]) == int(jax.tree.leaves(opt)[0])  # count
    p2, o2 = gated_update(tx, grads, opt, params, jnp.bool_(True))
    assert float(jnp.abs(p2["w"] - params["w"]).max()) > 0


def test_penalty_gradients_reference_bug():
    params = {"w": jnp.array([2.0, -3.0])}
    grads = {"w": jnp.zeros(2)}
    # D semantics: sign*L1 + p*L2
    out = losses.add_penalty_grads(grads, params, 0.1, 0.01)
    np.testing.assert_allclose(np.asarray(out["w"]), [0.1 + 0.02, -0.1 - 0.03], rtol=1e-6)


def test_bce_with_logits_matches_sigmoid_bce():
    logits = jnp.array([[-3.0], [0.5], [2.0]])
    targets = jnp.array([0.0, 1.0, 1.0])
    p = jax.nn.sigmoid(logits.reshape(-1))
    ref = -jnp.mean(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    got = losses.bce_with_logits(logits, targets)
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


def test_confusion_matrix():
    logits = jnp.array([2.0, -2.0, 2.0, -2.0])  # pred: 1,0,1,0
    targets = jnp.array([1.0, 1.0, 0.0, 0.0])
    c = metrics.update_confusion(metrics.empty_confusion(), logits, targets)
    # target=1: one pred 1 (TP), one pred 0; target=0: one pred 1, one pred 0
    np.testing.assert_array_equal(np.asarray(c), [[1, 1], [1, 1]])
    assert float(metrics.total_valid(c)) == 0.5


def test_epoch_scan_runs_and_improves_d():
    cfg = tiny_cfg(n_epoch=16)
    g, d, state, pool = setup(cfg)
    epoch = jax.jit(make_epoch_fn(g, d, cfg))
    state2, ms = epoch(state, jax.random.key(1), pool)
    n = steps_per_epoch(cfg)
    assert ms.loss_d.shape == (n,)
    assert bool(jnp.isfinite(ms.loss_d).all())
    assert int(state2.epoch) == 2
    assert int(state2.trained_d + state2.not_trained_d) == n
    # D should fit the tiny problem quickly: late accuracy > early
    late = float(ms.acc_d[-3:].mean())
    assert late >= 0.5


def test_epoch_deterministic_same_seed():
    cfg = tiny_cfg(n_epoch=8)
    g, d, state, pool = setup(cfg)
    epoch = jax.jit(make_epoch_fn(g, d, cfg))
    s1, m1 = epoch(state, jax.random.key(5), pool)
    s2, m2 = epoch(state, jax.random.key(5), pool)
    np.testing.assert_array_equal(np.asarray(m1.loss_d), np.asarray(m2.loss_d))
    for a, b in zip(jax.tree.leaves(s1.params_g), jax.tree.leaves(s2.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_d_iterations_and_g_iterations_scheduling():
    cfg = tiny_cfg(d_iterations=2, g_iterations=3)
    g, d, state, pool = setup(cfg)
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, _ = step(state, jax.random.key(0), pool)
    assert int(new_state.trained_d) == 2  # one per D iteration
    assert int(new_state.confusion.sum()) == 2 * cfg.batch_size


@pytest.mark.parametrize("method", ["sgd", "adagrad", "adam"])
def test_all_optimizers_step(method):
    cfg = tiny_cfg(d_optmethod=method, g_optmethod=method)
    g, d, state, pool = setup(cfg)
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, m = step(state, jax.random.key(0), pool)
    assert bool(jnp.isfinite(m.loss_d))
    changed = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(new_state.params_d), jax.tree.leaves(state.params_d))
    )
    assert changed


@pytest.mark.slow  # 60s: pins an off-by-default experiment (--boundaryPad)
def test_boundary_pad_is_exact():
    """--boundaryPad widens the G->D image interface with zero weight
    lanes inside the step (step.py:make_boundary_padder). It is a pure
    reparameterization: losses and GRADIENTS through the padded chain
    must match the unpadded chain to summation-tiling tolerance (adding
    zero products is exact; Adam's sign-sensitive first steps would
    amplify that tiling drift, so params are compared on the real-chip
    run in docs/KERNELS.md round 4, not here). Scale 32: D32b's
    boundary is pure conv, so the pad actually engages (at 16px the
    D16_d dense branch flattens the raw image and the gate falls back —
    covered below)."""
    from facegen.nn.core import Ctx
    from facegen.train.step import make_boundary_padder

    cfg = tiny_cfg(boundary_pad=8, scale=32)
    g, d, state, pool = setup(cfg)
    pad_g, pad_d, pad_imgs, d_flattens = make_boundary_padder(cfg)
    assert not d_flattens(state.params_d)
    assert pad_g(state.params_g)[1] == 1 and pad_d(state.params_d)[1] >= 1

    half = cfg.batch_size // 2
    real = pool[:half].astype(jnp.float32) / 255.0
    noise = jax.random.uniform(jax.random.key(5), (half, cfg.noise_dim),
                               jnp.float32, -1.0, 1.0)
    k = jax.random.key(9)
    targets = jnp.concatenate([jnp.ones((half,)), jnp.zeros((half,))])

    # D chain: half real + half fake -> BCE
    def loss_d(params_d, params_g, pad):
        pg = pad_g(params_g)[0] if pad else params_g
        fake, _ = g.apply(pg, state.state_g, noise, Ctx(k, True))
        x = jnp.concatenate([pad_imgs(real) if pad else real, fake])
        pd = pad_d(params_d)[0] if pad else params_d
        logits, _ = d.apply(pd, state.state_d, x, Ctx(k, True))
        return losses.bce_with_logits(logits, targets)

    (l0, g0) = jax.value_and_grad(loss_d)(state.params_d, state.params_g, False)
    (l8, g8) = jax.value_and_grad(loss_d)(state.params_d, state.params_g, True)
    np.testing.assert_allclose(l0, l8, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g8)):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)

    # G chain: noise -> G -> D -> BCE vs all-real
    def loss_g(params_g, pad):
        pg = pad_g(params_g)[0] if pad else params_g
        imgs, _ = g.apply(pg, state.state_g, noise, Ctx(k, True))
        pd = pad_d(state.params_d)[0] if pad else state.params_d
        logits, _ = d.apply(pd, state.state_d, imgs, Ctx(k, True))
        return losses.bce_with_logits(logits, jnp.ones((half,)))

    (l0, g0) = jax.value_and_grad(loss_g)(state.params_g, False)
    (l8, g8) = jax.value_and_grad(loss_g)(state.params_g, True)
    np.testing.assert_allclose(l0, l8, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g8)):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)


def test_boundary_pad_skips_image_flattening_d():
    """D16_d's dense branch consumes the FLATTENED raw image
    (models.lua:286-299): padding the image would feed its fc1 a
    16*16*8 vector. The trace-time gate must detect the flatten
    consumer and fall back to the identity."""
    cfg = tiny_cfg(boundary_pad=8, n_epoch=8)  # scale 16 -> D16_d
    g, d, state, pool = setup(cfg)
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, m = step(state, jax.random.key(0), pool)
    assert bool(jnp.isfinite(m.loss_d)) and bool(jnp.isfinite(m.loss_g))


def test_boundary_pad_skips_models_without_conv_boundary():
    """The flat-G variant has no output conv; the padder must detect
    that at trace time and fall back to the identity (a padded real
    batch against a 1-channel fake would otherwise shape-error)."""
    from facegen.models.gan import create_g_flat
    from facegen.nn import init as winit

    cfg = tiny_cfg(boundary_pad=8)
    g = create_g_flat(cfg.scale, cfg.channels, cfg.noise_dim)
    d = gan.create_d(cfg.scale, cfg.channels)
    kg, kd = jax.random.split(jax.random.key(cfg.seed))
    params_g, state_g, _ = g.init(kg, (cfg.noise_dim,))
    params_d, state_d, _ = d.init(kd, cfg.img_shape)
    bundle = {"params_g": winit.zero_biases(params_g), "state_g": state_g,
              "params_d": winit.zero_biases(params_d), "state_d": state_d}
    state = init_state(cfg, bundle)
    pool = jax.random.randint(
        jax.random.key(7), (64,) + cfg.img_shape, 0, 256, jnp.uint8
    )
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, m = step(state, jax.random.key(0), pool)
    assert bool(jnp.isfinite(m.loss_d)) and bool(jnp.isfinite(m.loss_g))


@pytest.mark.smoke
def test_ablation_knobs_epoch_runs():
    """ROUND5 convergence-study knobs: nchw noise view + eval-mode G
    during the D phase both compile into the epoch scan and train."""
    cfg = tiny_cfg(n_epoch=16, noise_view="nchw", g_train_in_d_phase=False)
    g, d, bundle = gan.init_gan(
        jax.random.key(cfg.seed), cfg.scale, cfg.channels, cfg.noise_dim,
        reference_init=cfg.reference_init, noise_view=cfg.noise_view,
    )
    state = init_state(cfg, bundle)
    pool = jax.random.randint(
        jax.random.key(7), (64,) + cfg.img_shape, 0, 256, jnp.uint8
    )
    epoch = jax.jit(make_epoch_fn(g, d, cfg))
    state2, ms = epoch(state, jax.random.key(1), pool)
    assert bool(jnp.isfinite(ms.loss_d).all())
    assert bool(jnp.isfinite(ms.loss_g).all())
    # with g_train_in_d_phase=False, G's BN running stats must move only
    # via the G phase (g_iterations=1 per step), not the 1 D iteration;
    # they must still differ from init (G phase ran in train mode)
    leaves0 = jax.tree.leaves(state.state_g)
    leaves2 = jax.tree.leaves(state2.state_g)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves0, leaves2)
    )
