"""Config-combination robustness: one train step must run finitely for
a spread of flag combinations (optimizers x penalties x clamps x
iteration schedules x gate thresholds x dtypes x scales)."""

import jax
import jax.numpy as jnp
import pytest

from facegen.config import TrainConfig
from facegen.models import gan
from facegen.train.step import init_state, make_train_step

COMBOS = [
    # (kwargs, id)
    (dict(scale=16, d_optmethod="sgd", g_optmethod="adagrad",
          d_sgd_momentum=0.9, d_l1=1e-6, g_l1=1e-6), "sgd-adagrad-l1"),
    (dict(scale=16, d_iterations=3, g_iterations=2, d_max_acc=0.8), "sched-gate"),
    (dict(scale=16, d_clamp=0.0, g_clamp=0.0, d_l2=0.0), "no-clamp-no-l2"),
    (dict(scale=16, grayscale=False, compute_dtype="bfloat16",
          reference_init=True), "color-bf16-refinit"),
    (dict(scale=16, guard_nonfinite=True, reference_g_penalty_bug=False,
          g_l1=1e-5, g_l2=1e-5), "guard-fixed-penalty"),
]


@pytest.mark.parametrize("kw,name", COMBOS, ids=[c[1] for c in COMBOS])
def test_step_runs_for_config(kw, name):
    base = dict(batch_size=8, scale=16, grayscale=True, noise_dim=16,
                n_epoch=8, compute_dtype="float32", reference_init=False)
    base.update(kw)
    cfg = TrainConfig(**base).validate()
    g, d, bundle = gan.init_gan(
        jax.random.key(0), cfg.scale, cfg.channels, cfg.noise_dim,
        reference_init=cfg.reference_init,
    )
    state = init_state(cfg, bundle)
    pool = jax.random.randint(
        jax.random.key(1), (32,) + cfg.img_shape, 0, 256, jnp.uint8
    )
    step = jax.jit(make_train_step(g, d, cfg))
    new_state, m = step(state, jax.random.key(2), pool)
    assert bool(jnp.isfinite(m.loss_d)) and bool(jnp.isfinite(m.loss_g))
    for leaf in jax.tree.leaves(new_state.params_g):
        assert bool(jnp.isfinite(leaf).all())
    for leaf in jax.tree.leaves(new_state.params_d):
        assert bool(jnp.isfinite(leaf).all())


@pytest.mark.parametrize("kw,name", COMBOS, ids=[c[1] + "-mesh" for c in COMBOS])
def test_gspmd_step_runs_for_config(kw, name):
    """The same flag spread must survive the (4,2) GSPMD mesh — config
    interactions (gate cond, penalties, bf16, guard) with the
    partitioner are a distinct failure surface from single-device."""
    from facegen.parallel import make_gspmd_step, make_mesh2d, shard_pool_2d, shard_state

    base = dict(batch_size=8, scale=16, grayscale=True, noise_dim=16,
                n_epoch=8, compute_dtype="float32", reference_init=False)
    base.update(kw)
    cfg = TrainConfig(**base).validate()
    g, d, bundle = gan.init_gan(
        jax.random.key(0), cfg.scale, cfg.channels, cfg.noise_dim,
        reference_init=cfg.reference_init,
    )
    mesh2 = make_mesh2d(4, 2)
    state = shard_state(init_state(cfg, bundle), mesh2)
    pool = shard_pool_2d(
        jax.random.randint(jax.random.key(1), (32,) + cfg.img_shape, 0, 256,
                           jnp.uint8),
        mesh2,
    )
    step = make_gspmd_step(g, d, cfg, mesh2)
    new_state, m = step(state, jax.random.key(2), pool)
    assert bool(jnp.isfinite(m.loss_d)) and bool(jnp.isfinite(m.loss_g))
    for leaf in jax.tree.leaves(new_state.params_g):
        assert bool(jnp.isfinite(jax.device_get(leaf)).all())
    for leaf in jax.tree.leaves(new_state.params_d):
        assert bool(jnp.isfinite(jax.device_get(leaf)).all())
