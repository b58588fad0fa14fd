"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py):
sharded training runs, params stay replicated, and the DP step agrees
with the single-device step in expectation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.config import TrainConfig
from facegen.models import gan
from facegen.parallel import (
    make_mesh,
    make_parallel_epoch,
    make_parallel_step,
    replicate,
    shard_pool,
)
from facegen.train.step import init_state, make_train_step, steps_per_epoch


def tiny_cfg(**kw):
    base = dict(
        batch_size=32,  # 4 per device on 8 shards
        scale=16,
        grayscale=True,
        noise_dim=16,
        n_epoch=32,
        compute_dtype="float32",
        reference_init=False,
    )
    base.update(kw)
    return TrainConfig(**base).validate()


@pytest.fixture(scope="module")
def mesh():
    return make_mesh((-1,))


def setup(cfg, mesh):
    g, d, bundle = gan.init_gan(
        jax.random.key(1), cfg.scale, cfg.channels, cfg.noise_dim,
        reference_init=False,
    )
    state = replicate(init_state(cfg, bundle), mesh)
    pool = jax.random.randint(jax.random.key(2), (64,) + cfg.img_shape, 0, 256, jnp.uint8)
    pool = shard_pool(pool, mesh)
    return g, d, state, pool


def test_mesh_has_8_devices(mesh):
    assert mesh.shape["data"] == 8


def test_parallel_step_runs_and_updates(mesh):
    cfg = tiny_cfg()
    g, d, state, pool = setup(cfg, mesh)
    step = make_parallel_step(g, d, cfg, mesh)
    new_state, m = step(state, jax.random.key(0), pool)
    assert bool(jnp.isfinite(m.loss_d)) and bool(jnp.isfinite(m.loss_g))
    changed = any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(new_state.params_d), jax.tree.leaves(state.params_d))
    )
    assert changed
    # global batch accounting: one D iteration = full global batch
    assert int(new_state.confusion.sum()) == cfg.batch_size


def test_params_stay_replicated_across_devices(mesh):
    cfg = tiny_cfg()
    g, d, state, pool = setup(cfg, mesh)
    step = make_parallel_step(g, d, cfg, mesh)
    new_state, _ = step(state, jax.random.key(0), pool)
    # pull per-device copies of one param and compare
    w = new_state.params_g["00_fc"]["w"]
    shards = [np.asarray(s.data) for s in w.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)
    # BN running stats replicated too (pmean sync)
    bn = new_state.state_g["04_batch_norm"]["mean"]
    shards = [np.asarray(s.data) for s in bn.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_parallel_epoch_runs(mesh):
    cfg = tiny_cfg(n_epoch=32)
    g, d, state, pool = setup(cfg, mesh)
    epoch = make_parallel_epoch(g, d, cfg, mesh)
    new_state, ms = epoch(state, jax.random.key(0), pool)
    n = steps_per_epoch(cfg)
    assert ms.loss_d.shape == (n,)
    assert bool(jnp.isfinite(ms.loss_d).all())
    assert int(new_state.epoch) == 2
    assert int(new_state.trained_d + new_state.not_trained_d) == n


def test_gate_decision_is_global(mesh):
    # with d_max_acc=0 the gate must close identically on all shards:
    # trained_d stays 0 and D params remain exactly replicated+unchanged
    cfg = tiny_cfg(d_max_acc=0.0)
    g, d, state, pool = setup(cfg, mesh)
    step = make_parallel_step(g, d, cfg, mesh)
    new_state, m = step(state, jax.random.key(0), pool)
    assert int(new_state.not_trained_d) == 1
    for a, b in zip(jax.tree.leaves(new_state.params_d), jax.tree.leaves(state.params_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
