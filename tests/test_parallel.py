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


# ---------------------------------------------------------------------------
# 2-D (data x model) GSPMD mesh
# ---------------------------------------------------------------------------


def test_gspmd_sharding_rule_places_big_leaves():
    from facegen.parallel import make_mesh2d, shard_state

    cfg = tiny_cfg()
    g, d, bundle = gan.init_gan(jax.random.key(1), cfg.scale, cfg.channels,
                                cfg.noise_dim, reference_init=False)
    mesh2 = make_mesh2d(4, 2)
    state = shard_state(init_state(cfg, bundle), mesh2)
    # G's upconv1 kernel (5,5,128,256): output-channel sharded on "model"
    w = state.params_g["03_upconv1"]["w"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, None, None, "model")
    # biases / BN / gate ring stay replicated
    b = state.params_g["03_upconv1"]["b"]
    assert b.sharding.spec == jax.sharding.PartitionSpec()
    assert state.accs.sharding.spec == jax.sharding.PartitionSpec()


def test_gspmd_step_matches_single_device():
    """The GSPMD program is the SAME math as single-chip: identical RNG
    stream, global batch, global BN stats. Measured on the virtual CPU
    mesh, (2,4)/(1,8)/(8,1) partitionings reproduce the single-device
    step bit-for-bit; (4,2) picks a split-contraction algorithm whose
    float-reorder noise can cross a PReLU kink and amplify (chaos, not a
    bug — covered by the smoke test below). The tight contract here uses
    (2, 4)."""
    from facegen.parallel import make_gspmd_step, make_mesh2d, shard_pool_2d, shard_state

    cfg = tiny_cfg(d_optmethod="sgd", g_optmethod="sgd")
    g, d, bundle = gan.init_gan(jax.random.key(1), cfg.scale, cfg.channels,
                                cfg.noise_dim, reference_init=False)
    pool_host = jax.random.randint(jax.random.key(2), (64,) + cfg.img_shape,
                                   0, 256, jnp.uint8)

    # single device
    step1 = jax.jit(make_train_step(g, d, cfg))
    s1, m1 = step1(init_state(cfg, bundle), jax.random.key(3), pool_host)

    # (2, 4) mesh
    mesh2 = make_mesh2d(2, 4)
    state2 = shard_state(init_state(cfg, bundle), mesh2)
    step2 = make_gspmd_step(g, d, cfg, mesh2)
    s2, m2 = step2(state2, jax.random.key(3), shard_pool_2d(pool_host, mesh2))

    np.testing.assert_allclose(float(m1.loss_d), float(m2.loss_d), rtol=1e-5)
    np.testing.assert_allclose(float(m1.loss_g), float(m2.loss_g), rtol=1e-5)
    # params: the applied UPDATE (after - init) agrees within a few
    # percent in L2 per leaf — gradient reductions reorder across
    # partitions, so elementwise comparison is noise-dominated on
    # small-gradient coordinates while the update direction/magnitude
    # must match.
    p0 = jax.tree.leaves(init_state(cfg, bundle).params_g)
    for a, b, z in zip(jax.tree.leaves(s1.params_g),
                       jax.tree.leaves(s2.params_g), p0):
        d1 = np.asarray(a) - np.asarray(z)
        d2 = np.asarray(jax.device_get(b)) - np.asarray(z)
        err = np.linalg.norm(d2 - d1)
        ref = np.linalg.norm(d1)
        assert err <= 0.05 * ref + 1e-7, (err, ref)
    # kernels remain sharded after the step (out_shardings preserved)
    w = s2.params_g["03_upconv1"]["w"]
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, None, None, "model")


def test_gspmd_step_4x2_update_parity():
    """(4,2) — the mesh shape that originally exposed the partitioner's
    conv-dW miscompilation (dp-scaled gradients when the noise batch was
    left replicated; see gspmd._noise_sharding). With the constraint in
    place the update norms must match single-device within reorder
    noise on EVERY G leaf."""
    from facegen.parallel import make_gspmd_step, make_mesh2d, shard_pool_2d, shard_state

    cfg = tiny_cfg(d_optmethod="sgd", g_optmethod="sgd")
    g, d, bundle = gan.init_gan(jax.random.key(1), cfg.scale, cfg.channels,
                                cfg.noise_dim, reference_init=False)
    pool_host = jax.random.randint(jax.random.key(2), (64,) + cfg.img_shape,
                                   0, 256, jnp.uint8)
    s0 = init_state(cfg, bundle)
    step1 = jax.jit(make_train_step(g, d, cfg))
    s1, m1 = step1(s0, jax.random.key(3), pool_host)

    mesh2 = make_mesh2d(4, 2)
    state2 = shard_state(init_state(cfg, bundle), mesh2)
    step2 = make_gspmd_step(g, d, cfg, mesh2)
    s2, m2 = step2(state2, jax.random.key(3), shard_pool_2d(pool_host, mesh2))
    assert bool(jnp.isfinite(m2.loss_d)) and bool(jnp.isfinite(m2.loss_g))
    np.testing.assert_allclose(float(m1.loss_d), float(m2.loss_d), rtol=5e-2)
    np.testing.assert_allclose(float(m1.loss_g), float(m2.loss_g), rtol=5e-2)
    for a, b, z in zip(jax.tree.leaves(s1.params_g),
                       jax.tree.leaves(s2.params_g),
                       jax.tree.leaves(s0.params_g)):
        d1 = np.asarray(a) - np.asarray(z)
        d2 = np.asarray(jax.device_get(b)) - np.asarray(z)
        err = np.linalg.norm(d2 - d1)
        assert err <= 0.05 * np.linalg.norm(d1) + 1e-7


def test_gspmd_epoch_runs_on_2x4():
    from facegen.parallel import make_gspmd_epoch, make_mesh2d, shard_pool_2d, shard_state

    cfg = tiny_cfg(n_epoch=16)
    g, d, bundle = gan.init_gan(jax.random.key(1), cfg.scale, cfg.channels,
                                cfg.noise_dim, reference_init=False)
    mesh2 = make_mesh2d(2, 4)
    state = shard_state(init_state(cfg, bundle), mesh2)
    pool = shard_pool_2d(
        jax.random.randint(jax.random.key(2), (64,) + cfg.img_shape, 0, 256,
                           jnp.uint8), mesh2)
    epoch = make_gspmd_epoch(g, d, cfg, mesh2)
    new_state, ms = epoch(state, jax.random.key(0), pool)
    assert bool(jnp.isfinite(ms.loss_d).all())
    assert int(new_state.epoch) == 2


# ---------------------------------------------------------------------------
# GSPMD over the auxiliary model families (c2f / AE / denoiser)
# ---------------------------------------------------------------------------


def _c2f_setup():
    from facegen.config import C2FConfig
    from facegen.data.c2f import make_triples
    from facegen.models import c2f as c2f_models
    from facegen.train.c2f import init_c2f_state

    cfg = C2FConfig(batch_size=16, coarse_size=4, fine_size=8, grayscale=True,
                    n_epoch=16, compute_dtype="float32",
                    synthetic_data=True, seed=3).validate()
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), cfg.fine_size,
                                       cfg.channels)
    state = init_c2f_state(cfg, bundle)
    fine = jax.random.randint(jax.random.key(1), (64, 8, 8, 1), 0, 256, jnp.uint8)
    pool = make_triples(fine, cfg.coarse_size)
    return cfg, g, d, state, pool


def test_gspmd_c2f_epoch_matches_single_device():
    """The c2f GSPMD program is the same math as single-device (same RNG
    stream, global batch); per-epoch losses must agree."""
    from facegen.parallel import make_gspmd_c2f_epoch, make_mesh2d, shard_pool_2d, shard_state
    from facegen.train import c2f as c2f_train

    cfg, g, d, state, pool = _c2f_setup()
    epoch1 = jax.jit(c2f_train.make_epoch_fn(g, d, cfg))
    s1, ms1 = epoch1(state, jax.random.key(5), pool)

    mesh2 = make_mesh2d(2, 4)
    state2 = shard_state(state, mesh2)
    epoch2 = make_gspmd_c2f_epoch(g, d, cfg, mesh2)
    s2, ms2 = epoch2(state2, jax.random.key(5), shard_pool_2d(pool, mesh2))

    np.testing.assert_allclose(np.asarray(ms1.loss_d), np.asarray(ms2.loss_d),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ms1.loss_g), np.asarray(ms2.loss_g),
                               rtol=2e-4, atol=1e-5)
    # conv kernels sharded on the model axis survive the epoch
    specs = {l.sharding.spec for l in jax.tree.leaves(s2.params_g)
             if getattr(l, "ndim", 0) == 4}
    assert jax.sharding.PartitionSpec(None, None, None, "model") in specs


def test_gspmd_c2f_trainer_smoke(tmp_path):
    from facegen.config import C2FConfig
    from facegen.parallel import make_mesh2d
    from facegen.train.c2f import C2FTrainer

    cfg = C2FConfig(batch_size=8, coarse_size=4, fine_size=8, grayscale=True,
                    n_epoch=16, compute_dtype="float32", synthetic_data=True,
                    seed=3, save=str(tmp_path / "logs"), save_freq=1,
                    val_size=16, parzen_samples=8).validate()
    tr = C2FTrainer(cfg, verbose=False, mesh=make_mesh2d(4, 2))
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss_d_mean"])
    assert np.isfinite(stats["parzen"])


def test_gspmd_ae_epoch_matches_single_device():
    import optax

    from facegen.models import ae as AE
    from facegen.parallel import make_mesh2d, shard_pool_2d
    from facegen.train.ae_loop import make_ae_epoch

    cfg = tiny_cfg(batch_size=16)
    model = AE.create_autoencoder(cfg.scale, 1, 64)
    params, state, _ = model.init(jax.random.key(0), (cfg.scale, cfg.scale, 1))
    opt = optax.adam(1e-3).init(params)
    pool = jax.random.randint(jax.random.key(1), (64, cfg.scale, cfg.scale, 1),
                              0, 256, jnp.uint8)

    p1, s1, o1, l1 = make_ae_epoch(model, cfg)(params, state, opt,
                                               jax.random.key(2), pool)

    mesh2 = make_mesh2d(2, 4)
    ep2 = make_ae_epoch(model, cfg, mesh=mesh2)
    p2, s2, o2, l2 = ep2(params, state, opt, jax.random.key(2),
                         shard_pool_2d(pool, mesh2))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=1e-6)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(jax.device_get(b)),
                                   rtol=5e-3, atol=1e-5)


def test_gspmd_denoiser_epoch_matches_single_device():
    """Parity, not just finiteness: the (4,2) mesh has both axes
    non-trivial — exactly the configuration where the partitioner
    conv-dW miscompile class (gspmd._noise_sharding) would silently
    scale gradients by dp, which an isfinite check cannot catch. The
    denoiser's WhiteNoise is added to the data-sharded batch, so its
    sharding propagates correctly without an explicit constraint; this
    test is what proves that."""
    import optax

    from facegen.models import ae as AE
    from facegen.parallel import make_mesh2d, shard_pool_2d
    from facegen.train.ae_loop import make_denoiser_epoch

    cfg = tiny_cfg(batch_size=16, scale=16)
    enc, dec1, dec2, bundle = AE.init_denoiser(jax.random.key(0), 16, 1)
    tx = optax.adam(1e-3)
    opt1 = tx.init(bundle["AE1_DECODER"]["params"])
    opt2 = tx.init(bundle["AE2_DECODER"]["params"])
    pool = jax.random.randint(jax.random.key(1), (64, 16, 16, 1), 0, 256, jnp.uint8)

    # THREE successive epochs: miscompiled (dp-scaled) gradients feed
    # back through Adam and blow the later-epoch losses apart, while
    # float-reorder noise keeps them tracking. (Param-level comparison
    # is meaningless here: the denoiser hardwires Adam per the
    # reference, and first-step Adam is ~lr*sign(g) — reorder noise
    # near g=0 flips signs without changing the math.)
    ep1 = make_denoiser_epoch(enc, dec1, dec2, cfg)
    mesh2 = make_mesh2d(4, 2)
    ep2 = make_denoiser_epoch(enc, dec1, dec2, cfg, mesh=mesh2)
    b1, o1a, o1b = bundle, opt1, opt2
    b2, o2a, o2b = bundle, opt1, opt2
    pool2 = shard_pool_2d(pool, mesh2)
    for e in range(3):
        k = jax.random.key(2 + e)
        b1, o1a, o1b, l1 = ep1(b1, o1a, o1b, k, pool)
        b2, o2a, o2b, l2 = ep2(b2, o2a, o2b, k, pool2)
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=5e-3, atol=1e-5)


def test_gspmd_wrap_padded_pool_is_exact():
    """A pool NOT divisible by dp is wrap-padded by shard_pool_2d, and
    draw_n keeps the batch draws identical to the single-device run on
    the unpadded pool."""
    from facegen.parallel import make_gspmd_epoch, make_mesh2d, shard_pool_2d, shard_state
    from facegen.train.step import make_epoch_fn

    cfg = tiny_cfg(n_epoch=16)
    g, d, bundle = gan.init_gan(jax.random.key(1), cfg.scale, cfg.channels,
                                cfg.noise_dim, reference_init=False)
    pool = jax.random.randint(jax.random.key(2), (61,) + cfg.img_shape,
                              0, 256, jnp.uint8)  # 61 % 2 != 0

    epoch1 = jax.jit(make_epoch_fn(g, d, cfg, pool_size=61))
    s1, ms1 = epoch1(init_state(cfg, bundle), jax.random.key(3), pool)

    mesh2 = make_mesh2d(2, 4)
    state2 = shard_state(init_state(cfg, bundle), mesh2)
    sharded = shard_pool_2d(pool, mesh2)
    assert sharded.shape[0] == 62  # padded up, nothing dropped
    epoch2 = make_gspmd_epoch(g, d, cfg, mesh2, pool_size=61)
    s2, ms2 = epoch2(state2, jax.random.key(3), sharded)
    np.testing.assert_allclose(np.asarray(ms1.loss_d), np.asarray(ms2.loss_d),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ms1.loss_g), np.asarray(ms2.loss_g),
                               rtol=2e-4, atol=1e-5)


def test_c2f_trainer_accepts_1d_mesh(tmp_path):
    """A plain ("data",) mesh is lifted to (N, 1) by ensure_mesh2d."""
    from facegen.config import C2FConfig
    from facegen.parallel import make_mesh
    from facegen.train.c2f import C2FTrainer

    cfg = C2FConfig(batch_size=8, coarse_size=4, fine_size=8, grayscale=True,
                    n_epoch=16, compute_dtype="float32", synthetic_data=True,
                    seed=3, save=str(tmp_path / "logs"), save_freq=1,
                    val_size=16, parzen_samples=8).validate()
    tr = C2FTrainer(cfg, verbose=False, mesh=make_mesh((-1,)))
    assert "model" in tr.mesh.axis_names and tr.mesh.shape["model"] == 1
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss_d_mean"])


def test_mesh2d_rejects_bad_shapes():
    from facegen.parallel import make_mesh2d

    with pytest.raises(ValueError):
        make_mesh2d(0, 16)
    with pytest.raises(ValueError):
        make_mesh2d(4, -1)
    with pytest.raises(ValueError):
        make_mesh2d(16, 4)  # needs 64 devices


def test_gspmd_trainer_save_resume_roundtrip(tmp_path):
    """Checkpoint written from a 2-D-mesh trainer (sharded state) must
    restore bit-exactly into a fresh mesh trainer."""
    from facegen.parallel import make_mesh2d
    from facegen.train.loop import CKPT_NAME, Trainer

    cfg = TrainConfig(
        batch_size=16, scale=16, grayscale=True, noise_dim=16, n_epoch=16,
        compute_dtype="float32", reference_init=False, synthetic_data=True,
        save=str(tmp_path / "logs"), save_freq=1, noplot=True,
    ).validate()
    mesh2 = make_mesh2d(4, 2)
    tr = Trainer(cfg, mesh=mesh2, verbose=False)
    tr.train_epoch(0)
    tr.save()

    import dataclasses

    cfg2 = dataclasses.replace(cfg, network=CKPT_NAME)
    tr2 = Trainer(cfg2, mesh=mesh2, verbose=False)
    assert int(tr2.state.epoch) == int(tr.state.epoch)
    for a, b in zip(jax.tree.leaves(tr.state.params_g),
                    jax.tree.leaves(tr2.state.params_g)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(jax.device_get(b)))
    # resumed trainer can continue training on the mesh
    stats = tr2.train_epoch(1)
    assert np.isfinite(stats["loss_d_mean"])


# ---------------------------------------------------------------------------
# data-parallel serving (GanInference / NN search on a mesh)
# ---------------------------------------------------------------------------


def test_mesh_inference_matches_single_device():
    from facegen.parallel import make_mesh2d
    from facegen.utils.infer import GanInference

    cfg = tiny_cfg()
    g, d, bundle = gan.init_gan(jax.random.key(1), cfg.scale, cfg.channels,
                                cfg.noise_dim, reference_init=False)
    b = {"params_g": bundle["params_g"], "state_g": bundle["state_g"],
         "params_d": bundle["params_d"], "state_d": bundle["state_d"]}
    inf1 = GanInference(g, d, cfg.noise_dim, compute_dtype="float32")
    inf2 = GanInference(g, d, cfg.noise_dim, compute_dtype="float32",
                        mesh=make_mesh2d(4, 2))
    # 301 is NOT divisible by dp=4: exercises the wrap-pad + slice path
    for n in (64, 301):
        imgs1 = inf1.generate_n(b, jax.random.key(7), n)
        imgs2 = inf2.generate_n(b, jax.random.key(7), n)
        assert imgs2.shape[0] == n
        np.testing.assert_allclose(np.asarray(imgs1), np.asarray(imgs2),
                                   rtol=1e-4, atol=1e-5)
        s1 = inf1.score(b, imgs1)
        s2 = inf2.score(b, imgs2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-4, atol=1e-6)


def test_mesh_nn_search_ignores_sentinel_padding():
    from facegen.parallel import make_mesh2d
    from facegen.utils.infer import nearest_neighbours, prepare_nn_dataset

    mesh2 = make_mesh2d(4, 2)
    # 13 rows: padded to 16 with three sentinel rows on the mesh
    data = np.asarray(
        jax.random.uniform(jax.random.key(0), (13, 8, 8, 1), jnp.float32))
    queries = data[[3, 9, 12]] + 0.001
    df = prepare_nn_dataset(data, mesh=mesh2)
    assert df.shape[0] == 16
    idx, dist = nearest_neighbours(queries, df)
    assert list(idx[:, 0]) == [3, 9, 12]  # sentinels never win
    idx0, dist0 = nearest_neighbours(queries, data)  # meshless reference
    np.testing.assert_allclose(dist[:, 0], dist0[:, 0], rtol=1e-5, atol=1e-6)


def test_checkpoint_portable_across_mesh_modes(tmp_path):
    """A checkpoint written single-device restores into a 2-D-mesh
    trainer and vice versa — sharding is a placement property, not part
    of the checkpoint format."""
    import dataclasses

    from facegen.parallel import make_mesh2d
    from facegen.train.loop import CKPT_NAME, Trainer

    cfg = TrainConfig(
        batch_size=16, scale=16, grayscale=True, noise_dim=16, n_epoch=16,
        compute_dtype="float32", reference_init=False, synthetic_data=True,
        save=str(tmp_path / "logs"), save_freq=1, noplot=True,
    ).validate()
    # single-device -> mesh
    tr = Trainer(cfg, verbose=False)
    tr.train_epoch(0)
    tr.save()
    tr2 = Trainer(dataclasses.replace(cfg, network=CKPT_NAME),
                  mesh=make_mesh2d(4, 2), verbose=False)
    assert int(tr2.state.epoch) == int(tr.state.epoch)
    stats = tr2.train_epoch(1)
    assert np.isfinite(stats["loss_d_mean"])
    # mesh -> single-device
    tr2.save()
    tr3 = Trainer(dataclasses.replace(cfg, network=CKPT_NAME), verbose=False)
    assert int(tr3.state.epoch) == int(tr2.state.epoch)
    for a, b in zip(jax.tree.leaves(tr2.state.params_g),
                    jax.tree.leaves(tr3.state.params_g)):
        np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                      np.asarray(b))
    stats = tr3.train_epoch(2)
    assert np.isfinite(stats["loss_d_mean"])
