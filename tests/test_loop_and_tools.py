"""Integration tests: checkpoint round-trip, trainer epochs, sampler
pipeline, AE/denoiser trainers, inference utilities."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.config import SampleConfig, TrainConfig
from facegen.models import gan
from facegen.train.step import init_state
from facegen.utils import checkpoint as ckpt
from facegen.utils.grids import to_grid
from facegen.utils.infer import GanInference, nearest_neighbours, sanity_image


def tiny_cfg(tmp_path, **kw):
    base = dict(
        batch_size=8, scale=16, grayscale=True, noise_dim=16, n_epoch=8,
        compute_dtype="float32", reference_init=False, synthetic_data=True,
        save=str(tmp_path / "logs"), save_freq=1, noplot=False, epochs=1,
    )
    base.update(kw)
    return TrainConfig(**base).validate()


# ---------------------------------------------------------------------------
# checkpoint
# ---------------------------------------------------------------------------


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg(tmp_path)
    g, d, bundle = gan.init_gan(jax.random.key(0), cfg.scale, cfg.channels,
                                cfg.noise_dim, reference_init=False)
    state = init_state(cfg, bundle)
    path = ckpt.save(str(tmp_path), "net", state,
                     meta={"epoch": 7, **ckpt.config_meta(cfg)})
    assert os.path.exists(os.path.join(path, "arrays.npz"))
    g2, d2, bundle2 = gan.init_gan(jax.random.key(99), cfg.scale, cfg.channels,
                                   cfg.noise_dim, reference_init=False)
    template = init_state(cfg, bundle2)
    restored, meta = ckpt.load(str(tmp_path), "net", template)
    assert meta["epoch"] == 7
    assert meta["config"]["batch_size"] == cfg.batch_size
    for a, b in zip(jax.tree.leaves(restored.params_g), jax.tree.leaves(state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_rotation(tmp_path):
    state = {"w": jnp.ones((3,))}
    ckpt.save(str(tmp_path), "net", state)
    ckpt.save(str(tmp_path), "net", {"w": jnp.zeros((3,))})
    assert os.path.exists(os.path.join(str(tmp_path), "net.old", "arrays.npz"))
    old, _ = ckpt.load(str(tmp_path), "net.old", state)
    np.testing.assert_array_equal(np.asarray(old["w"]), np.ones(3))
    new, _ = ckpt.load(str(tmp_path), "net", state)
    np.testing.assert_array_equal(np.asarray(new["w"]), np.zeros(3))


def test_orbax_backend_roundtrip(tmp_path):
    tree = {"w": jnp.arange(6.0).reshape(2, 3), "n": jnp.int32(7)}
    ckpt.save_orbax(str(tmp_path), "net", tree, meta={"epoch": 3})
    template = {"w": jnp.zeros((2, 3)), "n": jnp.int32(0)}
    restored, meta = ckpt.load_orbax(str(tmp_path), "net", template)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.asarray(tree["w"]))
    assert int(restored["n"]) == 7


def test_checkpoint_missing_leaf_strict(tmp_path):
    ckpt.save(str(tmp_path), "net", {"a": jnp.ones(2)})
    with pytest.raises(KeyError):
        ckpt.load(str(tmp_path), "net", {"a": jnp.ones(2), "b": jnp.ones(3)})


# ---------------------------------------------------------------------------
# trainer loop
# ---------------------------------------------------------------------------


def test_trainer_epoch_and_resume(tmp_path):
    from facegen.train.loop import CKPT_NAME, Trainer

    cfg = tiny_cfg(tmp_path)
    tr = Trainer(cfg, verbose=False)
    stats = tr.train_epoch(0)
    assert stats["epoch"] == 1
    assert np.isfinite(stats["loss_d_mean"]) and np.isfinite(stats["loss_g_mean"])
    assert stats["trained_d"] + stats["not_trained_d"] > 0
    # save_freq=1 -> checkpoint written; viz grids dumped
    assert ckpt.exists(cfg.save, CKPT_NAME)
    for f in ["samples_fixed.png", "best50.png", "worst50.png", "real100.png"]:
        assert os.path.exists(os.path.join(cfg.save, "viz", f)), f

    # resume into a fresh trainer: epoch + params carried over
    cfg2 = tiny_cfg(tmp_path, network=CKPT_NAME)
    tr2 = Trainer(cfg2, verbose=False)
    assert int(tr2.state.epoch) == int(tr.state.epoch)
    for a, b in zip(jax.tree.leaves(tr2.state.params_g), jax.tree.leaves(tr.state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_rejects_noise_view_mismatch(tmp_path):
    """The nchw/nhwc noise views share an identical parameter-free tree
    (tests/test_models.py), so a mismatched resume cannot fail on shapes
    — Trainer.resume must check the checkpoint's stored noise_view and
    refuse, else training silently continues with scrambled fc wiring."""
    from facegen.train.loop import CKPT_NAME, Trainer

    cfg = tiny_cfg(tmp_path, noise_view="nchw")
    tr = Trainer(cfg, verbose=False)
    tr.train_epoch(0)  # save_freq=1 -> checkpoint written

    cfg2 = tiny_cfg(tmp_path, noise_view="nhwc", network=CKPT_NAME)
    with pytest.raises(ValueError, match="noise_view"):
        Trainer(cfg2, verbose=False)

    # matching view resumes fine
    cfg3 = tiny_cfg(tmp_path, noise_view="nchw", network=CKPT_NAME)
    tr3 = Trainer(cfg3, verbose=False)
    assert int(tr3.state.epoch) == int(tr.state.epoch)


def test_run_resume_continues_rng_stream(tmp_path):
    """run() after a --network resume must CONTINUE the per-epoch RNG
    stream from the restored epoch counter (review fix: restarting at
    index 0 replayed the original run's pools and noise verbatim).
    1-epoch-then-resume-1 must equal a straight 2-epoch run()."""
    from facegen.train.loop import CKPT_NAME, Trainer

    # epochs_per_compile pinned to 1: under --noplot the auto mode would
    # take the CHUNKED path for the straight run but the sequential path
    # for the 1-epoch parts, and chunked-vs-sequential is RNG-equivalent
    # but not bitwise identical (different XLA program structure)
    cfg = tiny_cfg(tmp_path, noplot=True, save_freq=1000, epochs=-1,
                   epochs_per_compile=1)
    straight = Trainer(cfg, verbose=False)
    list(straight.run(epochs=2))

    cfg_a = tiny_cfg(tmp_path, noplot=True, save_freq=1000, epochs=-1,
                     epochs_per_compile=1, save=str(tmp_path / "logs_r"))
    part1 = Trainer(cfg_a, verbose=False)
    list(part1.run(epochs=1))  # bounded run saves at exit
    cfg_b = tiny_cfg(tmp_path, noplot=True, save_freq=1000, epochs=-1,
                     epochs_per_compile=1,
                     save=str(tmp_path / "logs_r"), network=CKPT_NAME)
    part2 = Trainer(cfg_b, verbose=False)
    stats = list(part2.run(epochs=1))
    assert stats[0]["epoch"] == 2
    for a, b in zip(jax.tree.leaves(straight.state.params_g),
                    jax.tree.leaves(part2.state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ae_rejects_sub_batch_pool(tmp_path):
    """A pool smaller than batchSize would yield ZERO batches and train
    nothing while logging loss 0.0 — both AE trainers must refuse."""
    import pytest

    from facegen.train.ae_loop import train_autoencoder, train_denoiser

    cfg = tiny_cfg(tmp_path, batch_size=32, n_epoch=16, noplot=True)
    with pytest.raises(ValueError, match="smaller than"):
        train_autoencoder(cfg, epochs=1, verbose=False)
    with pytest.raises(ValueError, match="smaller than"):
        train_denoiser(cfg, epochs=1, verbose=False)


def test_trainer_on_packed_store(tmp_path):
    """Full path with a real packed dataset: fake LFW jpegs -> builder ->
    make_source(dataset_dir) -> Trainer epoch (store gather + prefetch)."""
    import numpy as np
    from PIL import Image

    from facegen.data import lfw
    from facegen.data.pipeline import make_source
    from facegen.train.loop import Trainer

    rng = np.random.RandomState(0)
    d = tmp_path / "lfw" / "Person_A"
    d.mkdir(parents=True)
    for i in range(24):
        Image.fromarray(rng.randint(0, 256, (250, 250, 3)).astype(np.uint8)).save(
            d / f"img_{i:04d}.jpg"
        )
    store_path = str(tmp_path / "packed.npy")
    lfw.build_dataset(str(tmp_path / "lfw"), store_path)

    cfg = tiny_cfg(tmp_path, synthetic_data=False, dataset_dir=store_path,
                   noplot=True, n_epoch=8)
    src = make_source(cfg)
    assert src.store is not None and src.size == 24
    tr = Trainer(cfg, source=src, verbose=False)
    s1 = tr.train_epoch(0)
    s2 = tr.train_epoch(1)  # second epoch consumes the host prefetch
    assert np.isfinite(s1["loss_d_mean"]) and np.isfinite(s2["loss_d_mean"])


def test_resume_is_bit_exact(tmp_path):
    """Training N epochs straight == training k, checkpointing,
    restoring into a fresh Trainer, and training N-k more. Catches any
    state not captured by the checkpoint (optimizer moments, gate ring,
    BN stats, epoch counter)."""
    from facegen.train.loop import CKPT_NAME, Trainer

    cfg = tiny_cfg(tmp_path, noplot=True, save_freq=1000)
    straight = Trainer(cfg, verbose=False)
    straight.train_epoch(0)
    straight.train_epoch(1)

    cfg_a = tiny_cfg(tmp_path, noplot=True, save_freq=1000,
                     save=str(tmp_path / "logs_b"))
    part1 = Trainer(cfg_a, verbose=False)
    part1.train_epoch(0)
    part1.save()
    cfg_b = tiny_cfg(tmp_path, noplot=True, save_freq=1000,
                     save=str(tmp_path / "logs_b"), network=CKPT_NAME)
    part2 = Trainer(cfg_b, verbose=False)
    part2.train_epoch(1)  # same epoch_idx the straight run used

    for a, b in zip(jax.tree.leaves(straight.state.params_g),
                    jax.tree.leaves(part2.state.params_g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(straight.state.opt_d),
                    jax.tree.leaves(part2.state.opt_d)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(straight.state.epoch) == int(part2.state.epoch)


def test_trainer_parallel_smoke(tmp_path):
    from facegen.parallel import make_mesh
    from facegen.train.loop import Trainer

    cfg = tiny_cfg(tmp_path, batch_size=16, noplot=True)
    mesh = make_mesh((-1,))
    tr = Trainer(cfg, mesh=mesh, verbose=False)
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss_d_mean"])


def test_trainer_gspmd_2d_mesh_smoke(tmp_path):
    # --meshShape 4,2 path: params sharded on the model axis, pool on data
    import jax as _jax

    from facegen.parallel import make_mesh2d
    from facegen.train.loop import Trainer

    cfg = tiny_cfg(tmp_path, batch_size=16, noplot=True)
    tr = Trainer(cfg, mesh=make_mesh2d(4, 2), verbose=False)
    w = tr.state.params_g["03_upconv1"]["w"]
    assert w.sharding.spec == _jax.sharding.PartitionSpec(None, None, None, "model")
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss_d_mean"])


# ---------------------------------------------------------------------------
# inference utils
# ---------------------------------------------------------------------------


def test_rank_orders_by_score(tmp_path):
    cfg = tiny_cfg(tmp_path)
    g, d, bundle = gan.init_gan(jax.random.key(0), cfg.scale, cfg.channels,
                                cfg.noise_dim, reference_init=False)
    inf = GanInference(g, d, cfg.noise_dim, "float32")
    imgs = inf.generate_n(bundle, jax.random.key(1), 32)
    ranked, scores = inf.rank(bundle, imgs, ascending=False)
    s = np.asarray(scores)
    assert (np.diff(s) <= 1e-6).all()
    ranked_a, scores_a = inf.rank(bundle, imgs, ascending=True, max_out=5)
    assert len(scores_a) == 5
    assert float(scores_a[0]) <= float(scores[0])


def test_sanity_image_structure():
    img = np.asarray(sanity_image(16, 1, jax.random.key(0)))
    assert img.shape == (16, 16, 1)
    np.testing.assert_allclose(np.diag(img[:, :, 0]), 1.0)
    assert img.max() <= 1.0 and img.min() >= 0.0
    # lattice dots at the reference's 1-based multiples of 4
    # (nn_utils.lua:165) = 0-based rows/cols 3, 7, 11, 15, off-diagonal
    for i, j in [(3, 7), (7, 3), (11, 15), (15, 3)]:
        assert img[i, j, 0] == 0.5


def test_nearest_neighbours_exact():
    data = np.random.RandomState(0).rand(100, 4, 4, 1).astype(np.float32)
    queries = jnp.asarray(data[[7, 42, 99]] + 0.001)
    idx, dist = nearest_neighbours(queries, data, k=1)
    np.testing.assert_array_equal(idx[:, 0], [7, 42, 99])
    assert (dist[:, 0] < 0.02).all()


def test_nearest_neighbours_uint8_queries_normalized():
    """uint8 queries must get the same /255 normalization as a uint8
    dataset (review fix: mixed scales silently returned garbage —
    querying a dataset with its own rows gave distance ~2000, not 0)."""
    data = np.random.RandomState(1).randint(0, 256, (50, 4, 4, 3), np.uint8)
    idx, dist = nearest_neighbours(data[[3, 17]], data, k=1)
    np.testing.assert_array_equal(idx[:, 0], [3, 17])
    np.testing.assert_allclose(dist[:, 0], 0.0, atol=1e-4)


def test_to_grid_geometry():
    imgs = np.zeros((5, 4, 4, 3), np.float32)
    grid = to_grid(imgs, nrow=3, padding=1)
    assert grid.shape == (2 * 5 + 1, 3 * 5 + 1, 3)


# ---------------------------------------------------------------------------
# sampler end-to-end
# ---------------------------------------------------------------------------


def test_sampler_end_to_end(tmp_path):
    from facegen.sample import run_sampling
    from facegen.train.loop import Trainer

    cfg = tiny_cfg(tmp_path, noplot=True)
    tr = Trainer(cfg, verbose=False)
    tr.save()
    scfg = SampleConfig(
        save=cfg.save, scale=cfg.scale, grayscale=True, noise_dim=cfg.noise_dim,
        writeto=str(tmp_path / "samples"), runs=1, neighbours=True, seed=2,
    )
    dataset = np.asarray(tr.source.epoch_pool(jax.random.key(5), 64))
    outputs = run_sampling(scfg, dataset=dataset, verbose=False)
    names = {os.path.basename(o) for o in outputs}
    assert {
        "random1024_0001_base.png", "random256_0001_base.png",
        "best_0001_base.png", "worst_0001_base.png", "random_0001_base.png",
        "best_0001_neighbours_base.png",
    } <= names
    for o in outputs:
        assert os.path.getsize(o) > 0


# ---------------------------------------------------------------------------
# AE / denoiser trainers
# ---------------------------------------------------------------------------


def test_trainer_with_denoise_hook(tmp_path):
    """train.py --denoise path: train a denoiser first, then the GAN
    trainer loads AE1_DECODER and dumps denoised sample grids
    (train.lua:101-110 + nn_utils.lua:146-155)."""
    from facegen.train.ae_loop import train_denoiser
    from facegen.train.loop import Trainer

    cfg = tiny_cfg(tmp_path, n_epoch=16, batch_size=8, scale=16)
    train_denoiser(cfg, epochs=1, verbose=False)
    cfg2 = tiny_cfg(tmp_path, denoise=True)
    tr = Trainer(cfg2, verbose=False)
    assert tr.denoiser is not None
    tr.train_epoch(0)
    assert os.path.exists(os.path.join(cfg2.save, "viz", "samples_denoised.png"))


def test_autoencoder_trains_and_loss_decreases(tmp_path):
    from facegen.train.ae_loop import train_autoencoder

    cfg = tiny_cfg(tmp_path, n_epoch=256, batch_size=16)
    model, params, state, hist = train_autoencoder(cfg, epochs=3, verbose=False)
    assert hist[-1]["loss"] < hist[0]["loss"]


def test_denoiser_trains_and_saves_bundle_keys(tmp_path):
    from facegen.models.ae import denoiser_ckpt_name
    from facegen.train.ae_loop import train_denoiser

    cfg = tiny_cfg(tmp_path, n_epoch=128, batch_size=16, scale=16)
    mods, bundle, hist = train_denoiser(cfg, epochs=1, verbose=False)
    assert set(bundle) == {"AE1_ENCODER", "AE1_DECODER", "AE2_DECODER"}
    assert np.isfinite(hist[-1]["val_loss"])
    assert ckpt.exists(cfg.save, denoiser_ckpt_name(16, 1))


def test_ae_weight_penalty_math():
    """_weight_penalty matches train_autoencoder.lua:196-204's closed
    form on the flat param vector (biases included)."""
    from facegen.train.ae_loop import _weight_penalty

    k1, k2 = jax.random.split(jax.random.key(0))
    params = {"w": jax.random.normal(k1, (5, 3)), "b": jax.random.normal(k2, (3,))}
    grads = jax.tree.map(jnp.zeros_like, params)
    c1, c2 = 0.013, 0.07
    loss, g = _weight_penalty(jnp.float32(0.0), grads, params, c1, c2)
    flat = np.concatenate([np.asarray(params["b"]).ravel(),
                           np.asarray(params["w"]).ravel()])
    want = c1 * np.abs(flat).sum() + 0.5 * c2 * (flat ** 2).sum()
    np.testing.assert_allclose(float(loss), want, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(g["w"]),
        np.sign(np.asarray(params["w"])) * c1 + np.asarray(params["w"]) * c2,
        rtol=1e-6)


@pytest.mark.parametrize("kw", [dict(coef_l1=0.01), dict(coef_l2=0.01)])
def test_ae_coef_penalty_changes_training(tmp_path, kw):
    """--coefL1/--coefL2 are live in the AE trainer and shrink weights
    relative to the unpenalized run (train_autoencoder.lua:196-204)."""
    from facegen.train.ae_loop import train_autoencoder

    cfg0 = tiny_cfg(tmp_path, n_epoch=64, batch_size=16, noplot=True)
    _, p0, _, h0 = train_autoencoder(cfg0, epochs=1, verbose=False)
    cfg1 = tiny_cfg(tmp_path, n_epoch=64, batch_size=16, noplot=True, **kw)
    _, p1, _, h1 = train_autoencoder(cfg1, epochs=1, verbose=False)
    l0 = jax.tree.leaves(p0)
    l1 = jax.tree.leaves(p1)
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))
    # penalty adds to the reported loss (f += ..., same as the reference)
    assert h1[0]["loss"] > h0[0]["loss"]


def test_denoiser_reported_loss_excludes_penalty(tmp_path):
    """The denoiser's per-epoch AE1/AE2 losses are the bare BCE: the
    reference accumulates CRITERION.output BEFORE the penalty is added
    (train_denoiser.lua:272,311), so a weight penalty must steer the
    gradients (different params) without inflating the reported loss
    the way train_autoencoder's `f += ...` does."""
    from facegen.train.ae_loop import train_denoiser

    base = dict(n_epoch=64, batch_size=16, scale=16, noplot=True)
    cfg0 = tiny_cfg(tmp_path, **base)
    _, b0, h0 = train_denoiser(cfg0, epochs=1, verbose=False)
    cfg1 = tiny_cfg(tmp_path, coef_l2=0.05, **base)
    _, b1, h1 = train_denoiser(cfg1, epochs=1, verbose=False)
    l0 = jax.tree.leaves(b0["AE1_DECODER"]["params"])
    l1 = jax.tree.leaves(b1["AE1_DECODER"]["params"])
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))
    # with the penalty in the report, loss_ae1 would jump by
    # ~coef*||params||^2/2 >> the BCE drift between the two runs
    assert abs(h1[0]["loss_ae1"] - h0[0]["loss_ae1"]) < 0.05


def test_denoiser_ae_clamp_is_live_and_is_a_clamp(tmp_path):
    """AE_clamp defaults ON (train_denoiser.lua:30): a tiny clamp
    squashes every gradient toward 0 and (with Adam's eps dominating)
    freezes training, while clamp-off trains — so the clip is live in
    the compiled epoch; and a huge clamp is numerically a no-op
    (train_denoiser.lua:289-291). The op itself is pinned as a pure
    elementwise clip at the unit level — end-to-end equality of
    clamp-off vs huge-clamp is NOT a stable contract: the clip changes
    XLA's fusion choices and Adam amplifies the ~2e-6 float drift
    through the epoch."""
    from facegen.train.ae_loop import train_denoiser

    base = dict(n_epoch=64, batch_size=16, scale=16, noplot=True)
    assert tiny_cfg(tmp_path, **base).ae_clamp == 1.0  # reference default
    cfg_tiny = tiny_cfg(tmp_path, ae_clamp=1e-30, **base)
    _, b_tiny, _ = train_denoiser(cfg_tiny, epochs=1, verbose=False)
    cfg_off = tiny_cfg(tmp_path, ae_clamp=0.0, **base)
    _, b_off, _ = train_denoiser(cfg_off, epochs=1, verbose=False)
    from facegen.models.ae import init_denoiser

    _, _, _, b0 = init_denoiser(jax.random.key(cfg_off.seed), 16, 1)
    move = lambda b: max(
        float(jnp.max(jnp.abs(a - c)))
        for a, c in zip(jax.tree.leaves(b["AE1_DECODER"]["params"]),
                        jax.tree.leaves(b0["AE1_DECODER"]["params"])))
    assert move(b_tiny) < 1e-5          # clamped to ~0-grad: frozen
    assert move(b_off) > 1e-3           # unclamped: trains
    from facegen.train.ae_loop import _clamp_grads

    g = {"w": jnp.array([-3.0, -0.5, 0.0, 0.7, 2.5])}
    np.testing.assert_array_equal(
        np.asarray(_clamp_grads(g, 1.0)["w"]),
        np.array([-1.0, -0.5, 0.0, 0.7, 1.0], np.float32))


def test_denoiser_network_resume(tmp_path):
    """--network resumes the denoiser: restores the three sub-bundles
    and continues the epoch count (train_denoiser.lua:67-77); the
    optimizer state starts fresh like the reference's OPTSTATE = {}."""
    from facegen.models.ae import denoiser_ckpt_name, init_denoiser
    from facegen.train.ae_loop import train_denoiser

    cfg = tiny_cfg(tmp_path, n_epoch=64, batch_size=16, scale=16, noplot=True)
    _, b1, _ = train_denoiser(cfg, epochs=1, verbose=False)
    # value honored as a name; a stale sentinel falls back to the
    # standard checkpoint (the reference ignores the value entirely).
    # Each resumed epoch re-checkpoints, so the expected epoch advances.
    for i, net in enumerate((denoiser_ckpt_name(16, 1), "resume-please")):
        cfg2 = tiny_cfg(tmp_path, n_epoch=64, batch_size=16, scale=16,
                        noplot=True, network=net)
        _, b2, hist = train_denoiser(cfg2, epochs=1, verbose=False)
        assert hist[0]["epoch"] == 2 + i  # continued, not restarted
    # resumed run really started from the saved params, not fresh init
    _, _, _, b0 = init_denoiser(jax.random.key(cfg.seed), 16, 1)
    diff_saved = sum(
        float(jnp.sum(jnp.abs(a - b))) for a, b in
        zip(jax.tree.leaves(b2["AE1_DECODER"]["params"]),
            jax.tree.leaves(b1["AE1_DECODER"]["params"])))
    diff_fresh = sum(
        float(jnp.sum(jnp.abs(a - b))) for a, b in
        zip(jax.tree.leaves(b2["AE1_DECODER"]["params"]),
            jax.tree.leaves(b0["AE1_DECODER"]["params"])))
    assert diff_saved < diff_fresh


def test_denoise_hook_loads_ae1_decoder(tmp_path):
    from facegen.models.ae import load_denoiser_fn
    from facegen.train.ae_loop import train_denoiser

    cfg = tiny_cfg(tmp_path, n_epoch=64, batch_size=16, scale=16)
    train_denoiser(cfg, epochs=1, verbose=False)
    fn = load_denoiser_fn(cfg)
    x = jnp.ones((2, 16, 16, 1), jnp.float32) * 0.5
    y = fn(x)
    assert y.shape == (2, 16, 16, 1)
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0


def test_weights_vis_freq_batch_cadence(tmp_path):
    """weightsVisFreq > 0 dumps activation grids every N batches
    (adversarial.lua:296-299), and the segmented epoch follows the same
    math/RNG stream as the single-scan epoch: per-step metrics match
    (params drift at float-noise level through BN sensitivity across
    differently-fused programs, so the contract is on the metrics)."""
    from facegen.train.loop import Trainer

    # 8 examples / (batch 8 advancing by 4) = 2 steps; freq 1 -> 2 dumps
    cfg = tiny_cfg(tmp_path, n_epoch=8, noplot=True, weights_vis_freq=1)
    tr = Trainer(cfg, verbose=False)
    s1 = tr.train_epoch(0)
    netvis_root = os.path.join(cfg.save, "viz", "netvis")
    dumps = sorted(os.listdir(netvis_root))
    assert dumps == ["e0001_s00001", "e0001_s00002"]
    # D16d has no top-level conv/linear >=150 outputs (reference quirk:
    # nested branch layers are not descended into), but G's pyramid dumps
    assert any(f.endswith(".png") for f in os.listdir(
        os.path.join(netvis_root, dumps[0], "g")))

    cfg2 = tiny_cfg(tmp_path, n_epoch=8, noplot=True,
                    save=str(tmp_path / "logs_ref"))
    tr2 = Trainer(cfg2, verbose=False)
    s2 = tr2.train_epoch(0)
    assert s1["trained_d"] == s2["trained_d"]
    assert s1["not_trained_d"] == s2["not_trained_d"]
    np.testing.assert_allclose(s1["loss_d_mean"], s2["loss_d_mean"], rtol=1e-4)
    np.testing.assert_allclose(s1["loss_g_mean"], s2["loss_g_mean"], rtol=1e-4)
    assert int(tr.state.epoch) == int(tr2.state.epoch)


def test_weights_vis_freq_batch_cadence_on_gspmd_mesh(tmp_path):
    """The GSPMD mesh keeps the reference's weightsVisFreq *batch*
    cadence (adversarial.lua:296-299): the segmented epoch runs
    sharded and dumps per segment, not once per epoch."""
    import os

    from facegen.parallel import make_mesh2d
    from facegen.train.loop import Trainer

    cfg = tiny_cfg(tmp_path, n_epoch=16, batch_size=16, noplot=True,
                   weights_vis_freq=1)
    tr = Trainer(cfg, mesh=make_mesh2d(4, 2), verbose=False)
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss_d_mean"])
    netvis_root = os.path.join(cfg.save, "viz", "netvis")
    dumps = sorted(os.listdir(netvis_root))
    # 16 examples / (batch 16 advancing 8) = 2 steps; freq 1 -> 2 dumps
    assert dumps == ["e0001_s00001", "e0001_s00002"]


def test_weights_vis_freq_batch_cadence_on_shard_map_mesh(tmp_path):
    """Same batch cadence on the 1-D shard_map mesh (per-chip local
    batches, psum'd updates) — no once-per-epoch fallback remains."""
    import os

    from facegen.parallel import make_mesh
    from facegen.train.loop import Trainer

    cfg = tiny_cfg(tmp_path, n_epoch=16, batch_size=16, noplot=True,
                   weights_vis_freq=1)
    tr = Trainer(cfg, mesh=make_mesh((-1,)), verbose=False)
    stats = tr.train_epoch(0)
    assert np.isfinite(stats["loss_d_mean"])
    netvis_root = os.path.join(cfg.save, "viz", "netvis")
    assert sorted(os.listdir(netvis_root)) == ["e0001_s00001", "e0001_s00002"]


def test_ae_bounded_run_saves_final_checkpoint(tmp_path):
    """A bounded AE run shorter than the save-every-50 cadence must not
    exit unsaved (the repo rule Trainer.run documents)."""
    from facegen.models.ae import AE_CKPT_NAME
    from facegen.train.ae_loop import train_autoencoder
    from facegen.utils import checkpoint as ckpt

    cfg = tiny_cfg(tmp_path, n_epoch=32, batch_size=8, scale=16, noplot=True)
    train_autoencoder(cfg, epochs=1, verbose=False)
    assert ckpt.exists(cfg.save, AE_CKPT_NAME)


def test_denoiser_validation_is_heldout(tmp_path):
    """The denoiser's validation pool must come from rows the training
    draws cannot touch (train_denoiser.lua:153-156 disjoint split)."""
    import dataclasses

    from facegen.data.pipeline import make_source
    from facegen.train.ae_loop import train_denoiser

    cfg = tiny_cfg(tmp_path, n_epoch=32, batch_size=8, scale=16, noplot=True)
    cfg = dataclasses.replace(cfg, synthetic_data=False,
                              dataset_dir=str(tmp_path / "store.npy"))
    # a tiny packed store: 300 distinct rows
    rng = np.random.RandomState(0)
    np.save(tmp_path / "store.npy",
            rng.randint(0, 256, (300, 64, 64, 3), dtype=np.uint8))
    _, _, hist = train_denoiser(cfg, epochs=1, verbose=False)
    assert np.isfinite(hist[0]["val_loss"])
    # the default source reserves the first 256 rows: training draws
    # must start at the holdout boundary
    src = make_source(cfg, holdout=256)
    assert src.size == 300 - 256


def test_c2f_resume_restores_best_parzen(tmp_path):
    from facegen.train.c2f import C2FTrainer, ckpt_name

    cfg = tiny_cfg_c2f(tmp_path)
    tr = C2FTrainer(cfg, verbose=False)
    tr.train_epoch(0)  # saves a .bestnet with meta['parzen']
    best = tr.best_dist
    assert np.isfinite(best)

    import dataclasses

    cfg2 = dataclasses.replace(cfg, network=ckpt_name(cfg))
    tr2 = C2FTrainer(cfg2, verbose=False)
    assert tr2.best_dist == best  # watermark restored, not inf


def tiny_cfg_c2f(tmp_path):
    from facegen.config import C2FConfig

    return C2FConfig(batch_size=8, coarse_size=4, fine_size=8, grayscale=True,
                     n_epoch=16, compute_dtype="float32", synthetic_data=True,
                     seed=3, save=str(tmp_path / "logs"), save_freq=1,
                     val_size=16, parzen_samples=8).validate()


def test_trainer_unbounded_n_epoch_synthetic_is_sane(tmp_path):
    """n_epoch <= 0 with synthetic data used to resolve the pool size to
    a 1<<30 sentinel (petabyte pool request); now a finite default."""
    from facegen.train.loop import Trainer

    cfg = tiny_cfg(tmp_path, n_epoch=-1, noplot=True)
    tr = Trainer(cfg, verbose=False)
    assert tr.pool_n == 16_384


def test_show_model_content_both_path_forms(tmp_path, capsys):
    """show_model_content.py accepts --save DIR --network NAME (like
    train.py) and --network DIR/NAME (like every other CLI)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import show_model_content
    from facegen.train.loop import Trainer

    cfg = tiny_cfg(tmp_path, noplot=True)
    Trainer(cfg, verbose=False).save()

    show_model_content.main(["--save", cfg.save, "--network", "adversarial"])
    out1 = capsys.readouterr().out
    show_model_content.main(["--network", os.path.join(cfg.save, "adversarial")])
    out2 = capsys.readouterr().out
    for out in (out1, out2):
        assert "epoch:" in out and "params_g" in out
    assert out1.splitlines()[1:] == out2.splitlines()[1:]  # same content


def test_headtohead_report_helpers(tmp_path):
    """Pure helpers of the head-to-head scorer: snapshot discovery and
    wall-clock lookup (the equal-wallclock row reads both trainers'
    `elapsed` fields; on resume a re-trained epoch appears twice and the
    LAST row must win)."""
    import json
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools import headtohead_report as hr

    for e in (10, 2, 30):
        (tmp_path / f"proxy_ep{e:05d}.pt").write_bytes(b"")
    (tmp_path / "proxy_latest.pt").write_bytes(b"")
    assert hr.proxy_epochs(str(tmp_path)) == [2, 10, 30]

    rows = [
        {"epoch": 1, "elapsed": 100.0},
        {"epoch": 2, "elapsed": 200.0},
        {"epoch": 2, "elapsed": 350.0},  # resumed re-train of epoch 2
        {"epoch": 3},                    # no elapsed field -> ignored
    ]
    with open(tmp_path / "train_log.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("not json\n")
    assert hr.log_elapsed(str(tmp_path), 2) == 350.0
    assert hr.log_elapsed(str(tmp_path), 3) is None
    assert hr.log_elapsed(str(tmp_path / "missing"), 1) is None


def test_seed_spread_merge_survives_checkpoint_loss(tmp_path):
    """`seed_spread_report --merge` must carry previously-scored rows
    forward even when every checkpoint behind them is gone from disk
    (logs/ lives outside git; the round-5 environment reset wiped it).
    Regression: the old merge consulted the artifact only for save dirs
    still present on disk, silently dropping all committed rows."""
    import json
    import sys

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools import seed_spread_report as ssr

    store = tmp_path / "store.npy"
    np.save(store, np.zeros((16, 8, 8, 3), np.uint8))

    fg_rows = {
        "logs/gone_a": {"frechet_pixels_vs_real": 10.0, "nn_distance_mean": 1.0},
        "logs/gone_b": {"frechet_pixels_vs_real": 20.0, "nn_distance_mean": 2.0},
    }
    px_rows = {"main": {"frechet_pixels_vs_real": 15.0, "nn_distance_mean": 1.5}}
    prev = {
        "setup": {"n": 8, "seed": 7},
        "budgets": {"10": {"images_seen": 10000,
                           "facegen": dict(fg_rows), "proxy": dict(px_rows)}},
    }
    out = tmp_path / "spread.json"
    out.write_text(json.dumps(prev))

    # no --facegen dir exists on disk, no --proxy given: everything must
    # come from the artifact (budget auto-selection included)
    ssr.main(["--merge", "--facegen", str(tmp_path / "nonexistent_*"),
              "--store", str(store), "--n", "8", "--out", str(out)])

    got = json.loads(out.read_text())
    assert got["partial"] is False
    row = got["budgets"]["10"]
    assert row["facegen"] == fg_rows
    assert row["proxy"] == px_rows
    s = row["facegen_frechet_summary"]
    assert s["n_runs"] == 2 and s["min"] == 10.0 and s["max"] == 20.0
    assert s["main_rank_among_facegen"] == "2/3"
