"""Checkpoint-driven model reconstruction (sample.lua:247-274 parity):
the checkpoint's own meta.json config rebuilds G/D with zero shape
flags; explicit flags are checked overrides; the c2f sampler CLI path
refines grids end-to-end from a c2f checkpoint."""

import os

import jax
import numpy as np
import pytest

from facegen.config import C2FConfig, SampleConfig, TrainConfig
from facegen.models import c2f as c2f_models
from facegen.models import gan
from facegen.train.c2f import init_c2f_state
from facegen.train.loop import Trainer
from facegen.utils import checkpoint as ckpt


def _save_base_checkpoint(tmp_path, scale=16, grayscale=True, noise_dim=16,
                          subdir="logs", seed=1):
    cfg = TrainConfig(
        batch_size=8, scale=scale, grayscale=grayscale, noise_dim=noise_dim,
        n_epoch=8, compute_dtype="float32", reference_init=False,
        synthetic_data=True, save=str(tmp_path / subdir), noplot=True,
        seed=seed,
    ).validate()
    tr = Trainer(cfg, verbose=False)
    tr.save()
    return cfg


def _save_c2f_checkpoint(save_dir, coarse=4, fine=8, grayscale=True, seed=0):
    cfg = C2FConfig(
        batch_size=8, coarse_size=coarse, fine_size=fine, grayscale=grayscale,
        compute_dtype="float32", synthetic_data=True, save=save_dir,
    ).validate()
    g, d, bundle = c2f_models.init_c2f(jax.random.key(seed), fine, cfg.channels)
    state = init_c2f_state(cfg, bundle)
    name = f"adversarial_c2f_{coarse}_to_{fine}"
    ckpt.save(save_dir, name, state, meta={"epoch": 1, **ckpt.config_meta(cfg)})
    return cfg, name


def test_restore_gan_zero_flags(tmp_path):
    cfg = _save_base_checkpoint(tmp_path)
    g, d, bundle, meta, res = gan.restore_gan(
        "adversarial", default_dir=cfg.save)
    assert res == {"scale": 16, "grayscale": True, "channels": 1,
                   "noise_dim": 16, "noise_view": "nhwc"}
    assert meta["config"]["scale"] == 16
    # the rebuilt G generates at the checkpoint's own shape
    from facegen.utils.infer import GanInference

    inf = GanInference(g, d, res["noise_dim"], "float32")
    imgs = inf.generate_n(bundle, jax.random.key(0), 4)
    assert imgs.shape == (4, 16, 16, 1)


def test_restore_gan_mismatch_errors(tmp_path):
    cfg = _save_base_checkpoint(tmp_path)
    with pytest.raises(ValueError, match="scale=16.*scale=32"):
        gan.restore_gan("adversarial", default_dir=cfg.save, scale=32)
    with pytest.raises(ValueError, match="noise_dim"):
        gan.restore_gan("adversarial", default_dir=cfg.save, noise_dim=100)
    # matching overrides are fine
    g, d, bundle, _, res = gan.restore_gan(
        "adversarial", default_dir=cfg.save, scale=16, grayscale=True)
    assert res["scale"] == 16


def test_sampler_zero_shape_flags(tmp_path):
    """Sampling a 16px grayscale checkpoint with NO shape flags works
    (VERDICT r2 item 3's acceptance criterion)."""
    from facegen.sample import load_models

    cfg = _save_base_checkpoint(tmp_path)
    scfg = SampleConfig(save=cfg.save, writeto=str(tmp_path / "samples"))
    assert scfg.scale is None and scfg.grayscale is None
    g, d, bundle, meta, resolved = load_models(scfg)
    assert resolved.scale == 16
    assert resolved.grayscale is True
    assert resolved.noise_dim == 16


def test_sampler_separate_d_checkpoint(tmp_path):
    """--D_base loads D from a DIFFERENT checkpoint than G's
    (sample.lua:255-257: a second torch.load when D_base ~= G_base)."""
    import jax.tree_util as jtu

    from facegen.sample import load_models

    cfg_g = _save_base_checkpoint(tmp_path, subdir="logs", seed=1)
    cfg_d = _save_base_checkpoint(tmp_path, subdir="logs2", seed=7)
    d_path = os.path.join(cfg_d.save, "adversarial")
    scfg = SampleConfig(save=cfg_g.save, d_network=d_path,
                        writeto=str(tmp_path / "samples"))
    g, d, bundle, meta, resolved = load_models(scfg)
    want_g, _, g_bundle, _, _ = gan.restore_gan("adversarial",
                                                default_dir=cfg_g.save)
    _, _, d_bundle, _, _ = gan.restore_gan("adversarial",
                                           default_dir=cfg_d.save)
    lg = jtu.tree_leaves(bundle["params_g"])
    ld = jtu.tree_leaves(bundle["params_d"])
    np.testing.assert_array_equal(lg[0], jtu.tree_leaves(g_bundle["params_g"])[0])
    np.testing.assert_array_equal(ld[0], jtu.tree_leaves(d_bundle["params_d"])[0])
    # the two runs' Ds genuinely differ, so the splice is observable
    assert not np.array_equal(ld[0], jtu.tree_leaves(g_bundle["params_d"])[0])


def test_sampler_separate_d_mismatch_errors(tmp_path):
    """An incompatible --D_base checkpoint errors with both values
    spelled out, not an opaque shape complaint."""
    from facegen.sample import load_models

    cfg_g = _save_base_checkpoint(tmp_path, subdir="logs", grayscale=True)
    cfg_d = _save_base_checkpoint(tmp_path, subdir="logs2", grayscale=False)
    scfg = SampleConfig(save=cfg_g.save,
                        d_network=os.path.join(cfg_d.save, "adversarial"),
                        writeto=str(tmp_path / "samples"))
    with pytest.raises(ValueError, match="grayscale"):
        load_models(scfg)


def test_restore_c2f_zero_flags(tmp_path):
    save_dir = str(tmp_path / "logs")
    ccfg, name = _save_c2f_checkpoint(save_dir)
    g, d, bundle, meta, res = c2f_models.restore_c2f(name, default_dir=save_dir)
    assert res == {"fine_size": 8, "coarse_size": 4, "grayscale": True,
                   "channels": 1}


def test_sampler_c2f_end_to_end(tmp_path):
    """--c2f refinement grids written next to the base grids
    (sample.lua:102-110 naming)."""
    from facegen.sample import run_sampling

    cfg = _save_base_checkpoint(tmp_path)
    _, c2f_name = _save_c2f_checkpoint(cfg.save)
    scfg = SampleConfig(
        save=cfg.save, writeto=str(tmp_path / "samples"), runs=1,
        c2f=True, c2f_network=c2f_name, c2f_tries=3,
    )
    outputs = run_sampling(scfg, verbose=False)
    names = {os.path.basename(o) for o in outputs}
    assert {"best_0001_c2f_8.png", "worst_0001_c2f_8.png",
            "random_0001_c2f_8.png"} <= names
    for o in outputs:
        assert os.path.getsize(o) > 0


def test_sampler_c2f_channel_mismatch_errors(tmp_path):
    from facegen.sample import run_sampling

    cfg = _save_base_checkpoint(tmp_path, grayscale=True)
    _, c2f_name = _save_c2f_checkpoint(cfg.save, grayscale=False)
    scfg = SampleConfig(save=cfg.save, writeto=str(tmp_path / "samples"),
                        c2f=True, c2f_network=c2f_name)
    with pytest.raises(ValueError, match="channels"):
        run_sampling(scfg, verbose=False)


def test_sampler_c2f_separate_d(tmp_path):
    """--D_c2f32 splices the refinement D from a second c2f checkpoint
    (sample.lua:266-269); geometry mismatch errors clearly."""
    from facegen.sample import run_sampling

    cfg = _save_base_checkpoint(tmp_path)
    _, c2f_name = _save_c2f_checkpoint(cfg.save, seed=0)
    other_dir = str(tmp_path / "logs2")
    _save_c2f_checkpoint(other_dir, seed=9)
    scfg = SampleConfig(
        save=cfg.save, writeto=str(tmp_path / "samples"), runs=1,
        c2f=True, c2f_network=c2f_name, c2f_tries=2,
        d_c2f_network=os.path.join(other_dir, c2f_name),
    )
    outputs = run_sampling(scfg, verbose=False)
    assert any(os.path.basename(o) == "best_0001_c2f_8.png" for o in outputs)
    # geometry mismatch: a fine_size-4 D against the fine_size-8 G
    _, small_name = _save_c2f_checkpoint(other_dir, coarse=2, fine=4)
    bad = SampleConfig(
        save=cfg.save, writeto=str(tmp_path / "samples"), runs=1,
        c2f=True, c2f_network=c2f_name,
        d_c2f_network=os.path.join(other_dir, small_name),
    )
    with pytest.raises(ValueError, match="fine_size"):
        run_sampling(bad, verbose=False)


def test_export_uses_checkpoint_config(tmp_path):
    """export_from_checkpoint needs no shape flags either."""
    from facegen.export import NumpyGenerator, export_from_checkpoint

    cfg = _save_base_checkpoint(tmp_path)
    out = export_from_checkpoint(cfg.save, str(tmp_path / "gen.npz"))
    gen = NumpyGenerator(out)
    assert (gen.scale, gen.channels, gen.noise_dim) == (16, 1, 16)
