"""Generator export: NumPy-only serving forward matches the JAX model."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from facegen.export import NumpyGenerator, export_from_checkpoint, export_generator
from facegen.models import gan
from facegen.nn.core import Ctx


def test_numpy_generator_matches_jax(tmp_path):
    scale, channels, noise_dim = 16, 1, 32
    g, d, bundle = gan.init_gan(jax.random.key(0), scale, channels, noise_dim,
                                reference_init=False)
    path = export_generator(bundle, str(tmp_path / "gen.npz"), scale, channels,
                            noise_dim)
    gen = NumpyGenerator(path)
    z = np.asarray(jax.random.uniform(jax.random.key(1), (4, noise_dim),
                                      jnp.float32, -1, 1))
    ours = np.asarray(gen(z))
    ref, _ = g.apply(bundle["params_g"], bundle["state_g"], jnp.asarray(z),
                     Ctx(None, False))
    # measured CPU fp32 drift is ~6e-8; 1e-5 keeps wide margin while
    # catching any real semantic divergence
    np.testing.assert_allclose(ours, np.asarray(ref), rtol=1e-5, atol=1e-5)
    assert ours.shape == (4, scale, scale, channels)


def test_export_from_checkpoint_cli_path(tmp_path):
    from facegen.config import TrainConfig
    from facegen.train.loop import Trainer

    cfg = TrainConfig(
        batch_size=8, scale=16, grayscale=True, noise_dim=16, n_epoch=8,
        compute_dtype="float32", reference_init=False, synthetic_data=True,
        save=str(tmp_path / "logs"), noplot=True,
    ).validate()
    tr = Trainer(cfg, verbose=False)
    tr.train_epoch(0)
    tr.save()
    out = export_from_checkpoint(cfg.save, str(tmp_path / "gen.npz"))
    gen = NumpyGenerator(out)
    imgs = gen(np.random.RandomState(0).uniform(-1, 1, (2, 16)).astype(np.float32))
    assert imgs.shape == (2, 16, 16, 1)
    assert imgs.min() >= 0 and imgs.max() <= 1
    # exported forward matches the live trainer model
    z = np.random.RandomState(1).uniform(-1, 1, (2, 16)).astype(np.float32)
    live, _ = tr.g.apply(tr.state.params_g, tr.state.state_g, jnp.asarray(z),
                         Ctx(None, False))
    np.testing.assert_allclose(gen(z), np.asarray(live), rtol=1e-5, atol=1e-5)
