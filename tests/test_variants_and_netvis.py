"""Coverage for the remaining reference model variants and the
activation visualizer."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.models import c2f as c2f_models, gan
from facegen.nn.core import Ctx


@pytest.mark.parametrize(
    "factory,scale",
    [
        (gan.create_d16_b, 16),
        (gan.create_d16_c, 16),
    ],
    ids=["d16b", "d16c"],
)
def test_d16_variants_build_and_forward(factory, scale):
    m = factory(scale, 1)
    params, state, out = m.init(jax.random.key(0), (scale, scale, 1))
    assert out == (1,)
    y, _ = m.apply(params, state, jnp.ones((2, scale, scale, 1)),
                   Ctx(jax.random.key(1), False))
    assert y.shape == (2, 1)


def test_g_flat_variant():
    m = gan.create_g_flat(16, 1, 100)
    params, state, out = m.init(jax.random.key(0), (100,))
    assert out == (16, 16, 1)
    y, _ = m.apply(params, state, jnp.zeros((3, 100)), Ctx(None, False))
    assert y.shape == (3, 16, 16, 1)
    assert float(y.min()) >= 0 and float(y.max()) <= 1


@pytest.mark.parametrize(
    "factory",
    [c2f_models.create_g_a, c2f_models.create_g_b, c2f_models.create_g_c],
    ids=["ga", "gb", "gc"],
)
def test_c2f_g_variants(factory):
    m = factory(16, 1)
    z_shape, c_shape = (16, 16, 1), (16, 16, 1)
    params, state, out = m.init(jax.random.key(0), (z_shape, c_shape))
    assert out == (16, 16, 1)
    z = jnp.zeros((2, 16, 16, 1))
    c = jnp.zeros((2, 16, 16, 1))
    y, _ = m.apply(params, state, (z, c), Ctx(jax.random.key(1), False))
    assert y.shape == (2, 16, 16, 1)


@pytest.mark.parametrize(
    "factory",
    [c2f_models.create_d_a, c2f_models.create_d_b],
    ids=["da", "db"],
)
def test_c2f_d_variants(factory):
    m = factory(16, 1)
    params, state, out = m.init(jax.random.key(0), ((16, 16, 1), (16, 16, 1)))
    assert out == (1,)
    y, _ = m.apply(params, state,
                   (jnp.zeros((2, 16, 16, 1)), jnp.zeros((2, 16, 16, 1))),
                   Ctx(jax.random.key(1), False))
    assert y.shape == (2, 1)


def test_visualize_network_dumps_conv_and_fc(tmp_path):
    from facegen.utils.netvis import visualize_network

    d = gan.create_d(32, 1)
    params, state, _ = d.init(jax.random.key(0), (32, 32, 1))
    x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 1))
    # D32b is sequential at top level -> children exposed
    written = visualize_network(d, params, state, x, str(tmp_path))
    assert any("conv" in k for k in written)
    assert any("fc" in k for k in written)
    for p in written.values():
        assert os.path.getsize(p) > 0


def test_sequential_activations_shapes():
    from facegen.nn.core import sequential_activations

    g = gan.create_g(16, 1, 32)
    params, state, _ = g.init(jax.random.key(0), (32,))
    z = jnp.zeros((2, 32))
    out, acts = sequential_activations(g, params, state, z, Ctx(jax.random.key(1), False))
    assert out.shape == (2, 16, 16, 1)
    assert acts[-1][1].shape == (2, 16, 16, 1)
    keys = [k for k, _ in acts]
    assert any("upconv" in k for k in keys)
