"""Model-level parity tests: shapes, parameter counts vs the reference
architectures, init distribution, forward determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.models import gan
from facegen.nn import Ctx, param_count


@pytest.mark.parametrize("scale,channels", [(32, 1), (32, 3), (16, 1), (16, 3)])
def test_g_output_shape_and_range(scale, channels):
    g, d, bundle = gan.init_gan(jax.random.key(0), scale, channels, 100,
                                reference_init=False)
    z = jax.random.uniform(jax.random.key(1), (4, 100), minval=-1, maxval=1)
    imgs, _ = g.apply(bundle["params_g"], bundle["state_g"], z,
                      Ctx(jax.random.key(2), False))
    assert imgs.shape == (4, scale, scale, channels)
    assert float(imgs.min()) >= 0.0 and float(imgs.max()) <= 1.0  # sigmoid


@pytest.mark.parametrize("scale,channels", [(32, 1), (32, 3), (16, 1)])
def test_d_logit_output(scale, channels):
    g, d, bundle = gan.init_gan(jax.random.key(0), scale, channels, 100,
                                reference_init=False)
    x = jax.random.uniform(jax.random.key(1), (4, scale, scale, channels))
    logits, _ = d.apply(bundle["params_d"], bundle["state_d"], x,
                        Ctx(jax.random.key(2), False))
    assert logits.shape == (4, 1)


def _count_all(params):
    return sum(l.size for l in jax.tree_util.tree_leaves(params))


def test_g32_parameter_count_matches_reference():
    # Reference G32 (models.lua:57-81), grayscale:
    # Linear 100->8192 (827,392) + conv5x5 128->256 (819,456)
    # + conv5x5 256->128 (819,328) + conv3x3 128->1 (1,153)
    # + 2 BN (768) + 3 shared PReLU (3) = 2,468,100
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100)
    assert _count_all(bundle["params_g"]) == 2_468_100


def test_d32b_parameter_count_matches_reference():
    # Reference D32b (models.lua:382-416), grayscale:
    # convs 640 + 73,856 + 295,168 + 1,180,160
    # + fc 2048x512+512 + 512x512+512 + 512+1 + 6 shared PReLU = 2,862,087
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100)
    assert _count_all(bundle["params_d"]) == 2_862_087


def test_weights_only_count_matches_torch_accounting():
    # nn_utils.lua:281-290 counts only .weight tensors (incl. PReLU/BN
    # weight, excl. biases). G32 grayscale: 827,392-8,192 bias
    # + 819,456-256 + 819,328-128 + 1,153-1 + BN gammas 384 + PReLU 3.
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100)
    expected = (100 * 8192) + (25 * 128 * 256) + (25 * 256 * 128) + (9 * 128 * 1) \
        + 256 + 128 + 3
    assert param_count(bundle["params_g"], weights_only=True) == expected


def test_reference_init_distribution():
    # train.lua:137-138 gaussian overwrite: weights sigma=0.005, biases 0.001
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100, reference_init=True)
    w = np.asarray(bundle["params_g"]["00_fc"]["w"]).ravel()
    b = np.asarray(bundle["params_g"]["00_fc"]["b"]).ravel()
    assert abs(w.std() - 0.005) < 0.0005
    assert abs(b.std() - 0.001) < 0.0002
    # quirk b: PReLU slope also overwritten (~N(0,0.005^2)), not 0.25
    a = float(bundle["params_g"]["02_prelu"]["a"][0])
    assert abs(a) < 0.05


def test_modern_init_keeps_prelu_quarter():
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100, reference_init=False)
    assert float(bundle["params_g"]["02_prelu"]["a"][0]) == 0.25


def test_forward_deterministic():
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100)
    z = jax.random.uniform(jax.random.key(1), (2, 100), minval=-1, maxval=1)
    ctx = Ctx(jax.random.key(3), False)
    y1, _ = g.apply(bundle["params_g"], bundle["state_g"], z, ctx)
    y2, _ = g.apply(bundle["params_g"], bundle["state_g"], z, ctx)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_g_grads_flow_end_to_end():
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100,
                                reference_init=False)
    z = jax.random.uniform(jax.random.key(1), (4, 100), minval=-1, maxval=1)

    def loss(pg):
        imgs, _ = g.apply(pg, bundle["state_g"], z, Ctx(jax.random.key(2), True))
        logits, _ = d.apply(bundle["params_d"], bundle["state_d"], imgs,
                            Ctx(jax.random.key(4), True))
        return jnp.mean(logits)

    grads = jax.grad(loss)(bundle["params_g"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(jnp.isfinite(l).all() for l in leaves)
    # every layer receives signal
    nonzero = [float(jnp.abs(l).max()) > 0 for l in leaves]
    assert all(nonzero)


def test_d_variants():
    for factory, scale in [(gan.create_d16, 16), (gan.create_d32, 32)]:
        m = factory(scale, 1)
        params, state, out = m.init(jax.random.key(0), (scale, scale, 1))
        assert out == (1,)
        x = jnp.ones((2, scale, scale, 1))
        y, _ = m.apply(params, state, x, Ctx(jax.random.key(1), False))
        assert y.shape == (2, 1)


def test_g16_pyramid_starts_at_4():
    g = gan.create_g(16, 1, 100)
    params, state, out = g.init(jax.random.key(0), (100,))
    assert out == (16, 16, 1)
    # fc maps to 128*4*4 (models.lua:29)
    assert params["00_fc"]["w"].shape == (100, 128 * 4 * 4)


@pytest.mark.parametrize("scheme,scale_fn", [
    ("heuristic", lambda fi, fo: (1.0 / (3.0 * fi)) ** 0.5),
    ("xavier", lambda fi, fo: (2.0 / (fi + fo)) ** 0.5),
    ("xavier_caffe", lambda fi, fo: (1.0 / fi) ** 0.5),
    ("kaiming", lambda fi, fo: (4.0 / (fi + fo)) ** 0.5),
])
def test_init_scheme_scales_and_zeroed_biases(scheme, scale_fn):
    # weight-init.lua:40-75 dispatch + :70-72 bias zeroing. Weights are
    # uniform(-stdv, stdv) => empirical max ~= stdv and std ~= stdv/sqrt(3).
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100,
                                reference_init=False, scheme=scheme)
    pg = bundle["params_g"]
    # fc: fan_in=100, fan_out=128*8*8 (weight-init.lua:58-64)
    stdv = scale_fn(100, 128 * 8 * 8)
    w = np.asarray(pg["00_fc"]["w"]).ravel()
    assert abs(w.max() - stdv) / stdv < 0.02
    assert abs(w.std() - stdv / np.sqrt(3.0)) / stdv < 0.05
    # upconv1: conv fans use inC*k*k / outC*k*k (weight-init.lua:50-56)
    stdv_c = scale_fn(128 * 25, 256 * 25)
    wc = np.asarray(pg["03_upconv1"]["w"]).ravel()
    assert abs(np.abs(wc).max() - stdv_c) / stdv_c < 0.02
    # all G biases zeroed (weight-init.lua:70-72)
    for layer in ("00_fc", "09_conv_out"):
        assert float(np.abs(np.asarray(
            jax.tree_util.tree_leaves({k: v for k, v in pg[layer].items()
                                       if k == "b"})[0])).max()) == 0.0


@pytest.mark.smoke
def test_noise_view_nchw_matches_reference_wiring():
    """`noise_view="nchw"` reproduces nn.View(128,s0,s0) (models.lua:60):
    fc unit c*s0*s0 + y*s0 + x must feed plane c at pixel (y, x), and the
    param tree must be identical to the native nhwc view (permute is
    parameter-free), so checkpoints restore into either wiring."""
    g, _, bundle = gan.init_gan(jax.random.key(0), 32, 3, 100,
                                reference_init=False, noise_view="nchw")
    g2, _, b2 = gan.init_gan(jax.random.key(0), 32, 3, 100,
                             reference_init=False, noise_view="nhwc")
    assert jax.tree.structure(bundle["params_g"]) == jax.tree.structure(
        b2["params_g"])

    # isolate the view stage: make fc output the unit index itself
    s0 = 8
    flat = jnp.arange(128 * s0 * s0, dtype=jnp.float32)
    nchw = flat.reshape(128, s0, s0)
    nhwc_of_nchw = jnp.transpose(nchw, (1, 2, 0))
    from facegen.nn import layers as L
    view = L.permute((1, 2, 0))
    vp, vs, out_shape = view.init(jax.random.key(0), (128, s0, s0))
    assert out_shape == (s0, s0, 128)
    got, _ = view.apply(vp, vs, nchw[None], Ctx(None, False))
    got = got[0]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(nhwc_of_nchw))

    # end-to-end: G still produces valid images under the nchw view
    z = jax.random.uniform(jax.random.key(1), (2, 100), minval=-1, maxval=1)
    imgs, _ = g.apply(bundle["params_g"], bundle["state_g"], z,
                      Ctx(jax.random.key(2), False))
    assert imgs.shape == (2, 32, 32, 3)
