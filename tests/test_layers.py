"""Unit tests for the layer zoo: shapes, semantics vs NumPy oracles,
gradients, train/eval behavior (SURVEY.md section 4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.nn import Ctx, layers as L, sequential, branches, param_count


def run(module, x, in_shape, train=False, seed=0):
    params, state, out_shape = module.init(jax.random.key(seed), in_shape)
    y, new_state = module.apply(params, state, x, Ctx(jax.random.key(seed + 1), train))
    return y, out_shape, params, new_state


def test_dense_shape_and_math():
    m = L.dense(7)
    x = jnp.ones((3, 5))
    y, out_shape, params, _ = run(m, x, (5,))
    assert out_shape == (7,)
    assert y.shape == (3, 7)
    np.testing.assert_allclose(y[0], params["w"].sum(0) + params["b"], rtol=1e-5)


def test_conv2d_same_padding_matches_numpy():
    m = L.conv2d(2, 3)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    y, out_shape, params, _ = run(m, x, (8, 8, 3))
    assert out_shape == (8, 8, 2)
    # oracle: explicit sliding window on padded input
    xp = np.pad(np.asarray(x), ((0, 0), (1, 1), (1, 1), (0, 0)))
    w = np.asarray(params["w"])  # HWIO
    b = np.asarray(params["b"])
    ref = np.zeros((2, 8, 8, 2), np.float32)
    for i in range(8):
        for j in range(8):
            patch = xp[:, i : i + 3, j : j + 3, :]
            ref[:, i, j, :] = np.einsum("nhwc,hwco->no", patch, w) + b
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-4, atol=1e-5)


def test_conv2d_stride2_torch_geometry():
    # torch floor((H + 2p - k)/s) + 1 geometry (models.lua:287 conv s=2)
    m = L.conv2d(4, 3, stride=2)
    x = jnp.zeros((1, 8, 8, 2))
    y, out_shape, _, _ = run(m, x, (8, 8, 2))
    assert out_shape == (4, 4, 4)
    assert y.shape == (1, 4, 4, 4)


def test_prelu_shared_slope():
    m = L.prelu()
    x = jnp.array([[-2.0, 3.0]])
    params, state, _ = m.init(jax.random.key(0), (2,))
    y, _ = m.apply(params, state, x, Ctx(None, False))
    np.testing.assert_allclose(y, [[-0.5, 3.0]])  # slope init 0.25
    assert params["a"].shape == (1,)  # single shared param like nn.PReLU()


def test_leaky_relu_slope_third():
    m = L.leaky_relu()
    x = jnp.array([[-3.0, 3.0]])
    y, _, _, _ = run(m, x, (2,))
    np.testing.assert_allclose(y, [[-1.0, 3.0]], rtol=1e-6)


def test_batch_norm_train_normalizes_and_tracks():
    m = L.batch_norm()
    x = jax.random.normal(jax.random.key(0), (64, 4, 4, 8)) * 3 + 1
    params, state, _ = m.init(jax.random.key(1), (4, 4, 8))
    y, new_state = m.apply(params, state, x, Ctx(None, True))
    np.testing.assert_allclose(np.asarray(y.mean(axis=(0, 1, 2))), 0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(y.std(axis=(0, 1, 2))), 1, atol=1e-3)
    # running stats moved toward batch stats with momentum 0.1
    np.testing.assert_allclose(
        np.asarray(new_state["mean"]), 0.1 * np.asarray(x.mean(axis=(0, 1, 2))), rtol=1e-4
    )
    # eval mode uses running stats and leaves them unchanged
    y2, state2 = m.apply(params, new_state, x, Ctx(None, False))
    assert state2 is new_state or jax.tree_util.tree_all(
        jax.tree.map(lambda a, b: bool((a == b).all()), state2, new_state)
    )


def test_dropout_train_vs_eval():
    m = L.dropout(0.5)
    x = jnp.ones((100, 50))
    y_eval, _, _, _ = run(m, x, (50,), train=False)
    np.testing.assert_array_equal(y_eval, x)
    y_train, _, _, _ = run(m, x, (50,), train=True)
    vals = np.unique(np.asarray(y_train))
    assert set(vals.tolist()) <= {0.0, 2.0}  # inverted dropout scaling
    assert 0.3 < (np.asarray(y_train) == 0).mean() < 0.7


def test_spatial_dropout_drops_whole_channels():
    m = L.spatial_dropout(0.5)
    x = jnp.ones((8, 4, 4, 32))
    y, _, _, _ = run(m, x, (4, 4, 32), train=True)
    y = np.asarray(y)
    per_channel = y.reshape(8, 16, 32)
    # each (example, channel) plane is all-zero or all-scaled
    all_zero = (per_channel == 0).all(axis=1)
    all_kept = (per_channel == 2.0).all(axis=1)
    assert np.logical_or(all_zero, all_kept).all()


def test_white_noise():
    m = L.white_noise(0.0, 0.1)
    x = jnp.zeros((4, 100))
    y_eval, _, _, _ = run(m, x, (100,), train=False)
    np.testing.assert_array_equal(y_eval, x)
    y_train, _, _, _ = run(m, x, (100,), train=True)
    s = np.asarray(y_train).std()
    assert 0.05 < s < 0.2


def test_avg_pool_matches_numpy():
    m = L.avg_pool(2)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    y, out_shape, _, _ = run(m, x, (8, 8, 3))
    assert out_shape == (4, 4, 3)
    ref = np.asarray(x).reshape(2, 4, 2, 4, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5)


def test_max_pool_matches_numpy():
    m = L.max_pool(2)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 3))
    y, out_shape, _, _ = run(m, x, (8, 8, 3))
    ref = np.asarray(x).reshape(2, 4, 2, 4, 2, 3).max(axis=(2, 4))
    np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5)


def test_upsample_nearest():
    m = L.upsample_nearest(2)
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y, out_shape, _, _ = run(m, x, (2, 2, 1))
    assert out_shape == (4, 4, 1)
    ref = np.repeat(np.repeat(np.asarray(x), 2, axis=1), 2, axis=2)
    np.testing.assert_array_equal(np.asarray(y), ref)


def test_subpixel_conv_factor1_is_plain_conv():
    m = L.subpixel_conv(8, 3, factor=1)
    x = jax.random.normal(jax.random.key(0), (2, 8, 8, 4))
    y, out_shape, _, _ = run(m, x, (8, 8, 4))
    assert out_shape == (8, 8, 8)
    assert y.shape == (2, 8, 8, 8)


def test_subpixel_conv_factor2_reference_view_order():
    # Reference view (layers/SpatialConvolutionUpsample.lua:21):
    # NCHW (N, C*f*f, H, W) -> (N, C, H*f, W*f) row-major, NOT pixel-shuffle.
    m = L.subpixel_conv(1, 3, factor=2)
    params, state, out_shape = m.init(jax.random.key(0), (2, 2, 1))
    assert out_shape == (4, 4, 1)
    x = jnp.ones((1, 2, 2, 1))
    y, _ = m.apply(params, state, x, Ctx(None, False))
    # oracle through explicit torch-view semantics
    inner_y = jax.lax.conv_general_dilated(
        x, params["w"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + params["b"]
    nchw = np.transpose(np.asarray(inner_y), (0, 3, 1, 2))  # (1, 4, 2, 2)
    ref = nchw.reshape(1, 1, 4, 4)
    np.testing.assert_allclose(np.asarray(y[..., 0]), ref[:, 0], rtol=1e-5)


def test_sequential_and_grads():
    m = sequential(L.dense(16), L.prelu(), L.dense(4), L.sigmoid())
    params, state, out_shape = m.init(jax.random.key(0), (8,))
    assert out_shape == (4,)
    x = jax.random.normal(jax.random.key(1), (2, 8))

    def loss(p):
        y, _ = m.apply(p, state, x, Ctx(None, False))
        return jnp.sum(y**2)

    g = jax.grad(loss)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(jnp.isfinite(l).all() for l in flat)
    assert any(float(jnp.abs(l).max()) > 0 for l in flat)


def test_branches_concat():
    m = branches(
        sequential(L.flatten(), L.dense(3)),
        sequential(L.flatten(), L.dense(5)),
    )
    params, state, out_shape = m.init(jax.random.key(0), (2, 2, 1))
    assert out_shape == (8,)
    y, _ = m.apply(params, state, jnp.ones((4, 2, 2, 1)), Ctx(None, False))
    assert y.shape == (4, 8)


def test_dropout_deterministic_given_key():
    m = L.dropout(0.5)
    params, state, _ = m.init(jax.random.key(0), (64,))
    x = jnp.ones((8, 64))
    ctx = Ctx(jax.random.key(42), True)
    y1, _ = m.apply(params, state, x, ctx)
    y2, _ = m.apply(params, state, x, ctx)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
