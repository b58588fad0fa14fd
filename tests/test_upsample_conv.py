"""Fused upsample+conv: exact equivalence with the composed reference
op (nearest-up x2 then 5x5 same-pad conv), gradients, and the Pallas
kernel variant."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.nn import Ctx, layers as L
from facegen.ops.upsample_conv import (
    collapse_weights,
    depth_to_space,
    upsample_conv,
)


def composed_reference(x, w, b):
    """upsample_nearest(2) then same-pad conv — the reference op."""
    n, h, wd, c = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, wd, 2, c))
    up = up.reshape(n, 2 * h, 2 * wd, c)
    k = w.shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        up, w, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


@pytest.mark.parametrize("h,cin,cout,k", [(8, 16, 24, 5), (4, 8, 8, 3), (16, 32, 16, 5)])
def test_fused_matches_composed(h, cin, cout, k):
    kx, kw, kb = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(kx, (2, h, h, cin), jnp.float32)
    w = jax.random.normal(kw, (k, k, cin, cout), jnp.float32) * 0.1
    b = jax.random.normal(kb, (cout,), jnp.float32)
    got = upsample_conv(x, w, b)
    ref = composed_reference(x, w, b)
    assert got.shape == (2, 2 * h, 2 * h, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_fused_gradients_match_composed():
    kx, kw, kb = jax.random.split(jax.random.key(1), 3)
    x = jax.random.normal(kx, (2, 4, 4, 6), jnp.float32)
    w = jax.random.normal(kw, (5, 5, 6, 3), jnp.float32) * 0.1
    b = jnp.zeros((3,))

    def loss_fused(w_, x_):
        return jnp.sum(upsample_conv(x_, w_, b) ** 2)

    def loss_ref(w_, x_):
        return jnp.sum(composed_reference(x_, w_, b) ** 2)

    gw_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(w, x)
    gw_r, gx_r = jax.grad(loss_ref, argnums=(0, 1))(w, x)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), rtol=1e-3, atol=1e-4)


def test_layer_weight_compatible_with_composed_pair():
    # the upsample_conv layer's params drive the composed ops identically
    m = L.upsample_conv(8, 5, 2)
    params, state, out_shape = m.init(jax.random.key(0), (4, 4, 3))
    assert out_shape == (8, 8, 8)
    x = jax.random.normal(jax.random.key(1), (2, 4, 4, 3))
    y, _ = m.apply(params, state, x, Ctx(None, False))
    ref = composed_reference(x, params["w"], params["b"])
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_depth_to_space_phase_order():
    # phase block a*2+b must land at output (2i+a, 2j+b)
    y = jnp.zeros((1, 2, 2, 4 * 1))
    y = y.at[0, 0, 0, :].set(jnp.array([1.0, 2.0, 3.0, 4.0]))
    out = depth_to_space(y, 2)[0, :, :, 0]
    np.testing.assert_array_equal(
        np.asarray(out[:2, :2]), [[1.0, 2.0], [3.0, 4.0]]
    )


def test_linear_transpose_grads_match_autodiff():
    # the op is bilinear in (x, w): its VJP via jax.linear_transpose must
    # equal plain autodiff — pins the gradient structure the Pallas
    # backward kernels are tested against below.
    kx, kw, kb = jax.random.split(jax.random.key(3), 3)
    x = jax.random.normal(kx, (2, 4, 4, 6), jnp.float32)
    w = jax.random.normal(kw, (5, 5, 6, 3), jnp.float32) * 0.1
    b = jax.random.normal(kb, (3,), jnp.float32)

    def loss(x_, w_, b_):
        return jnp.sum(upsample_conv(x_, w_, b_) ** 2)

    gx, gw, gb = jax.grad(loss, argnums=(0, 1, 2))(x, w, b)
    y = upsample_conv(x, w, b)
    dy = 2.0 * y
    zero_b = jnp.zeros((3,), jnp.float32)
    gx_t = jax.linear_transpose(lambda xx: upsample_conv(xx, w, zero_b), x)(dy)[0]
    gw_t = jax.linear_transpose(lambda ww: upsample_conv(x, ww, zero_b), w)(dy)[0]
    gb_t = jnp.sum(dy, axis=(0, 1, 2))
    np.testing.assert_allclose(np.asarray(gx_t), np.asarray(gx), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_t), np.asarray(gw), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb_t), np.asarray(gb), rtol=1e-4, atol=1e-5)


def test_pallas_kernel_matches_fused():
    from facegen.ops.pallas.upsample_conv import upsample_conv_pallas

    kx, kw, kb = jax.random.split(jax.random.key(2), 3)
    x = jax.random.normal(kx, (4, 8, 8, 16), jnp.float32)
    w = jax.random.normal(kw, (5, 5, 16, 8), jnp.float32) * 0.1
    b = jax.random.normal(kb, (8,), jnp.float32)
    got = upsample_conv_pallas(x, w, b, interpret=True)
    ref = upsample_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_space_to_depth_inverts_depth_to_space():
    from facegen.ops.pallas.upsample_conv import space_to_depth

    y = jax.random.normal(jax.random.key(0), (2, 3, 5, 12))
    np.testing.assert_array_equal(
        np.asarray(space_to_depth(depth_to_space(y, 2), 2)), np.asarray(y)
    )


def test_pallas_backward_kernels_match_transpose():
    from facegen.ops.pallas.upsample_conv import (
        upsample_conv_dw_pallas,
        upsample_conv_dx_pallas,
    )

    kx, kw, kd = jax.random.split(jax.random.key(4), 3)
    x = jax.random.normal(kx, (4, 6, 6, 8), jnp.float32)
    w = jax.random.normal(kw, (5, 5, 8, 4), jnp.float32) * 0.2
    dy = jax.random.normal(kd, (4, 12, 12, 4), jnp.float32)
    zero_b = jnp.zeros((4,), jnp.float32)

    dx_ref = jax.linear_transpose(lambda xx: upsample_conv(xx, w, zero_b), x)(dy)[0]
    dw_ref = jax.linear_transpose(lambda ww: upsample_conv(x, ww, zero_b), w)(dy)[0]
    dx = upsample_conv_dx_pallas(dy, w, interpret=True)
    dw = upsample_conv_dw_pallas(x, dy, kernel=5, interpret=True)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref), rtol=1e-4, atol=1e-4)
