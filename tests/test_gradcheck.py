"""Finite-difference gradient checks for the hand-written pieces
(SURVEY.md section 4: 'gradient via jax.grad against finite
differences'). Autodiff through plain XLA ops needs no checking; these
target our custom structures: the phase-collapsed fused upsample-conv,
the subpixel reshape, PReLU's shared slope, and batch-norm train mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from facegen.nn import Ctx, layers as L


def fd_grad(f, x, eps=1e-3):
    """Central finite differences of scalar f at x (same shape as x)."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        i = it.multi_index
        xp = x.copy(); xp[i] += eps
        xm = x.copy(); xm[i] -= eps
        g[i] = (f(jnp.asarray(xp, jnp.float32)) - f(jnp.asarray(xm, jnp.float32))) / (2 * eps)
        it.iternext()
    return g


def test_upsample_conv_fd_weights():
    from facegen.ops.upsample_conv import upsample_conv

    x = jax.random.normal(jax.random.key(0), (1, 3, 3, 2), jnp.float32)
    w0 = jax.random.normal(jax.random.key(1), (5, 5, 2, 2), jnp.float32) * 0.3
    b = jnp.zeros((2,))

    def f(w):
        return float(jnp.sum(jnp.tanh(upsample_conv(x, w, b))))

    g_auto = np.asarray(jax.grad(
        lambda w: jnp.sum(jnp.tanh(upsample_conv(x, w, b)))
    )(w0))
    g_fd = fd_grad(f, w0)
    np.testing.assert_allclose(g_auto, g_fd, rtol=2e-2, atol=2e-3)


def test_upsample_conv_fd_input():
    from facegen.ops.upsample_conv import upsample_conv

    x0 = jax.random.normal(jax.random.key(0), (1, 2, 2, 3), jnp.float32)
    w = jax.random.normal(jax.random.key(1), (5, 5, 3, 2), jnp.float32) * 0.3
    b = jnp.ones((2,)) * 0.1

    def f(x):
        return float(jnp.sum(jnp.sin(upsample_conv(x, w, b))))

    g_auto = np.asarray(jax.grad(
        lambda x: jnp.sum(jnp.sin(upsample_conv(x, w, b)))
    )(x0))
    g_fd = fd_grad(f, x0)
    np.testing.assert_allclose(g_auto, g_fd, rtol=2e-2, atol=2e-3)


def test_prelu_shared_slope_fd():
    m = L.prelu()
    params, state, _ = m.init(jax.random.key(0), (6,))
    x = jax.random.normal(jax.random.key(1), (4, 6), jnp.float32)

    def loss(a):
        y, _ = m.apply({"a": a}, state, x, Ctx(None, False))
        return jnp.sum(y**3)

    g_auto = float(jax.grad(loss)(params["a"])[0])
    g_fd = fd_grad(lambda a: float(loss(a)), params["a"])[0]
    np.testing.assert_allclose(g_auto, g_fd, rtol=2e-2, atol=1e-3)


def test_subpixel_conv_fd_weights():
    m = L.subpixel_conv(1, 3, factor=2)
    params, state, _ = m.init(jax.random.key(0), (2, 2, 1))
    x = jax.random.normal(jax.random.key(1), (1, 2, 2, 1), jnp.float32)

    def loss(w):
        y, _ = m.apply({"w": w, "b": params["b"]}, state, x, Ctx(None, False))
        return jnp.sum(y**2)

    g_auto = np.asarray(jax.grad(loss)(params["w"]))
    g_fd = fd_grad(lambda w: float(loss(w)), params["w"])
    np.testing.assert_allclose(g_auto, g_fd, rtol=2e-2, atol=2e-3)


def test_batch_norm_train_fd():
    m = L.batch_norm()
    params, state, _ = m.init(jax.random.key(0), (4,))
    x0 = jax.random.normal(jax.random.key(1), (8, 4), jnp.float32)

    def loss(x):
        y, _ = m.apply(params, state, x, Ctx(None, True))
        return jnp.sum(jnp.tanh(y))

    g_auto = np.asarray(jax.grad(loss)(x0))
    g_fd = fd_grad(lambda x: float(loss(x)), x0)
    np.testing.assert_allclose(g_auto, g_fd, rtol=5e-2, atol=5e-3)
