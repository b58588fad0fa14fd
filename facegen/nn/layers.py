"""Layer zoo — TPU-idiomatic equivalents of the torch nn layers the
reference uses (SURVEY.md section 2.2 table row nn/cunn).

Layout is NHWC (XLA's preferred TPU conv layout); per-example shapes are
(H, W, C) for images and (F,) for vectors. Convolutions lower to
`lax.conv_general_dilated`, which XLA tiles onto the MXU; elementwise
pieces fuse into the surrounding HLO, so PReLU/dropout/pool cost no
extra HBM round-trips.

Parameters are stored float32 and cast to the input dtype at use, so
bfloat16 compute is selected simply by feeding bf16 activations.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from facegen.nn.core import Ctx, Module, elementwise, stateless

# ---------------------------------------------------------------------------
# initializer plumbing (see nn/init.py for the schemes themselves)
# ---------------------------------------------------------------------------


def _uniform(key, shape, scale, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def _torch_reset_scale(fan_in: int) -> float:
    """torch nn default reset(): uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return 1.0 / math.sqrt(fan_in)


# ---------------------------------------------------------------------------
# dense / conv
# ---------------------------------------------------------------------------


def dense(features: int, w_std: Optional[float] = None, name: str = "dense") -> Module:
    """Affine layer; reference `nn.Linear` (models.lua:59).

    ``w_std``: if given, init weights AND biases uniform(-w_std, w_std)
    (the torch reset(stdv) convention used by weight-init.lua:55-65);
    otherwise torch's default 1/sqrt(fan_in) scale.
    """

    def init_params(key, in_shape):
        (fan_in,) = in_shape
        scale = w_std if w_std is not None else _torch_reset_scale(fan_in)
        kw, kb = jax.random.split(key)
        params = {
            "w": _uniform(kw, (fan_in, features), scale),
            "b": _uniform(kb, (features,), scale),
        }
        return params, (features,)

    def apply_fn(params, x, ctx):
        w = params["w"].astype(x.dtype)
        b = params["b"].astype(x.dtype)
        return x @ w + b

    return stateless(name, init_params, apply_fn)


def conv2d(
    features: int,
    kernel: int,
    stride: int = 1,
    w_std: Optional[float] = None,
    name: str = "conv",
    padding: str = "SAME",
) -> Module:
    """2D convolution, torch-style (k-1)/2 same padding for odd kernels
    (padding="SAME", the default) or zero padding (padding="VALID",
    train_denoiser.lua:89,92 pad=0).

    Reference `nn.SpatialConvolution` / `cudnn.SpatialConvolution`
    (models.lua:34,385). Kernel layout HWIO, compute on the MXU via
    `lax.conv_general_dilated` with fp32 accumulation.
    """
    assert kernel % 2 == 1, "odd kernels only (reference layers use 3/5/7)"
    assert padding in ("SAME", "VALID")
    pad = (kernel - 1) // 2 if padding == "SAME" else 0

    def init_params(key, in_shape):
        h, w, c = in_shape
        fan_in = c * kernel * kernel
        scale = w_std if w_std is not None else _torch_reset_scale(fan_in)
        kw, kb = jax.random.split(key)
        params = {
            "w": _uniform(kw, (kernel, kernel, c, features), scale),
            "b": _uniform(kb, (features,), scale),
        }
        out_h = (h + 2 * pad - kernel) // stride + 1
        out_w = (w + 2 * pad - kernel) // stride + 1
        return params, (out_h, out_w, features)

    def apply_fn(params, x, ctx):
        w = params["w"].astype(x.dtype)
        b = params["b"].astype(x.dtype)
        # No preferred_element_type: the MXU accumulates bf16 x bf16 in
        # fp32 internally; keeping the HLO dtype uniform lets the conv
        # transpose rules stay dtype-consistent under jax.grad.
        y = lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b

    return stateless(name, init_params, apply_fn)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def prelu(shared: bool = True, init: float = 0.25, name: str = "prelu") -> Module:
    """PReLU with a single shared slope (torch `nn.PReLU()` default,
    models.lua:31,61). y = max(0,x) + a*min(0,x)."""

    def init_params(key, in_shape):
        n = 1 if shared else in_shape[-1]
        return {"a": jnp.full((n,), init, jnp.float32)}, in_shape

    def apply_fn(params, x, ctx):
        a = params["a"].astype(x.dtype)
        if shared:
            a = a[0]
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)

    return stateless(name, init_params, apply_fn)


def leaky_relu(slope: float = 1.0 / 3.0, name: str = "leaky_relu") -> Module:
    """Reference LeakyReLU.lua:7-19 (waifu2x vendored layer, slope 1/3)."""
    return elementwise(name, lambda x: jnp.maximum(x, 0) + slope * jnp.minimum(x, 0))


def sigmoid(name: str = "sigmoid") -> Module:
    return elementwise(name, jax.nn.sigmoid)


def tanh(name: str = "tanh") -> Module:
    return elementwise(name, jnp.tanh)


def relu(name: str = "relu") -> Module:
    return elementwise(name, jax.nn.relu)


def identity(name: str = "identity") -> Module:
    return elementwise(name, lambda x: x)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def batch_norm(momentum: float = 0.1, eps: float = 1e-5, name: str = "batch_norm") -> Module:
    """Batch normalization over batch (+spatial) dims with running stats.

    Reference `nn.SpatialBatchNormalization` (models.lua:35,65): affine,
    eps 1e-5, running-stat momentum 0.1 (new = (1-m)*old + m*batch).
    Train mode normalizes by batch statistics (computed in fp32) and
    updates the running estimates in ``state``; eval mode uses the
    running estimates — matching torch semantics exactly, including the
    unbiased variance correction torch applies to the stored stats.
    """

    def init(key, in_shape):
        c = in_shape[-1]
        params = {
            "scale": jnp.ones((c,), jnp.float32),
            "bias": jnp.zeros((c,), jnp.float32),
        }
        state = {
            "mean": jnp.zeros((c,), jnp.float32),
            "var": jnp.ones((c,), jnp.float32),
        }
        return params, state, in_shape

    def apply(params, state, x, ctx):
        reduce_axes = tuple(range(x.ndim - 1))  # all but channel
        xf = x.astype(jnp.float32)
        if ctx.train:
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.var(xf, axis=reduce_axes)
            n = x.size // x.shape[-1]
            unbiased = var * (n / max(n - 1, 1))
            new_state = {
                "mean": (1 - momentum) * state["mean"] + momentum * mean,
                "var": (1 - momentum) * state["var"] + momentum * unbiased,
            }
        else:
            mean, var = state["mean"], state["var"]
            new_state = state
        inv = lax.rsqrt(var + eps) * params["scale"]
        y = (xf - mean) * inv + params["bias"]
        return y.astype(x.dtype), new_state

    return Module(init=init, apply=apply, name=name)


# ---------------------------------------------------------------------------
# stochastic layers
# ---------------------------------------------------------------------------


def dropout(rate: float = 0.5, name: str = "dropout") -> Module:
    """Inverted dropout; reference `nn.Dropout()` (models.lua:408)."""

    def apply_fn(params, x, ctx):
        if not ctx.train or rate == 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(ctx.rng, keep, x.shape)
        return jnp.where(mask, x / keep, 0).astype(x.dtype)

    return stateless(name, lambda key, s: ({}, s), apply_fn)


def spatial_dropout(rate: float = 0.5, name: str = "spatial_dropout") -> Module:
    """Drop whole channels; reference `nn.SpatialDropout(0.2)`
    (models.lua:387). Mask shape (N,1,1,C), inverted scaling."""

    def apply_fn(params, x, ctx):
        if not ctx.train or rate == 0.0:
            return x
        keep = 1.0 - rate
        mask = jax.random.bernoulli(ctx.rng, keep, (x.shape[0], 1, 1, x.shape[-1]))
        return jnp.where(mask, x / keep, 0).astype(x.dtype)

    return stateless(name, lambda key, s: ({}, s), apply_fn)


def white_noise(mean: float = 0.0, std: float = 0.1, name: str = "white_noise") -> Module:
    """Additive gaussian noise at train time; reference dpnn
    `nn.WhiteNoise(0.0, 0.1)` in the denoiser encoder
    (train_denoiser.lua:84)."""

    def apply_fn(params, x, ctx):
        if not ctx.train:
            return x
        noise = mean + std * jax.random.normal(ctx.rng, x.shape, jnp.float32)
        return (x + noise.astype(x.dtype)).astype(x.dtype)

    return stateless(name, lambda key, s: ({}, s), apply_fn)


# ---------------------------------------------------------------------------
# pooling / resampling / shaping
# ---------------------------------------------------------------------------


def avg_pool(window: int = 2, stride: Optional[int] = None, name: str = "avg_pool") -> Module:
    """Reference `nn.SpatialAveragePooling(2,2,2,2)` (models.lua:388)."""
    stride = stride or window

    def init_params(key, in_shape):
        h, w, c = in_shape
        return {}, ((h - window) // stride + 1, (w - window) // stride + 1, c)

    def apply_fn(params, x, ctx):
        y = lax.reduce_window(
            x.astype(jnp.float32),
            0.0,
            lax.add,
            (1, window, window, 1),
            (1, stride, stride, 1),
            "VALID",
        )
        return (y / (window * window)).astype(x.dtype)

    return stateless(name, init_params, apply_fn)


def max_pool(window: int = 2, stride: Optional[int] = None, name: str = "max_pool") -> Module:
    """Reference `nn.SpatialMaxPooling(2,2)` (models.lua:117)."""
    stride = stride or window

    def init_params(key, in_shape):
        h, w, c = in_shape
        return {}, ((h - window) // stride + 1, (w - window) // stride + 1, c)

    def apply_fn(params, x, ctx):
        return lax.reduce_window(
            x,
            -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
            lax.max,
            (1, window, window, 1),
            (1, stride, stride, 1),
            "VALID",
        )

    return stateless(name, init_params, apply_fn)


def upsample_nearest(factor: int = 2, name: str = "upsample_nearest") -> Module:
    """Reference `nn.SpatialUpSamplingNearest(2)` (models.lua:33,63).

    Implemented as broadcast+reshape, which XLA fuses into the consumer
    conv — see ops/pallas/upsample_conv.py for the hand-fused kernel.
    """

    def init_params(key, in_shape):
        h, w, c = in_shape
        return {}, (h * factor, w * factor, c)

    def apply_fn(params, x, ctx):
        n, h, w, c = x.shape
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, factor, w, factor, c))
        return x.reshape(n, h * factor, w * factor, c)

    return stateless(name, init_params, apply_fn)


def upsample_conv(
    features: int,
    kernel: int = 5,
    factor: int = 2,
    w_std: Optional[float] = None,
    name: str = "upconv",
) -> Module:
    """Fused nearest-upsample(factor) + same-pad conv — the G pyramid's
    hot op (reference models.lua:63-64, 68-69 composes
    SpatialUpSamplingNearest + 5x5 cudnn conv). Parameters are identical
    to `conv2d` (K, K, Cin, Cout), so the fused and composed forms are
    weight-compatible; the fused compute runs the phase-collapsed 3x3
    conv (36% of the naive FLOPs, no upsampled intermediate) — see
    facegen/ops/upsample_conv.py.
    """
    assert kernel % 2 == 1
    from facegen.ops.upsample_conv import upsample_conv as fused

    def init_params(key, in_shape):
        h, w, c = in_shape
        fan_in = c * kernel * kernel
        scale = w_std if w_std is not None else _torch_reset_scale(fan_in)
        kw, kb = jax.random.split(key)
        params = {
            "w": _uniform(kw, (kernel, kernel, c, features), scale),
            "b": _uniform(kb, (features,), scale),
        }
        return params, (h * factor, w * factor, features)

    def apply_fn(params, x, ctx):
        w = params["w"].astype(x.dtype)
        b = params["b"].astype(x.dtype)
        # Always the XLA phase conv: dispatch-amortized measurement
        # (docs/KERNELS.md) showed it matches or beats the Pallas kernel
        # at every training and inference shape once per-call latency is
        # excluded, so no runtime dispatch is carried here.
        return fused(x, w, b, factor)

    return stateless(name, init_params, apply_fn)


def flatten(name: str = "flatten") -> Module:
    """Reference `nn.View(n)` collapse (models.lua:405)."""

    def init_params(key, in_shape):
        return {}, (math.prod(in_shape),)

    def apply_fn(params, x, ctx):
        return x.reshape(x.shape[0], -1)

    return stateless(name, init_params, apply_fn)


def reshape(shape: Sequence[int], name: str = "reshape") -> Module:
    """Reference `nn.View(C,H,W)` expand (models.lua:60). ``shape`` is
    the per-example NHWC target, e.g. (8, 8, 128)."""
    shape = tuple(shape)

    def init_params(key, in_shape):
        return {}, shape

    def apply_fn(params, x, ctx):
        return x.reshape((x.shape[0],) + shape)

    return stateless(name, init_params, apply_fn)


def permute(dims: Sequence[int], name: str = "permute") -> Module:
    """Per-example axis permutation (batch axis fixed), e.g. NCHW->NHWC
    plane re-wiring with ``dims=(1, 2, 0)``. XLA folds the transpose
    into the neighbouring reshape/conv, so it costs no extra HBM pass."""
    dims = tuple(dims)

    def init_params(key, in_shape):
        if len(dims) != len(in_shape) or sorted(dims) != list(range(len(in_shape))):
            raise ValueError(f"permute dims {dims} invalid for rank-{len(in_shape)} input")
        return {}, tuple(in_shape[d] for d in dims)

    def apply_fn(params, x, ctx):
        return x.transpose((0,) + tuple(d + 1 for d in dims))

    return stateless(name, init_params, apply_fn)


def subpixel_conv(
    features: int,
    kernel: int,
    factor: int,
    w_std: Optional[float] = None,
    name: str = "subpixel_conv",
) -> Module:
    """Conv producing features*factor^2 channels, reshaped to factor-x
    resolution — the reference's SpatialConvolutionUpsample
    (layers/SpatialConvolutionUpsample.lua:16-28).

    NOTE the reference's reshape is a plain row-major view
    (N, C*f^2, H, W) -> (N, C, H*f, W*f), NOT pixel-shuffle order
    (SURVEY.md section 7 quirk e). We reproduce that exact mapping: in
    NCHW terms output[n, c, y, x] = conv[n, c*f*f + (y*f + x') mapping
    ...]; concretely channel block c contributes its f*f maps as f*f
    consecutive row-stripes of the upscaled image. With factor=1 (every
    call site in models_c2f.lua:123-131) it degenerates to a same-pad
    conv, identically to the reference.
    """
    assert kernel % 2 == 1
    inner = conv2d(features * factor * factor, kernel, 1, w_std, name="inner")

    def init(key, in_shape):
        params, state, (h, w, cf) = inner.init(key, in_shape)
        return params, state, (h * factor, w * factor, features)

    def apply(params, state, x, ctx):
        y, state = inner.apply(params, state, x, ctx)
        if factor == 1:
            return y, state
        n, h, w, _ = y.shape
        # Reproduce the torch view exactly: NCHW (N, C*f*f, H, W) viewed
        # row-major as (N, C, H*f, W*f). Each channel block's f*f sub-maps
        # land as consecutive row-stripes of the upscaled plane.
        y = jnp.transpose(y, (0, 3, 1, 2))  # N, C*f*f, H, W
        y = y.reshape(n, features, h * factor, w * factor)
        return jnp.transpose(y, (0, 2, 3, 1)), state

    return Module(init=init, apply=apply, name=name)
