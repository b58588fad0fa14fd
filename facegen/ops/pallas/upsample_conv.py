"""Pallas TPU kernels: fused nearest-upsample(2x) + 5x5 conv, forward
AND backward.

The Mosaic/MXU realization of facegen/ops/upsample_conv.py's phase
decomposition. All three passes reduce to the same primitive — a 3x3
same-pad conv expressed as nine (BN*H*W, Cin) x (Cin, Cout) MXU dots
accumulated in fp32 — applied to different operands:

  forward : y   = D2S( conv3x3(pad(x),  collapse(W)) + b )
  dx      : dx  =      conv3x3(pad(S2D(dy)), flipT(collapse(W)))
  dW      : dWc[u,v] = sum_n  x_pad[:, u:, v:]^T @ S2D(dy)   (9 GEMMs,
            accumulated across batch-tile grid steps in VMEM), then
            dW = collapse^T(dWc); db = sum(dy).

Per grid step one batch-tile of activations lives entirely in VMEM; no
upsampled intermediate and no im2col buffer ever touch HBM.

STATUS: parity-tested kernel library, NOT on the product path. Round-2
dispatch-amortized benchmarks (docs/KERNELS.md) showed the XLA phase
conv (ops/upsample_conv.py) matching or beating these kernels at every
shape the models use once per-call dispatch latency is amortized, so
the runtime dispatch that selected them was removed. `interpret=True`
runs on CPU for tests (pallas_guide.md: Interpreter Mode).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facegen.ops.upsample_conv import (
    _collapse_matrix,
    collapse_weights,
    depth_to_space,
)


def space_to_depth(y: jax.Array, factor: int = 2) -> jax.Array:
    """Inverse of depth_to_space: (N, fH, fW, C) -> (N, H, W, f*f*C)."""
    n, fh, fw, c = y.shape
    f = factor
    h, w = fh // f, fw // f
    y = y.reshape(n, h, f, w, f, c)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(n, h, w, f * f * c)


def _conv_kernel(x_ref, w_ref, b_ref, out_ref, *, h: int, w: int, cin: int, cout: int):
    """x_ref: (BN, H+2, W+2, Cin); w_ref: (3, 3, Cin, Cout);
    b_ref: (1, Cout); out_ref: (BN, H, W, Cout)."""
    bn = x_ref.shape[0]
    acc = jnp.zeros((bn * h * w, cout), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[:, dy : dy + h, dx : dx + w, :].reshape(bn * h * w, cin)
            acc = acc + jnp.dot(
                xs, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    out_ref[:] = acc.reshape(bn, h, w, cout).astype(out_ref.dtype)


def conv3x3_pallas(
    xp: jax.Array,
    wc: jax.Array,
    bias: Optional[jax.Array] = None,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """3x3 VALID conv of a pre-padded input via the Pallas kernel.

    xp: (N, H+2, W+2, Cin) [already padded by 1]; wc: (3, 3, Cin, Cout);
    bias: (Cout,) or None. Returns (N, H, W, Cout) in xp.dtype.
    """
    n, hp, wp, cin = xp.shape
    h, w = hp - 2, wp - 2
    cout = wc.shape[-1]
    if bias is None:
        bias = jnp.zeros((cout,), xp.dtype)
    bn = min(batch_tile, n)
    n_pad = (-n) % bn
    if n_pad:
        xp = jnp.pad(xp, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    n_total = xp.shape[0]
    b2d = bias.astype(xp.dtype).reshape(1, cout)

    y = pl.pallas_call(
        partial(_conv_kernel, h=h, w=w, cin=cin, cout=cout),
        out_shape=jax.ShapeDtypeStruct((n_total, h, w, cout), xp.dtype),
        grid=(n_total // bn,),
        in_specs=[
            pl.BlockSpec((bn, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bn, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_total * h * w * 9 * cin * cout,
            bytes_accessed=(
                n_total * (h + 2) * (w + 2) * cin * xp.dtype.itemsize
                + 9 * cin * cout * xp.dtype.itemsize
                + n_total * h * w * cout * xp.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wc, b2d)
    if n_pad:
        y = y[:n]
    return y


def upsample_conv_pallas(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Forward: fused nearest-up(2x) + same-pad KxK conv.

    x: (N, H, W, Cin); w: (K, K, Cin, Cout) UNCOLLAPSED; b: (Cout,).
    Returns (N, 2H, 2W, Cout).
    """
    wc = collapse_weights(w.astype(x.dtype), 2)  # (3, 3, Cin, 4*Cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    b4 = jnp.tile(b.astype(x.dtype), (4,))
    y = conv3x3_pallas(xp, wc, b4, batch_tile, interpret)
    return depth_to_space(y, 2)


def upsample_conv_dx_pallas(
    dy: jax.Array,
    w: jax.Array,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Input cotangent: dy (N, 2H, 2W, Cout) -> dx (N, H, W, Cin).

    dx = conv3x3(pad(S2D(dy)), Wc flipped spatially with in/out
    transposed) — the transpose of the forward phase conv.
    """
    wc = collapse_weights(w.astype(dy.dtype), 2)          # (3,3,Ci,4Co)
    wt = jnp.transpose(wc[::-1, ::-1], (0, 1, 3, 2))      # (3,3,4Co,Ci)
    dyc = space_to_depth(dy, 2)                           # (N,H,W,4Co)
    dycp = jnp.pad(dyc, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return conv3x3_pallas(dycp, wt, None, batch_tile, interpret)


def _dw_kernel(x_ref, dy_ref, out_ref, *, h: int, w: int, cin: int, cout: int):
    """x_ref: (BN, H+2, W+2, Cin); dy_ref: (BN, H, W, Cout);
    out_ref: (9, Cin, Cout) fp32, accumulated across grid steps."""
    bn = x_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    dys = dy_ref[:].reshape(bn * h * w, cout)
    for u in range(3):
        for v in range(3):
            xs = x_ref[:, u : u + h, v : v + w, :].reshape(bn * h * w, cin)
            out_ref[3 * u + v] += jax.lax.dot_general(
                xs, dys, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(out_ref.dtype)


def upsample_conv_dw_pallas(
    x: jax.Array,
    dy: jax.Array,
    kernel: int = 5,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Weight cotangent: (x, dy) -> dW (K, K, Cin, Cout) fp32.

    dWc accumulates as nine MXU GEMMs per batch tile (the output block
    stays resident in VMEM across grid steps), then un-collapses through
    the transpose of the phase-collapse map.
    """
    n, h, w, cin = x.shape
    dyc = space_to_depth(dy, 2)                            # (N,H,W,4Co)
    cout4 = dyc.shape[-1]
    cout = cout4 // 4
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bn = min(batch_tile, n)
    n_pad = (-n) % bn
    if n_pad:
        xp = jnp.pad(xp, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
        dyc = jnp.pad(dyc, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    n_total = xp.shape[0]

    dwc = pl.pallas_call(
        partial(_dw_kernel, h=h, w=w, cin=cin, cout=cout4),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout4), jnp.float32),
        grid=(n_total // bn,),
        in_specs=[
            pl.BlockSpec((bn, h + 2, w + 2, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, h, w, cout4), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cin, cout4), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 9 * n_total * h * w * cin * cout4,
            bytes_accessed=(
                n_total * (h + 2) * (w + 2) * cin * x.dtype.itemsize
                + n_total * h * w * cout4 * x.dtype.itemsize
                + 9 * cin * cout4 * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, dyc)

    # un-collapse: dW[k,l,i,o] = sum_{a,b,u,v} C[a,k,u] C[b,l,v] dWc[...]
    import numpy as np

    c = jnp.asarray(_collapse_matrix(kernel, 2))           # (2, K, 3)
    dwc6 = dwc.reshape(3, 3, cin, 4, cout)                 # u, v, i, ab, o
    dwc6 = jnp.transpose(dwc6, (3, 0, 1, 2, 4)).reshape(2, 2, 3, 3, cin, cout)
    dw = jnp.einsum("aku,blv,abuvio->klio", c, c, dwc6)
    return dw
