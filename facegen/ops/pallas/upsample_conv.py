"""Pallas TPU kernel: fused nearest-upsample(2x) + 5x5 conv.

The Mosaic/MXU version of facegen/ops/upsample_conv.py's phase
decomposition. Per grid step it keeps one batch-tile of the input
feature map entirely in VMEM, runs the nine collapsed 3x3 taps as
(BN*H*W, Cin) x (Cin, 4*Cout) MXU dots accumulated in fp32 VMEM
scratch, adds bias, and writes the phase-major output block — no
upsampled intermediate ever touches HBM, and each input byte is read
once.

The wrapper pre-pads H/W by 1 (SAME padding of the collapsed kernel)
and pre-collapses the 5x5 weights; `depth_to_space` interleaving
happens outside the kernel (a layout-only reshape XLA fuses away).

For G32's two pyramid stages the per-tile VMEM footprint is
  stage 1 (8x8x128 -> 16x16x256):  x 10*10*128*4B + w 9*128*1024*4B
  stage 2 (16x16x256 -> 32x32x128): x 18*18*256*4B + w 9*256*512*4B
well under the ~16 MB budget at BN=8.

Used on the inference path; training uses the XLA phase-conv (same
math, autodiff for free). `interpret=True` runs the kernel on CPU for
tests (pallas_guide.md: Interpreter Mode).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from facegen.ops.upsample_conv import collapse_weights, depth_to_space


def _kernel(x_ref, w_ref, b_ref, out_ref, *, h: int, w: int, cin: int, cout4: int):
    """x_ref: (BN, H+2, W+2, Cin); w_ref: (3, 3, Cin, 4*Cout);
    b_ref: (1, 4*Cout); out_ref: (BN, H, W, 4*Cout)."""
    bn = x_ref.shape[0]
    acc = jnp.zeros((bn * h * w, cout4), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[:, dy : dy + h, dx : dx + w, :].reshape(bn * h * w, cin)
            acc = acc + jnp.dot(
                xs, w_ref[dy, dx], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0].astype(jnp.float32)
    out_ref[:] = acc.reshape(bn, h, w, cout4).astype(out_ref.dtype)


def upsample_conv_pallas(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Fused nearest-up(2x) + same-pad KxK conv via a Pallas kernel.

    x: (N, H, W, Cin); w: (K, K, Cin, Cout) [the UNCOLLAPSED weights —
    collapse happens here]; b: (Cout,). Returns (N, 2H, 2W, Cout).
    """
    n, h, wd, cin = x.shape
    cout = w.shape[-1]
    wc = collapse_weights(w.astype(x.dtype), 2)  # (3, 3, Cin, 4*Cout)
    cout4 = 4 * cout
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    bn = min(batch_tile, n)
    # pad batch to a multiple of the tile
    n_pad = (-n) % bn
    if n_pad:
        xp = jnp.pad(xp, ((0, n_pad), (0, 0), (0, 0), (0, 0)))
    n_total = xp.shape[0]
    b4 = jnp.tile(b.astype(x.dtype), (4,)).reshape(1, cout4)

    grid = (n_total // bn,)
    y = pl.pallas_call(
        partial(_kernel, h=h, w=wd, cin=cin, cout4=cout4),
        out_shape=jax.ShapeDtypeStruct((n_total, h, wd, cout4), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (bn, h + 2, wd + 2, cin),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((3, 3, cin, cout4), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout4), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bn, h, wd, cout4), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_total * h * wd * 9 * cin * cout4,
            bytes_accessed=(
                n_total * (h + 2) * (wd + 2) * cin * x.dtype.itemsize
                + 9 * cin * cout4 * x.dtype.itemsize
                + n_total * h * wd * cout4 * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, wc, b4)
    if n_pad:
        y = y[:n]
    return depth_to_space(y, 2)
