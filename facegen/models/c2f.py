"""Coarse-to-fine (conditional refinement) models.

Rebuild of models_c2f.lua's used variants:

- `create_g` = create_G_d (models_c2f.lua:113-145): input
  {noise(1, H, W), coarse(C, H, W)} -> channel concat (JoinTable) ->
  five same-pad convs (kernels 3,3,5,5,7; widths 64,64,128,256,C) with
  PReLU between -> DIFF image output (no output activation; the diff is
  signed). All `cudnn.SpatialConvolutionUpsample` call sites use
  factor=1, i.e. plain same-pad convs (models_c2f.lua:123-131) — we use
  `subpixel_conv(factor=1)` so the c2f path exercises the same layer.
- `create_d` = create_D_c (models_c2f.lua:237-278): input
  {diff, coarse} -> elementwise ADD (CAddTable = reconstructed fine,
  :240) -> conv stack (3x3 64,64 maxpool 128,256 maxpool) -> dropout ->
  512 -> 1. Logits out (reference sigmoid folded into the loss).

Init parity note: the reference applies weight-init 'heuristic' to the
TOP-LEVEL modules only (weight-init.lua:52), and in c2f models all
convs/linears are nested inside an inner Sequential — so the heuristic
init is a NO-OP and torch's default 1/sqrt(fan_in) uniform init is what
actually ships (SURVEY.md quirk family b). Our layers default to
exactly that, so we simply do not re-init.

Unused variants G_a/G_b/G_c and D_a/D_b (models_c2f.lua:16-111,156-235)
are provided for inventory completeness.

The two-input modules consume python tuples; shapes are NHWC.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from facegen.nn import layers as L, sequential
from facegen.nn.core import Ctx, Module


def _pair_op(fn, out_shape_fn, name):
    """Module taking (a, b) tuple input."""

    def init(key, in_shape):
        # in_shape: tuple of two per-example shapes
        return {}, (), out_shape_fn(in_shape)

    def apply(params, state, xs, ctx):
        return fn(*xs), state

    return Module(init=init, apply=apply, name=name)


def concat_channels(name: str = "join") -> Module:
    """nn.JoinTable(2, 2) over channels (models_c2f.lua:116)."""
    return _pair_op(
        lambda a, b: jnp.concatenate([a, b.astype(a.dtype)], axis=-1),
        lambda s: (s[0][0], s[0][1], s[0][2] + s[1][2]),
        name,
    )


def add_pair(name: str = "caddtable") -> Module:
    """nn.CAddTable() (models_c2f.lua:240): diff + coarse = fine."""
    return _pair_op(
        lambda a, b: a + b.astype(a.dtype),
        lambda s: s[0],
        name,
    )


def _with_head(head: Module, body: Module, name: str) -> Module:
    def init(key, in_shape):
        ph, sh, mid = head.init(jax.random.fold_in(key, 0), in_shape)
        pb, sb, out = body.init(jax.random.fold_in(key, 1), mid)
        return {"head": ph, "body": pb}, {"head": sh, "body": sb}, out

    def apply(params, state, xs, ctx):
        mid, s_h = head.apply(params["head"], state["head"], xs, ctx.fold(0))
        out, s_b = body.apply(params["body"], state["body"], mid, ctx.fold(1))
        return out, {"head": s_h, "body": s_b}

    return Module(init=init, apply=apply, name=name)


def create_g(fine_size: int, channels: int) -> Module:
    """create_G_d. Input ((noise (H,W,1), coarse (H,W,C))) -> diff."""
    body = sequential(
        L.subpixel_conv(64, 3, 1, name="conv1"),
        L.prelu(),
        L.subpixel_conv(64, 3, 1, name="conv2"),
        L.prelu(),
        L.subpixel_conv(128, 5, 1, name="conv3"),
        L.prelu(),
        L.subpixel_conv(256, 5, 1, name="conv4"),
        L.prelu(),
        L.subpixel_conv(channels, 7, 1, name="conv5"),
        name="inner",
    )
    return _with_head(concat_channels(), body, "G_c2f")


def create_d(fine_size: int, channels: int) -> Module:
    """create_D_c. Input ((diff, coarse)) -> logits."""
    body = sequential(
        L.conv2d(64, 3, name="conv1"),
        L.prelu(),
        L.conv2d(64, 3, name="conv2"),
        L.prelu(),
        L.max_pool(2),
        L.conv2d(128, 3, name="conv3"),
        L.prelu(),
        L.conv2d(256, 3, name="conv4"),
        L.prelu(),
        L.max_pool(2),
        L.dropout(0.5),
        L.flatten(),
        L.dense(512, name="fc1"),
        L.prelu(),
        L.dropout(0.5),
        L.dense(1, name="fc_out"),
        name="inner",
    )
    return _with_head(add_pair(), body, "D_c2f")


def create_g_a(fine_size: int, channels: int) -> Module:
    """Unused variant create_G_a (models_c2f.lua:16-45): (C+1)->64 3x3,
    64->128 7x7, 128->C 5x5 (no activation after the last conv)."""
    body = sequential(
        L.subpixel_conv(64, 3, 1, name="conv1"), L.prelu(),
        L.subpixel_conv(128, 7, 1, name="conv2"), L.prelu(),
        L.subpixel_conv(channels, 5, 1, name="conv3"),
        name="inner",
    )
    return _with_head(concat_channels(), body, "G_c2f_a")


def create_d_a(fine_size: int, channels: int) -> Module:
    """Unused variant create_D_a (models_c2f.lua:155-192): two 3x3 convs
    to 64, ONE max-pool, then the fc head."""
    body = sequential(
        L.conv2d(64, 3, name="conv1"), L.prelu(),
        L.conv2d(64, 3, name="conv2"), L.prelu(),
        L.max_pool(2),
        L.dropout(0.5), L.flatten(),
        L.dense(512, name="fc1"), L.prelu(), L.dropout(0.5),
        L.dense(1, name="fc_out"),
        name="inner",
    )
    return _with_head(add_pair(), body, "D_c2f_a")


def create_g_b(fine_size: int, channels: int) -> Module:
    """Unused variant create_G_b (models_c2f.lua:47-78): (C+1)->64 3x3,
    64->64 3x3, 64->256 5x5, 256->C 7x7."""
    body = sequential(
        L.subpixel_conv(64, 3, 1, name="conv1"), L.prelu(),
        L.subpixel_conv(64, 3, 1, name="conv2"), L.prelu(),
        L.subpixel_conv(256, 5, 1, name="conv3"), L.prelu(),
        L.subpixel_conv(channels, 7, 1, name="conv4"),
        name="inner",
    )
    return _with_head(concat_channels(), body, "G_c2f_b")


def create_g_c(fine_size: int, channels: int) -> Module:
    """Unused variant create_G_c (models_c2f.lua:80-111): (C+1)->64 3x3,
    64->128 3x3, 128->256 5x5, 256->C 7x7."""
    body = sequential(
        L.subpixel_conv(64, 3, 1, name="conv1"), L.prelu(),
        L.subpixel_conv(128, 3, 1, name="conv2"), L.prelu(),
        L.subpixel_conv(256, 5, 1, name="conv3"), L.prelu(),
        L.subpixel_conv(channels, 7, 1, name="conv4"),
        name="inner",
    )
    return _with_head(concat_channels(), body, "G_c2f_c")


def create_d_b(fine_size: int, channels: int) -> Module:
    """Unused variant create_D_b (models_c2f.lua:194-235): 64/64 convs,
    pool, 128/128 convs, pool, fc head — all 3x3."""
    body = sequential(
        L.conv2d(64, 3, name="conv1"), L.prelu(),
        L.conv2d(64, 3, name="conv2"), L.prelu(),
        L.max_pool(2),
        L.conv2d(128, 3, name="conv3"), L.prelu(),
        L.conv2d(128, 3, name="conv4"), L.prelu(),
        L.max_pool(2),
        L.dropout(0.5), L.flatten(),
        L.dense(512, name="fc1"), L.prelu(), L.dropout(0.5),
        L.dense(1, name="fc_out"),
        name="inner",
    )
    return _with_head(add_pair(), body, "D_c2f_b")


def init_c2f(key: jax.Array, fine_size: int, channels: int):
    """Create + init G/D; returns (g, d, bundle)."""
    g = create_g(fine_size, channels)
    d = create_d(fine_size, channels)
    kg, kd = jax.random.split(key)
    noise_shape = (fine_size, fine_size, 1)
    cond_shape = (fine_size, fine_size, channels)
    params_g, state_g, out_g = g.init(kg, (noise_shape, cond_shape))
    diff_shape = (fine_size, fine_size, channels)
    params_d, state_d, out_d = d.init(kd, (diff_shape, cond_shape))
    assert out_g == (fine_size, fine_size, channels), out_g
    assert out_d == (1,), out_d
    return g, d, {
        "params_g": params_g,
        "state_g": state_g,
        "params_d": params_d,
        "state_d": state_d,
    }


def restore_c2f(network: str, default_dir: str = "logs", seed: int = 0):
    """Rebuild the c2f G/D from a checkpoint's own stored config
    (fine_size/coarse_size/grayscale) — the c2f counterpart of
    models/gan.py:restore_gan (sample.lua loads the whole net via
    torch.load; our checkpoints carry the config instead).

    Returns (g, d, bundle, meta, resolved) with resolved mapping
    fine_size/coarse_size/channels/grayscale to the restored values.
    """
    from facegen.utils import checkpoint as ckpt

    directory, name = ckpt.split_network_arg(network, default_dir)
    stored = ckpt.load_meta(directory, name).get("config", {})
    resolved = {
        "fine_size": int(stored.get("fine_size", 32)),
        "coarse_size": int(stored.get("coarse_size", 16)),
        "grayscale": bool(stored.get("grayscale", False)),
    }
    resolved["channels"] = 1 if resolved["grayscale"] else 3
    g, d, bundle = init_c2f(
        jax.random.key(seed), resolved["fine_size"], resolved["channels"]
    )
    bundle, meta = ckpt.load(directory, name, bundle)
    return g, d, bundle, meta, resolved
