"""Generator / discriminator factories for the base GAN.

TPU-native re-design of reference models.lua. Architectures (layer
sequence, widths, kernels, activations) match the reference's used
variants exactly so that parameter counts and training dynamics are
comparable:

- ``create_g`` -> G16 (models.lua:27-51) / G32 (models.lua:57-81):
  Linear(noise -> 128*s0*s0) -> reshape -> PReLU ->
  2 x [nearest-up x2 -> 5x5 conv -> BN -> PReLU] -> 3x3 conv -> sigmoid.
- ``create_d`` -> D16_d (models.lua:279-316) / D32b (models.lua:382-416).
  Our D outputs LOGITS; the reference ends in nn.Sigmoid + BCECriterion
  (models.lua:413, train.lua:148). We fold the sigmoid into the loss
  (sigmoid-BCE) for numerical stability and apply `jax.nn.sigmoid`
  whenever a probability is needed — mathematically identical, stable in
  bfloat16.

Unused reference variants (D16, D16_b, D16_c, D32 — models.lua:110-277,
322-376) are provided too, for checkpoint-level completeness of the
component inventory (SURVEY.md section 2.1 row 5).

Layout note: everything is NHWC; the reference's NCHW `nn.View(128,8,8)`
becomes reshape (8,8,128). That changes which noise coordinate feeds
which plane, not the architecture.
"""

from __future__ import annotations

from typing import Tuple

import jax

from facegen.nn import branches, init as winit, layers as L, sequential
from facegen.nn.core import Module


def _scheme_fn(scheme: str):
    """weight-init.lua:44-48's 'Unsupported regime' guard, with the
    valid names in the message."""
    try:
        return winit.SCHEMES[scheme]
    except KeyError:
        raise ValueError(
            f"unknown init scheme {scheme!r}; "
            f"choose one of {sorted(winit.SCHEMES)}"
        ) from None


def _conv_std(scheme: str, in_c: int, out_c: int, k: int) -> float:
    """Scheme scale for a conv: fan_in = inC*kH*kW, fan_out = outC*kH*kW
    (weight-init.lua:50-56)."""
    return _scheme_fn(scheme)(in_c * k * k, out_c * k * k)


def _dense_std(scheme: str, fan_in: int, fan_out: int) -> float:
    """Scheme scale for a linear layer (weight-init.lua:58-64)."""
    return _scheme_fn(scheme)(fan_in, fan_out)


def _nchw_view(s0: int, c: int) -> Module:
    """nn.View(c,s0,s0) (models.lua:60) followed by a CHW->HWC transpose:
    fc unit ``ch*s0*s0 + y*s0 + x`` feeds plane ``ch`` at pixel (y, x),
    exactly the reference's unit ordering. Named "reshape" so the param
    tree matches the native nhwc view (both are parameter-free)."""
    from facegen.nn.core import stateless

    def init_params(key, in_shape):
        return {}, (s0, s0, c)

    def apply_fn(params, x, ctx):
        return x.reshape(x.shape[0], c, s0, s0).transpose(0, 2, 3, 1)

    return stateless("reshape", init_params, apply_fn)


def create_g(
    scale: int, channels: int, noise_dim: int, scheme: str = "heuristic",
    noise_view: str = "nhwc",
) -> Module:
    """G16/G32 dispatch (models.lua:87-93).

    ``scheme`` selects the weight-init scale applied to every conv/linear
    (weight-init.lua:40-75 dispatch: heuristic/xavier/xavier_caffe/
    kaiming); the reference factory hardcodes 'heuristic' (models.lua:78).
    Biases are zeroed afterwards by ``init_gan`` (weight-init.lua:70-72).

    The two pyramid stages (nearest-up x2 then 5x5 conv) are the hot op;
    see ops/pallas/upsample_conv.py for the fused kernel variant used by
    the optimized forward path.
    """
    if scale == 16:
        s0 = 4  # models.lua:29: Linear(noise, 128*4*4)
    else:
        s0 = scale // 4  # models.lua:59: Linear(noise, 128*8*8) at 32px

    # fc-output -> plane wiring (module docstring "Layout note"):
    # "nhwc" is the native single-reshape; "nchw" reproduces the
    # reference's nn.View(128,s0,s0) unit ordering (models.lua:60)
    # exactly, then transposes to NHWC for the convs. Both are a single
    # parameter-free module named "reshape" so param trees (and thus
    # checkpoints) are layout-independent. Distributionally identical at
    # init (iid fc rows); the ablation checks whether the wiring matters
    # for training dynamics at matched image budgets (ROUND5).
    if noise_view == "nchw":
        view = _nchw_view(s0, 128)
    elif noise_view == "nhwc":
        view = L.reshape((s0, s0, 128))
    else:
        raise ValueError(f"unknown noise_view {noise_view!r}")

    return sequential(
        L.dense(
            128 * s0 * s0,
            w_std=_dense_std(scheme, noise_dim, 128 * s0 * s0),
            name="fc",
        ),
        view,
        L.prelu(),
        L.upsample_conv(
            256, 5, 2, w_std=_conv_std(scheme, 128, 256, 5), name="upconv1"
        ),
        L.batch_norm(),
        L.prelu(),
        L.upsample_conv(
            128, 5, 2, w_std=_conv_std(scheme, 256, 128, 5), name="upconv2"
        ),
        L.batch_norm(),
        L.prelu(),
        L.conv2d(
            channels, 3, w_std=_conv_std(scheme, 128, channels, 3),
            name="conv_out",
        ),
        L.sigmoid(),
        name="G",
    )


def create_d(scale: int, channels: int) -> Module:
    """D dispatch (models.lua:98-104): D16_d at 16px, D32b at 32px."""
    if scale == 16:
        return create_d16_d(scale, channels)
    return create_d32b(scale, channels)


def create_d32b(scale: int, channels: int) -> Module:
    """models.lua:382-416, minus the final sigmoid (folded into loss)."""
    blocks = []
    for out_c in (64, 128, 256, 512):
        blocks += [
            L.conv2d(out_c, 3, name=f"conv{out_c}"),
            L.prelu(),
            L.spatial_dropout(0.2),
            L.avg_pool(2),
        ]
    return sequential(
        *blocks,
        L.flatten(),
        L.dense(512, name="fc1"),
        L.prelu(),
        L.dropout(0.5),
        L.dense(512, name="fc2"),
        L.prelu(),
        L.dropout(0.5),
        L.dense(1, name="fc_out"),
        name="D32b",
    )


def create_d16_d(scale: int, channels: int) -> Module:
    """models.lua:279-316 (the 16px D actually used), logits output."""
    conv_branch = sequential(
        L.conv2d(128, 3, name="conv1"),
        L.prelu(),
        L.conv2d(128, 3, name="conv2"),
        L.prelu(),
        L.avg_pool(2),
        L.conv2d(512, 3, stride=2, name="conv3"),
        L.prelu(),
        L.conv2d(1024, 3, stride=2, name="conv4"),
        L.prelu(),
        L.spatial_dropout(0.5),
        L.flatten(),
        L.dense(1024, name="fc"),
        L.prelu(),
        name="conv_branch",
    )
    dense_branch = sequential(
        L.flatten(),
        L.dense(128, name="fc1"),
        L.prelu(),
        L.dropout(0.5),
        L.dense(128, name="fc2"),
        L.prelu(),
        name="dense_branch",
    )
    return sequential(
        branches(conv_branch, dense_branch),
        L.dense(1, name="fc_out"),
        name="D16d",
    )


def create_d16(scale: int, channels: int) -> Module:
    """Unused reference variant models.lua:110-159 (3-branch), logits."""
    fine = sequential(
        L.conv2d(64, 3, name="conv1"), L.prelu(),
        L.conv2d(64, 3, name="conv2"), L.prelu(),
        L.max_pool(2), L.spatial_dropout(0.5),
        L.flatten(), L.dense(1024, name="fc"), L.prelu(), L.dropout(0.5),
        name="fine",
    )
    coarse = sequential(
        L.conv2d(32, 5, name="conv1"), L.prelu(),
        L.conv2d(64, 5, name="conv2"), L.prelu(),
        L.max_pool(2), L.spatial_dropout(0.5),
        L.flatten(), L.dense(1024, name="fc"), L.prelu(), L.dropout(0.5),
        name="coarse",
    )
    dense_b = sequential(
        L.flatten(), L.dense(1024, name="fc1"), L.prelu(), L.dropout(0.5),
        L.dense(1024, name="fc2"), L.prelu(),
        name="dense",
    )
    return sequential(
        branches(fine, coarse, dense_b),
        L.dense(1024, name="fc_join"), L.prelu(), L.dropout(0.5),
        L.dense(1, name="fc_out"),
        name="D16",
    )


def create_d16_b(scale: int, channels: int) -> Module:
    """Unused reference variant models.lua:161-216 (3-branch with
    strided convs), logits out."""
    fine = sequential(
        L.conv2d(64, 3, name="conv1"), L.prelu(),
        L.conv2d(64, 3, name="conv2"), L.prelu(),
        L.conv2d(128, 3, name="conv3"), L.prelu(),
        L.conv2d(128, 3, stride=2, name="conv4"), L.prelu(),
        L.spatial_dropout(0.5),
        L.flatten(), L.dense(512, name="fc"), L.prelu(), L.dropout(0.5),
        name="fine",
    )
    coarse = sequential(
        L.conv2d(64, 5, name="conv1"), L.prelu(),
        L.conv2d(64, 5, name="conv2"), L.prelu(),
        L.conv2d(128, 5, name="conv3"), L.prelu(),
        L.conv2d(128, 5, stride=2, name="conv4"), L.prelu(),
        L.spatial_dropout(0.5),
        L.flatten(), L.dense(512, name="fc"), L.prelu(), L.dropout(0.5),
        name="coarse",
    )
    dense_b = sequential(
        L.flatten(), L.dense(1024, name="fc1"), L.prelu(), L.dropout(0.5),
        L.dense(1024, name="fc2"), L.prelu(),
        name="dense",
    )
    return sequential(
        branches(fine, coarse, dense_b),
        L.dense(1024, name="fc_join"), L.prelu(), L.dropout(0.5),
        L.dense(1, name="fc_out"),
        name="D16b",
    )


def create_d16_c(scale: int, channels: int) -> Module:
    """Unused reference variant models.lua:218-277 (deeper 3-branch),
    logits out."""
    fine = sequential(
        L.conv2d(64, 3, name="conv1"), L.prelu(),
        L.conv2d(64, 3, name="conv2"), L.prelu(),
        L.conv2d(128, 3, name="conv3"), L.prelu(),
        L.conv2d(128, 3, stride=2, name="conv4"), L.prelu(),
        L.conv2d(512, 3, stride=2, name="conv5"), L.prelu(),
        L.spatial_dropout(0.5),
        L.flatten(), L.dense(1024, name="fc"), L.prelu(),
        name="fine",
    )
    coarse = sequential(
        L.conv2d(64, 5, name="conv1"), L.prelu(),
        L.conv2d(64, 5, name="conv2"), L.prelu(),
        L.conv2d(128, 5, name="conv3"), L.prelu(),
        L.conv2d(128, 5, stride=2, name="conv4"), L.prelu(),
        L.conv2d(512, 5, stride=2, name="conv5"), L.prelu(),
        L.spatial_dropout(0.5),
        L.flatten(), L.dense(1024, name="fc"), L.prelu(),
        name="coarse",
    )
    dense_b = sequential(
        L.flatten(), L.dense(1024, name="fc1"), L.prelu(), L.dropout(0.5),
        L.dense(1024, name="fc2"), L.prelu(),
        name="dense",
    )
    return sequential(
        branches(fine, coarse, dense_b),
        L.dense(1024, name="fc_join"), L.prelu(), L.dropout(0.5),
        L.dense(1, name="fc_out"),
        name="D16c",
    )


def create_g_flat(scale: int, channels: int, noise_dim: int) -> Module:
    """The dead first create_G definition (models.lua:12-21, shadowed by
    the later one): Linear -> 2048 PReLU -> Linear -> sigmoid -> image."""
    input_sz = scale * scale * channels
    return sequential(
        L.dense(2048, name="fc1"),
        L.prelu(),
        L.dense(input_sz, name="fc2"),
        L.sigmoid(),
        L.reshape((scale, scale, channels)),
        name="G_flat",
    )


def create_d32(scale: int, channels: int) -> Module:
    """Unused reference variant models.lua:322-376 (3-branch), logits."""
    fine = sequential(
        L.conv2d(64, 3, name="conv1"), L.prelu(),
        L.conv2d(64, 3, name="conv2"), L.prelu(),
        L.max_pool(2), L.spatial_dropout(0.5),
        L.flatten(), L.dense(1024, name="fc"), L.prelu(),
        name="fine",
    )
    coarse = sequential(
        L.conv2d(32, 5, name="conv1"), L.prelu(),
        L.conv2d(32, 5, name="conv2"), L.prelu(),
        L.max_pool(2),
        L.conv2d(54, 5, name="conv3"), L.prelu(),
        L.conv2d(54, 5, name="conv4"), L.prelu(),
        L.max_pool(2), L.spatial_dropout(0.5),
        L.flatten(), L.dense(1024, name="fc1"), L.prelu(), L.dropout(0.5),
        L.dense(1024, name="fc2"), L.prelu(),
        name="coarse",
    )
    dense_b = sequential(
        L.flatten(), L.dense(1024, name="fc1"), L.prelu(), L.dropout(0.5),
        L.dense(1024, name="fc2"), L.prelu(),
        name="dense",
    )
    return sequential(
        branches(fine, coarse, dense_b),
        L.dense(1024, name="fc_join"), L.prelu(), L.dropout(0.5),
        L.dense(1, name="fc_out"),
        name="D32",
    )


def init_gan(
    key: jax.Array,
    scale: int,
    channels: int,
    noise_dim: int,
    reference_init: bool = True,
    scheme: str = "heuristic",
    noise_view: str = "nhwc",
) -> Tuple[Module, Module, dict]:
    """Create G and D with reference-parity initialization.

    reference_init=True reproduces the full reference pipeline: scheme
    init inside the factories, then train.lua:137-138's gaussian
    overwrite of every layer (N(0,0.005^2) weights / N(0,0.001^2)
    biases — including PReLU slopes and BN gammas; SURVEY.md quirk b).
    reference_init=False keeps the scheme init (the sane "modern"
    option).

    ``scheme`` dispatches weight-init.lua:40-75's four scale schemes on
    G (the reference applies weight-init to G only, models.lua:78; D
    keeps torch's default reset). G's biases are then zeroed, matching
    weight-init.lua:70-72 — under reference_init=True the gaussian
    overwrite replaces them anyway, preserving the published quirk.

    Returns (G, D, bundle) where bundle holds params/state for both.
    """
    g = create_g(scale, channels, noise_dim, scheme=scheme,
                 noise_view=noise_view)
    d = create_d(scale, channels)
    kg, kd, kog, kod = jax.random.split(key, 4)
    params_g, state_g, out_g = g.init(kg, (noise_dim,))
    params_g = winit.zero_biases(params_g)
    params_d, state_d, out_d = d.init(kd, (scale, scale, channels))
    assert out_g == (scale, scale, channels), out_g
    assert out_d == (1,), out_d
    if reference_init:
        params_g = winit.gaussian_overwrite(params_g, kog)
        params_d = winit.gaussian_overwrite(params_d, kod)
    bundle = {
        "params_g": params_g,
        "state_g": state_g,
        "params_d": params_d,
        "state_d": state_d,
    }
    return g, d, bundle


def restore_gan(
    network: str,
    default_dir: str = "logs",
    scale=None,
    grayscale=None,
    noise_dim=None,
    seed: int = 0,
):
    """Rebuild G/D from a checkpoint using the checkpoint's OWN config.

    The reference needs no shape flags at load time because torch.load
    carries the whole net (sample.lua:247-274); here the same holds
    because every checkpoint stores its run config (the `opt = OPT`
    field of adversarial.lua:328 -> utils/checkpoint.py:config_meta).
    Explicit keyword values are checked overrides: None means "use the
    checkpoint's value"; a non-None value that contradicts the stored
    config raises immediately with both values spelled out (the arrays
    could not restore into the mismatched template anyway, but that
    error would be an opaque shape complaint).

    Returns (g, d, bundle, meta, resolved) where resolved maps
    scale/grayscale/channels/noise_dim to the values actually used.
    """
    import os

    from facegen.utils import checkpoint as ckpt

    directory, name = ckpt.split_network_arg(network, default_dir)
    stored = ckpt.load_meta(directory, name).get("config", {})

    def pick(given, key, fallback):
        have = stored.get(key)
        if given is not None and have is not None and given != have:
            raise ValueError(
                f"checkpoint {os.path.join(directory, name)!r} was trained "
                f"with {key}={have!r} but {key}={given!r} was requested; "
                f"drop the flag to use the checkpoint's own value"
            )
        if given is not None:
            return given
        return have if have is not None else fallback

    resolved = {
        "scale": int(pick(scale, "scale", 32)),
        "grayscale": bool(pick(grayscale, "grayscale", False)),
        "noise_dim": int(pick(noise_dim, "noise_dim", 100)),
    }
    resolved["channels"] = 1 if resolved["grayscale"] else 3
    resolved["noise_view"] = str(pick(None, "noise_view", "nhwc"))
    g, d, bundle = init_gan(
        jax.random.key(seed), resolved["scale"], resolved["channels"],
        resolved["noise_dim"], noise_view=resolved["noise_view"],
    )
    bundle, meta = ckpt.load(directory, name, bundle)
    return g, d, bundle, meta, resolved
