"""Cross-framework golden tests: facegen models vs an independent
PyTorch implementation of the reference architectures, with identical
weights. This pins the architecture semantics (layer order, padding,
PReLU sharing, BN eval behavior, the fused upsample+conv decomposition)
against a second implementation, not just against ourselves.

Eval mode only (dropout off; BN uses running stats) so outputs are
deterministic. fp32 everywhere; tolerances are set from MEASURED
accumulation-order / phase-collapse drift (~1e-5 for the normalized
nets, ~1.5e-4 for the unnormalized c2f conv stack) with ~20x margin.
The flatten/reshape boundaries need explicit feature-order permutations
(facegen flattens NHWC, torch CHW — see cols/rows_nhwc_to_chw): without
them the torch net is a different function whose fresh-init outputs
merely fit inside a loose 2e-3 tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from facegen.models import gan
from facegen.nn.core import Ctx


def to_t(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def cols_nhwc_to_chw(w, h, wd, c):
    """Permute the OUTPUT columns of a (in, h*w*c) dense kernel from the
    NHWC flatten order facegen uses (nn/layers.py flatten/reshape) to the
    CHW order torch's Flatten/Unflatten use — without this the torch net
    is a DIFFERENT function whose output merely looks similar at
    fresh-init weights (caught when the original tests' 2e-3 atol was
    probed with other seeds)."""
    w = np.asarray(w, np.float32)
    return w.reshape(w.shape[0], h, wd, c).transpose(0, 3, 1, 2).reshape(
        w.shape[0], -1)


def vec_nhwc_to_chw(b, h, wd, c):
    b = np.asarray(b, np.float32)
    return b.reshape(h, wd, c).transpose(2, 0, 1).reshape(-1)


def rows_nhwc_to_chw(w, h, wd, c):
    """Permute the INPUT rows of a (h*w*c, out) dense kernel from NHWC
    flatten order to torch's CHW Flatten order."""
    w = np.asarray(w, np.float32)
    return w.reshape(h, wd, c, w.shape[-1]).transpose(2, 0, 1, 3).reshape(
        -1, w.shape[-1])


def build_torch_g32(params, state, channels):
    import torch.nn as nn

    net = nn.Sequential(
        nn.Linear(100, 128 * 8 * 8),
        nn.PReLU(),
        nn.Unflatten(1, (128, 8, 8)),
        nn.UpsamplingNearest2d(scale_factor=2),
        nn.Conv2d(128, 256, 5, padding=2),
        nn.BatchNorm2d(256),
        nn.PReLU(),
        nn.UpsamplingNearest2d(scale_factor=2),
        nn.Conv2d(256, 128, 5, padding=2),
        nn.BatchNorm2d(128),
        nn.PReLU(),
        nn.Conv2d(128, channels, 3, padding=1),
        nn.Sigmoid(),
    )
    with torch.no_grad():
        # facegen's fc feeds an NHWC (8,8,128) reshape; torch's Unflatten
        # is (128,8,8) — permute the output columns to match exactly
        net[0].weight.copy_(
            to_t(cols_nhwc_to_chw(params["00_fc"]["w"], 8, 8, 128)).T)
        net[0].bias.copy_(to_t(vec_nhwc_to_chw(params["00_fc"]["b"], 8, 8, 128)))
        net[1].weight.copy_(to_t(params["02_prelu"]["a"]))
        for t_idx, key in [(4, "03_upconv1"), (8, "06_upconv2"), (11, "09_conv_out")]:
            # HWIO -> OIHW
            net[t_idx].weight.copy_(to_t(params[key]["w"]).permute(3, 2, 0, 1))
            net[t_idx].bias.copy_(to_t(params[key]["b"]))
        for t_idx, key in [(5, "04_batch_norm"), (9, "07_batch_norm")]:
            net[t_idx].weight.copy_(to_t(params[key]["scale"]))
            net[t_idx].bias.copy_(to_t(params[key]["bias"]))
            net[t_idx].running_mean.copy_(to_t(state[key]["mean"]))
            net[t_idx].running_var.copy_(to_t(state[key]["var"]))
        net[6].weight.copy_(to_t(params["05_prelu"]["a"]))
        net[10].weight.copy_(to_t(params["08_prelu"]["a"]))
    net.eval()
    return net


def test_g32_forward_matches_torch():
    channels = 3
    g = gan.create_g(32, channels, 100)
    params, state, _ = g.init(jax.random.key(0), (100,))
    # give BN non-trivial running stats
    state = jax.tree.map(
        lambda a: a + 0.05 if a.ndim == 1 else a, state
    )
    z = np.asarray(
        jax.random.uniform(jax.random.key(1), (4, 100), jnp.float32, -1, 1)
    )
    ours, _ = g.apply(params, state, jnp.asarray(z), Ctx(None, False))
    ours = np.asarray(ours)  # NHWC

    net = build_torch_g32(params, state, channels)
    with torch.no_grad():
        theirs = net(to_t(z)).numpy()  # NCHW
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    # measured fp32 drift (phase-conv reassociation) is ~1e-5; 2e-4
    # keeps 20x margin while still failing on any layout mismatch
    # (the old un-permuted fc was a 2e-3-scale error)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def build_torch_d32b(params, channels):
    import torch.nn as nn

    layers = []
    in_c = channels
    conv_keys = []
    for i, out_c in enumerate((64, 128, 256, 512)):
        layers += [
            nn.Conv2d(in_c, out_c, 3, padding=1),
            nn.PReLU(),
            nn.Dropout2d(0.2),
            nn.AvgPool2d(2),
        ]
        in_c = out_c
    layers += [
        nn.Flatten(),
        nn.Linear(512 * 2 * 2, 512), nn.PReLU(), nn.Dropout(),
        nn.Linear(512, 512), nn.PReLU(), nn.Dropout(),
        nn.Linear(512, 1),
    ]
    net = nn.Sequential(*layers)
    with torch.no_grad():
        conv_map = [(0, "00_conv64"), (4, "04_conv128"), (8, "08_conv256"),
                    (12, "12_conv512")]
        for t_idx, key in conv_map:
            net[t_idx].weight.copy_(to_t(params[key]["w"]).permute(3, 2, 0, 1))
            net[t_idx].bias.copy_(to_t(params[key]["b"]))
            net[t_idx + 1].weight.copy_(to_t(params[f"{t_idx+1:02d}_prelu"]["a"]))
        # fc1 consumes the flatten of a (2,2,512) NHWC map; torch's
        # Flatten is CHW — permute fc1's input rows to match exactly
        net[17].weight.copy_(
            to_t(rows_nhwc_to_chw(params["17_fc1"]["w"], 2, 2, 512)).T)
        net[17].bias.copy_(to_t(params["17_fc1"]["b"]))
        fc_map = [(20, "20_fc2"), (23, "23_fc_out")]
        for t_idx, key in fc_map:
            net[t_idx].weight.copy_(to_t(params[key]["w"]).T)
            net[t_idx].bias.copy_(to_t(params[key]["b"]))
        net[18].weight.copy_(to_t(params["18_prelu"]["a"]))
        net[21].weight.copy_(to_t(params["21_prelu"]["a"]))
    net.eval()
    return net


def test_c2f_g_forward_matches_torch():
    """Conditional refiner G_d: channel-concat head + 5-conv stack
    (models_c2f.lua:113-145) vs an independent torch build."""
    import torch.nn as nn

    from facegen.models import c2f as c2f_models

    channels, fs = 1, 16
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), fs, channels)
    p = bundle["params_g"]["body"]

    convs = [("00_conv1", 64, 3), ("02_conv2", 64, 3), ("04_conv3", 128, 5),
             ("06_conv4", 256, 5), ("08_conv5", channels, 7)]
    layers = []
    in_c = channels + 1
    for i, (key, out_c, k) in enumerate(convs):
        layers.append(nn.Conv2d(in_c, out_c, k, padding=(k - 1) // 2))
        if i < len(convs) - 1:
            layers.append(nn.PReLU())
        in_c = out_c
    net = nn.Sequential(*layers)
    with torch.no_grad():
        t_idx = 0
        for i, (key, out_c, k) in enumerate(convs):
            # subpixel_conv(factor=1) stores its conv under "inner"
            w = p[key]["inner"]["w"] if "inner" in p[key] else p[key]["w"]
            b = p[key]["inner"]["b"] if "inner" in p[key] else p[key]["b"]
            net[t_idx].weight.copy_(to_t(w).permute(3, 2, 0, 1))
            net[t_idx].bias.copy_(to_t(b))
            t_idx += 1
            if i < len(convs) - 1:
                prelu_key = f"{int(key[:2]) + 1:02d}_prelu"
                net[t_idx].weight.copy_(to_t(bundle["params_g"]["body"][prelu_key]["a"]))
                t_idx += 1
    net.eval()

    z = np.asarray(jax.random.uniform(jax.random.key(1), (2, fs, fs, 1),
                                      jnp.float32, -1, 1))
    cond = np.asarray(jax.random.uniform(jax.random.key(2), (2, fs, fs, channels),
                                         jnp.float32))
    ours, _ = g.apply(bundle["params_g"], bundle["state_g"],
                      (jnp.asarray(z), jnp.asarray(cond)), Ctx(None, False))
    joint = np.concatenate([z, cond], axis=-1)  # NHWC concat (noise first)
    with torch.no_grad():
        theirs = net(to_t(np.transpose(joint, (0, 3, 1, 2)))).numpy()
    theirs = np.transpose(theirs, (0, 2, 3, 1))
    # unnormalized 5-conv stack: measured fp32 drift ~1.5e-4
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=5e-4, atol=5e-4)


def test_d32b_forward_matches_torch():
    channels = 3
    d = gan.create_d32b(32, channels)
    params, state, _ = d.init(jax.random.key(0), (32, 32, channels))
    x = np.asarray(
        jax.random.uniform(jax.random.key(1), (4, 32, 32, channels), jnp.float32)
    )
    ours, _ = d.apply(params, state, jnp.asarray(x), Ctx(None, False))
    ours = np.asarray(ours)

    net = build_torch_d32b(params, channels)
    with torch.no_grad():
        theirs = net(to_t(np.transpose(x, (0, 3, 1, 2)))).numpy()
    # measured fp32 accumulation drift across the 4-conv stack is ~1e-5
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_g16_forward_matches_torch():
    """The 16px generator (models.lua:27-51: Linear(noise, 128*4*4) head,
    same pyramid) vs an independent torch build — the --scale 16 route."""
    import torch.nn as nn

    channels = 1
    g = gan.create_g(16, channels, 100)
    params, state, _ = g.init(jax.random.key(0), (100,))
    state = jax.tree.map(lambda a: a + 0.05 if a.ndim == 1 else a, state)

    net = nn.Sequential(
        nn.Linear(100, 128 * 4 * 4),
        nn.PReLU(),
        nn.Unflatten(1, (128, 4, 4)),
        nn.UpsamplingNearest2d(scale_factor=2),
        nn.Conv2d(128, 256, 5, padding=2),
        nn.BatchNorm2d(256),
        nn.PReLU(),
        nn.UpsamplingNearest2d(scale_factor=2),
        nn.Conv2d(256, 128, 5, padding=2),
        nn.BatchNorm2d(128),
        nn.PReLU(),
        nn.Conv2d(128, channels, 3, padding=1),
        nn.Sigmoid(),
    )
    with torch.no_grad():
        net[0].weight.copy_(
            to_t(cols_nhwc_to_chw(params["00_fc"]["w"], 4, 4, 128)).T)
        net[0].bias.copy_(to_t(vec_nhwc_to_chw(params["00_fc"]["b"], 4, 4, 128)))
        net[1].weight.copy_(to_t(params["02_prelu"]["a"]))
        for t_idx, key in [(4, "03_upconv1"), (8, "06_upconv2"), (11, "09_conv_out")]:
            net[t_idx].weight.copy_(to_t(params[key]["w"]).permute(3, 2, 0, 1))
            net[t_idx].bias.copy_(to_t(params[key]["b"]))
        for t_idx, key in [(5, "04_batch_norm"), (9, "07_batch_norm")]:
            net[t_idx].weight.copy_(to_t(params[key]["scale"]))
            net[t_idx].bias.copy_(to_t(params[key]["bias"]))
            net[t_idx].running_mean.copy_(to_t(state[key]["mean"]))
            net[t_idx].running_var.copy_(to_t(state[key]["var"]))
        net[6].weight.copy_(to_t(params["05_prelu"]["a"]))
        net[10].weight.copy_(to_t(params["08_prelu"]["a"]))
    net.eval()

    z = np.asarray(jax.random.uniform(jax.random.key(1), (4, 100),
                                      jnp.float32, -1, 1))
    ours, _ = g.apply(params, state, jnp.asarray(z), Ctx(None, False))
    with torch.no_grad():
        theirs = np.transpose(net(to_t(z)).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_d16d_forward_matches_torch():
    """The 16px discriminator actually used (models.lua:279-316): a
    conv branch and a dense branch joined by ConcatTable/JoinTable."""
    import torch.nn as nn

    channels = 1
    d = gan.create_d16_d(16, channels)
    params, state, _ = d.init(jax.random.key(0), (16, 16, channels))
    x = np.asarray(jax.random.uniform(jax.random.key(1), (4, 16, 16, channels),
                                      jnp.float32))
    ours, _ = d.apply(params, state, jnp.asarray(x), Ctx(None, False))

    class D16d(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv_branch = nn.Sequential(
                nn.Conv2d(channels, 128, 3, padding=1), nn.PReLU(),
                nn.Conv2d(128, 128, 3, padding=1), nn.PReLU(),
                nn.AvgPool2d(2),
                nn.Conv2d(128, 512, 3, stride=2, padding=1), nn.PReLU(),
                nn.Conv2d(512, 1024, 3, stride=2, padding=1), nn.PReLU(),
                nn.Dropout2d(0.5), nn.Flatten(),
                nn.Linear(1024 * 2 * 2, 1024), nn.PReLU(),
            )
            self.dense_branch = nn.Sequential(
                nn.Flatten(),
                nn.Linear(16 * 16 * channels, 128), nn.PReLU(),
                nn.Dropout(0.5),
                nn.Linear(128, 128), nn.PReLU(),
            )
            self.fc_out = nn.Linear(1024 + 128, 1)

        def forward(self, x):
            return self.fc_out(
                torch.cat([self.conv_branch(x), self.dense_branch(x)], dim=1))

    net = D16d()
    pb = params["00_branches"]
    cb, db = pb["00_conv_branch"], pb["01_dense_branch"]
    with torch.no_grad():
        conv_map = [(0, "00_conv1"), (2, "02_conv2"), (5, "05_conv3"),
                    (7, "07_conv4")]
        for t_idx, key in conv_map:
            net.conv_branch[t_idx].weight.copy_(
                to_t(cb[key]["w"]).permute(3, 2, 0, 1))
            net.conv_branch[t_idx].bias.copy_(to_t(cb[key]["b"]))
            prelu_key = f"{int(key[:2]) + 1:02d}_prelu"
            net.conv_branch[t_idx + 1].weight.copy_(to_t(cb[prelu_key]["a"]))
        # conv-branch fc consumes the NHWC (2,2,1024) flatten
        net.conv_branch[11].weight.copy_(
            to_t(rows_nhwc_to_chw(cb["11_fc"]["w"], 2, 2, 1024)).T)
        net.conv_branch[11].bias.copy_(to_t(cb["11_fc"]["b"]))
        net.conv_branch[12].weight.copy_(to_t(cb["12_prelu"]["a"]))
        # dense-branch fc1 consumes the NHWC flatten of the input image
        net.dense_branch[1].weight.copy_(
            to_t(rows_nhwc_to_chw(db["01_fc1"]["w"], 16, 16, channels)).T)
        net.dense_branch[1].bias.copy_(to_t(db["01_fc1"]["b"]))
        net.dense_branch[2].weight.copy_(to_t(db["02_prelu"]["a"]))
        net.dense_branch[4].weight.copy_(to_t(db["04_fc2"]["w"]).T)
        net.dense_branch[4].bias.copy_(to_t(db["04_fc2"]["b"]))
        net.dense_branch[5].weight.copy_(to_t(db["05_prelu"]["a"]))
        net.fc_out.weight.copy_(to_t(params["01_fc_out"]["w"]).T)
        net.fc_out.bias.copy_(to_t(params["01_fc_out"]["b"]))
    net.eval()
    with torch.no_grad():
        theirs = net(to_t(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_batch_norm_train_mode_matches_torch():
    """Train-mode BN semantics vs torch: normalize by BIASED batch
    variance, update running_var with the UNBIASED one, momentum 0.1
    (nn.SpatialBatchNormalization; the classic cross-framework trap).
    Measured parity ~6e-7."""
    from facegen.nn import layers as L

    bn = L.batch_norm()
    params, state, _ = bn.init(jax.random.key(0), (8, 8, 5))
    rs = np.random.RandomState
    params["scale"] = jnp.asarray(rs(0).uniform(0.5, 1.5, 5).astype(np.float32))
    params["bias"] = jnp.asarray(rs(1).uniform(-0.5, 0.5, 5).astype(np.float32))
    state = {"mean": jnp.asarray(rs(2).normal(0, 1, 5).astype(np.float32)),
             "var": jnp.asarray(rs(3).uniform(0.5, 2, 5).astype(np.float32))}
    x = rs(4).normal(0, 2, (4, 8, 8, 5)).astype(np.float32)
    y, new_state = bn.apply(params, state, jnp.asarray(x),
                            Ctx(jax.random.key(1), True))

    tbn = torch.nn.BatchNorm2d(5, momentum=0.1)
    with torch.no_grad():
        tbn.weight.copy_(to_t(params["scale"]))
        tbn.bias.copy_(to_t(params["bias"]))
        tbn.running_mean.copy_(to_t(state["mean"]))
        tbn.running_var.copy_(to_t(state["var"]))
    tbn.train()
    ty = tbn(to_t(np.transpose(x, (0, 3, 1, 2)))).detach().numpy()
    np.testing.assert_allclose(np.asarray(y), ty.transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_autoencoder_forward_matches_torch():
    """The flat AE (train_autoencoder.lua:79-92): View -> 512 ReLU ->
    noiseDim tanh -> dropout -> 256 ReLU -> input_sz sigmoid -> View.
    Grayscale (C=1), so NHWC and CHW flatten orders coincide."""
    import torch.nn as nn

    from facegen.models import ae as AE

    scale, nd = 16, 32
    model = AE.create_autoencoder(scale, 1, nd)
    params, state, _ = model.init(jax.random.key(0), (scale, scale, 1))
    x = np.asarray(jax.random.uniform(jax.random.key(1), (4, scale, scale, 1),
                                      jnp.float32))
    ours, _ = model.apply(params, state, jnp.asarray(x), Ctx(None, False))

    net = nn.Sequential(
        nn.Flatten(),
        nn.Linear(scale * scale, 512), nn.ReLU(),
        nn.Linear(512, nd), nn.Tanh(),
        nn.Dropout(0.5),
        nn.Linear(nd, 256), nn.ReLU(),
        nn.Linear(256, scale * scale), nn.Sigmoid(),
        nn.Unflatten(1, (1, scale, scale)),
    )
    with torch.no_grad():
        for t_idx, key in [(1, "01_enc1"), (3, "03_enc2"), (6, "06_dec1"),
                           (8, "08_dec2")]:
            net[t_idx].weight.copy_(to_t(params[key]["w"]).T)
            net[t_idx].bias.copy_(to_t(params[key]["b"]))
    net.eval()
    with torch.no_grad():
        theirs = net(to_t(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.transpose(0, 2, 3, 1),
                               rtol=1e-5, atol=1e-5)


def test_denoiser_decoder_forward_matches_torch():
    """The denoiser decoder (train_denoiser.lua:86-106): 2 x [3x3 VALID
    conv to 8ch + BN + LeakyReLU(1/3)] -> dropout -> Linear 8*(s-4)^2 ->
    2048 + BN1d + LeakyReLU -> dropout -> Linear -> sigmoid -> View."""
    import torch.nn as nn

    from facegen.models import ae as AE

    scale = 16
    dec = AE.create_denoiser_decoder(scale, 1)
    params, state, _ = dec.init(jax.random.key(0), (scale, scale, 1))
    # non-trivial BN running stats
    state = jax.tree.map(lambda a: a + 0.03 if a.ndim == 1 else a, state)
    x = np.asarray(jax.random.uniform(jax.random.key(1), (4, scale, scale, 1),
                                      jnp.float32))
    ours, _ = dec.apply(params, state, jnp.asarray(x), Ctx(None, False))

    s4 = scale - 4
    net = nn.Sequential(
        nn.Conv2d(1, 8, 3), nn.BatchNorm2d(8), nn.LeakyReLU(1.0 / 3.0),
        nn.Conv2d(8, 8, 3), nn.BatchNorm2d(8), nn.LeakyReLU(1.0 / 3.0),
        nn.Dropout(0.2), nn.Flatten(),
        nn.Linear(8 * s4 * s4, 2048), nn.BatchNorm1d(2048),
        nn.LeakyReLU(1.0 / 3.0), nn.Dropout(0.2),
        nn.Linear(2048, scale * scale), nn.Sigmoid(),
        nn.Unflatten(1, (1, scale, scale)),
    )
    with torch.no_grad():
        for t_idx, key in [(0, "00_conv1"), (3, "03_conv2")]:
            net[t_idx].weight.copy_(to_t(params[key]["w"]).permute(3, 2, 0, 1))
            net[t_idx].bias.copy_(to_t(params[key]["b"]))
        for t_idx, key in [(1, "01_batch_norm"), (4, "04_batch_norm"),
                           (9, "09_batch_norm")]:
            net[t_idx].weight.copy_(to_t(params[key]["scale"]))
            net[t_idx].bias.copy_(to_t(params[key]["bias"]))
            net[t_idx].running_mean.copy_(to_t(state[key]["mean"]))
            net[t_idx].running_var.copy_(to_t(state[key]["var"]))
        # fc1 consumes the NHWC (s-4, s-4, 8) flatten; torch is CHW
        net[8].weight.copy_(
            to_t(rows_nhwc_to_chw(params["08_fc1"]["w"], s4, s4, 8)).T)
        net[8].bias.copy_(to_t(params["08_fc1"]["b"]))
        net[12].weight.copy_(to_t(params["12_fc_out"]["w"]).T)
        net[12].bias.copy_(to_t(params["12_fc_out"]["b"]))
    net.eval()
    with torch.no_grad():
        theirs = net(to_t(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.transpose(0, 2, 3, 1),
                               rtol=2e-4, atol=2e-4)


def test_d32_three_branch_forward_matches_torch():
    """The unused-variant 3-branch D32 (models.lua:322-376): fine/coarse
    conv branches + a dense branch, ConcatTable/JoinTable, joined fc.
    Pins the branch-concat ordering and all three flatten boundaries."""
    import torch.nn as nn

    channels = 3
    d = gan.create_d32(32, channels)
    params, state, _ = d.init(jax.random.key(0), (32, 32, channels))
    x = np.asarray(jax.random.uniform(jax.random.key(1), (4, 32, 32, channels),
                                      jnp.float32))
    ours, _ = d.apply(params, state, jnp.asarray(x), Ctx(None, False))

    class D32(nn.Module):
        def __init__(self):
            super().__init__()
            self.fine = nn.Sequential(
                nn.Conv2d(channels, 64, 3, padding=1), nn.PReLU(),
                nn.Conv2d(64, 64, 3, padding=1), nn.PReLU(),
                nn.MaxPool2d(2), nn.Dropout2d(0.5), nn.Flatten(),
                nn.Linear(64 * 16 * 16, 1024), nn.PReLU(),
            )
            self.coarse = nn.Sequential(
                nn.Conv2d(channels, 32, 5, padding=2), nn.PReLU(),
                nn.Conv2d(32, 32, 5, padding=2), nn.PReLU(),
                nn.MaxPool2d(2),
                nn.Conv2d(32, 54, 5, padding=2), nn.PReLU(),
                nn.Conv2d(54, 54, 5, padding=2), nn.PReLU(),
                nn.MaxPool2d(2), nn.Dropout2d(0.5), nn.Flatten(),
                nn.Linear(54 * 8 * 8, 1024), nn.PReLU(), nn.Dropout(0.5),
                nn.Linear(1024, 1024), nn.PReLU(),
            )
            self.dense = nn.Sequential(
                nn.Flatten(),
                nn.Linear(32 * 32 * channels, 1024), nn.PReLU(),
                nn.Dropout(0.5),
                nn.Linear(1024, 1024), nn.PReLU(),
            )
            self.head = nn.Sequential(
                nn.Linear(3 * 1024, 1024), nn.PReLU(), nn.Dropout(0.5),
                nn.Linear(1024, 1),
            )

        def forward(self, x):
            return self.head(torch.cat(
                [self.fine(x), self.coarse(x), self.dense(x)], dim=1))

    net = D32()
    pb = params["00_branches"]
    fine, coarse, dense = pb["00_fine"], pb["01_coarse"], pb["02_dense"]

    def load_conv(t, p):
        t.weight.copy_(to_t(p["w"]).permute(3, 2, 0, 1))
        t.bias.copy_(to_t(p["b"]))

    def load_fc(t, p, hwc=None):
        w = p["w"] if hwc is None else rows_nhwc_to_chw(p["w"], *hwc)
        t.weight.copy_(to_t(w).T)
        t.bias.copy_(to_t(p["b"]))

    with torch.no_grad():
        load_conv(net.fine[0], fine["00_conv1"])
        net.fine[1].weight.copy_(to_t(fine["01_prelu"]["a"]))
        load_conv(net.fine[2], fine["02_conv2"])
        net.fine[3].weight.copy_(to_t(fine["03_prelu"]["a"]))
        load_fc(net.fine[7], fine["07_fc"], hwc=(16, 16, 64))
        net.fine[8].weight.copy_(to_t(fine["08_prelu"]["a"]))

        load_conv(net.coarse[0], coarse["00_conv1"])
        net.coarse[1].weight.copy_(to_t(coarse["01_prelu"]["a"]))
        load_conv(net.coarse[2], coarse["02_conv2"])
        net.coarse[3].weight.copy_(to_t(coarse["03_prelu"]["a"]))
        load_conv(net.coarse[5], coarse["05_conv3"])
        net.coarse[6].weight.copy_(to_t(coarse["06_prelu"]["a"]))
        load_conv(net.coarse[7], coarse["07_conv4"])
        net.coarse[8].weight.copy_(to_t(coarse["08_prelu"]["a"]))
        load_fc(net.coarse[12], coarse["12_fc1"], hwc=(8, 8, 54))
        net.coarse[13].weight.copy_(to_t(coarse["13_prelu"]["a"]))
        load_fc(net.coarse[15], coarse["15_fc2"])
        net.coarse[16].weight.copy_(to_t(coarse["16_prelu"]["a"]))

        load_fc(net.dense[1], dense["01_fc1"], hwc=(32, 32, channels))
        net.dense[2].weight.copy_(to_t(dense["02_prelu"]["a"]))
        load_fc(net.dense[4], dense["04_fc2"])
        net.dense[5].weight.copy_(to_t(dense["05_prelu"]["a"]))

        load_fc(net.head[0], params["01_fc_join"])
        net.head[1].weight.copy_(to_t(params["02_prelu"]["a"]))
        load_fc(net.head[3], params["04_fc_out"])
    net.eval()
    with torch.no_grad():
        theirs = net(to_t(np.transpose(x, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_c2f_d_forward_matches_torch():
    """The used c2f discriminator D_c (models_c2f.lua:237-278):
    CAddTable (diff + coarse = reconstructed fine) -> 4-conv stack ->
    fc. Pins the add-head and the flatten boundary."""
    import torch.nn as nn

    from facegen.models import c2f as c2f_models

    channels, fs = 3, 32
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), fs, channels)
    pd = bundle["params_d"]["body"]
    diff = np.asarray(jax.random.uniform(jax.random.key(1),
                                         (2, fs, fs, channels),
                                         jnp.float32, -0.3, 0.3))
    coarse = np.asarray(jax.random.uniform(jax.random.key(2),
                                           (2, fs, fs, channels), jnp.float32))
    ours, _ = d.apply(bundle["params_d"], bundle["state_d"],
                      (jnp.asarray(diff), jnp.asarray(coarse)),
                      Ctx(None, False))

    net = nn.Sequential(
        nn.Conv2d(channels, 64, 3, padding=1), nn.PReLU(),
        nn.Conv2d(64, 64, 3, padding=1), nn.PReLU(),
        nn.MaxPool2d(2),
        nn.Conv2d(64, 128, 3, padding=1), nn.PReLU(),
        nn.Conv2d(128, 256, 3, padding=1), nn.PReLU(),
        nn.MaxPool2d(2), nn.Dropout(0.5), nn.Flatten(),
        nn.Linear(256 * 8 * 8, 512), nn.PReLU(), nn.Dropout(0.5),
        nn.Linear(512, 1),
    )
    with torch.no_grad():
        conv_map = [(0, "00_conv1"), (2, "02_conv2"), (5, "05_conv3"),
                    (7, "07_conv4")]
        for t_idx, key in conv_map:
            net[t_idx].weight.copy_(to_t(pd[key]["w"]).permute(3, 2, 0, 1))
            net[t_idx].bias.copy_(to_t(pd[key]["b"]))
            prelu_key = f"{int(key[:2]) + 1:02d}_prelu"
            net[t_idx + 1].weight.copy_(to_t(pd[prelu_key]["a"]))
        net[12].weight.copy_(
            to_t(rows_nhwc_to_chw(pd["12_fc1"]["w"], 8, 8, 256)).T)
        net[12].bias.copy_(to_t(pd["12_fc1"]["b"]))
        net[13].weight.copy_(to_t(pd["13_prelu"]["a"]))
        net[15].weight.copy_(to_t(pd["15_fc_out"]["w"]).T)
        net[15].bias.copy_(to_t(pd["15_fc_out"]["b"]))
    net.eval()
    summed = np.transpose(diff + coarse, (0, 3, 1, 2))  # the CAddTable head
    with torch.no_grad():
        theirs = net(to_t(summed)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def _load_sequential_params(tnet, p, fc_hwc=None):
    """Copy a facegen sequential's params into a torch Sequential built
    with the SAME layer order (facegen keys are '{idx:02d}_{name}', so
    torch index == idx). fc_hwc maps a dense layer's index to the
    (h, w, c) of the NHWC flatten feeding it (rows permuted to CHW)."""
    fc_hwc = fc_hwc or {}
    for key, sub in p.items():
        if not isinstance(sub, dict) or not sub:
            continue
        i = int(key[:2])
        if "w" in sub:
            w = sub["w"]
            if np.ndim(w) == 4:
                tnet[i].weight.copy_(to_t(w).permute(3, 2, 0, 1))
            else:
                ww = (rows_nhwc_to_chw(w, *fc_hwc[i]) if i in fc_hwc
                      else np.asarray(w, np.float32))
                tnet[i].weight.copy_(to_t(ww).T)
            tnet[i].bias.copy_(to_t(sub["b"]))
        elif "a" in sub:
            tnet[i].weight.copy_(to_t(sub["a"]))


def _run_three_branch_variant(factory, make_branches, scale, channels):
    """Shared harness for the 3-branch D variants: build ours + a torch
    mirror, load weights, compare eval-mode logits."""
    import torch.nn as nn

    d = factory(scale, channels)
    params, state, _ = d.init(jax.random.key(0), (scale, scale, channels))
    x = np.asarray(jax.random.uniform(jax.random.key(1),
                                      (4, scale, scale, channels), jnp.float32))
    ours, _ = d.apply(params, state, jnp.asarray(x), Ctx(None, False))

    branch_nets, branch_fc_hwc = make_branches()
    pb = params["00_branches"]
    branch_keys = sorted(pb.keys())
    assert len(branch_keys) == len(branch_nets)
    with torch.no_grad():
        for bk, (bnet, hwc) in zip(branch_keys,
                                   zip(branch_nets, branch_fc_hwc)):
            _load_sequential_params(bnet, pb[bk], fc_hwc=hwc)

    head = nn.Sequential(
        nn.Identity(),  # placeholder so torch idx == facegen idx
        nn.Linear(sum(b[-2].out_features if isinstance(b[-2], nn.Linear)
                      else b[-3].out_features for b in branch_nets), 1024),
        nn.PReLU(), nn.Dropout(0.5), nn.Linear(1024, 1),
    )
    # head fc_join input size: concat of branch outputs — recompute from
    # the facegen weight shape to avoid fragile introspection above
    join_in = params["01_fc_join"]["w"].shape[0]
    head[1] = nn.Linear(join_in, 1024)
    with torch.no_grad():
        _load_sequential_params(head, {k: v for k, v in params.items()
                                       if k != "00_branches"})
    for b in branch_nets:
        b.eval()
    head.eval()
    xt = to_t(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        outs = [b(xt) for b in branch_nets]
        theirs = head(torch.cat(outs, dim=1)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)


def test_d16_variant_matches_torch():
    """Unused variant D16 (models.lua:110-159)."""
    import torch.nn as nn

    C = 1

    def make():
        fine = nn.Sequential(
            nn.Conv2d(C, 64, 3, padding=1), nn.PReLU(),
            nn.Conv2d(64, 64, 3, padding=1), nn.PReLU(),
            nn.MaxPool2d(2), nn.Dropout2d(0.5), nn.Flatten(),
            nn.Linear(64 * 8 * 8, 1024), nn.PReLU(), nn.Dropout(0.5))
        coarse = nn.Sequential(
            nn.Conv2d(C, 32, 5, padding=2), nn.PReLU(),
            nn.Conv2d(32, 64, 5, padding=2), nn.PReLU(),
            nn.MaxPool2d(2), nn.Dropout2d(0.5), nn.Flatten(),
            nn.Linear(64 * 8 * 8, 1024), nn.PReLU(), nn.Dropout(0.5))
        dense = nn.Sequential(
            nn.Flatten(), nn.Linear(16 * 16 * C, 1024), nn.PReLU(),
            nn.Dropout(0.5), nn.Linear(1024, 1024), nn.PReLU())
        return ([fine, coarse, dense],
                [{7: (8, 8, 64)}, {7: (8, 8, 64)}, {1: (16, 16, C)}])

    _run_three_branch_variant(gan.create_d16, make, 16, C)


def test_d16_b_variant_matches_torch():
    """Unused variant D16_b (models.lua:161-216, strided convs)."""
    import torch.nn as nn

    C = 1

    def make():
        def conv_branch(k):
            p = (k - 1) // 2
            return nn.Sequential(
                nn.Conv2d(C, 64, k, padding=p), nn.PReLU(),
                nn.Conv2d(64, 64, k, padding=p), nn.PReLU(),
                nn.Conv2d(64, 128, k, padding=p), nn.PReLU(),
                nn.Conv2d(128, 128, k, stride=2, padding=p), nn.PReLU(),
                nn.Dropout2d(0.5), nn.Flatten(),
                nn.Linear(128 * 8 * 8, 512), nn.PReLU(), nn.Dropout(0.5))
        dense = nn.Sequential(
            nn.Flatten(), nn.Linear(16 * 16 * C, 1024), nn.PReLU(),
            nn.Dropout(0.5), nn.Linear(1024, 1024), nn.PReLU())
        return ([conv_branch(3), conv_branch(5), dense],
                [{10: (8, 8, 128)}, {10: (8, 8, 128)}, {1: (16, 16, C)}])

    _run_three_branch_variant(gan.create_d16_b, make, 16, C)


def test_d16_c_variant_matches_torch():
    """Unused variant D16_c (models.lua:218-277, deeper strided)."""
    import torch.nn as nn

    C = 1

    def make():
        def conv_branch(k):
            p = (k - 1) // 2
            return nn.Sequential(
                nn.Conv2d(C, 64, k, padding=p), nn.PReLU(),
                nn.Conv2d(64, 64, k, padding=p), nn.PReLU(),
                nn.Conv2d(64, 128, k, padding=p), nn.PReLU(),
                nn.Conv2d(128, 128, k, stride=2, padding=p), nn.PReLU(),
                nn.Conv2d(128, 512, k, stride=2, padding=p), nn.PReLU(),
                nn.Dropout2d(0.5), nn.Flatten(),
                nn.Linear(512 * 4 * 4, 1024), nn.PReLU())
        dense = nn.Sequential(
            nn.Flatten(), nn.Linear(16 * 16 * C, 1024), nn.PReLU(),
            nn.Dropout(0.5), nn.Linear(1024, 1024), nn.PReLU())
        return ([conv_branch(3), conv_branch(5), dense],
                [{12: (4, 4, 512)}, {12: (4, 4, 512)}, {1: (16, 16, C)}])

    _run_three_branch_variant(gan.create_d16_c, make, 16, C)


def test_g_flat_variant_matches_torch():
    """The dead first create_G (models.lua:12-21): Linear->2048 PReLU->
    Linear->sigmoid->View. Color, so the output reshape needs the
    NHWC->CHW column permutation."""
    import torch.nn as nn

    C, scale, nd = 3, 16, 64
    g = gan.create_g_flat(scale, C, nd)
    params, state, _ = g.init(jax.random.key(0), (nd,))
    z = np.asarray(jax.random.uniform(jax.random.key(1), (4, nd),
                                      jnp.float32, -1, 1))
    ours, _ = g.apply(params, state, jnp.asarray(z), Ctx(None, False))

    net = nn.Sequential(
        nn.Linear(nd, 2048), nn.PReLU(),
        nn.Linear(2048, scale * scale * C), nn.Sigmoid(),
        nn.Unflatten(1, (C, scale, scale)),
    )
    with torch.no_grad():
        net[0].weight.copy_(to_t(params["00_fc1"]["w"]).T)
        net[0].bias.copy_(to_t(params["00_fc1"]["b"]))
        net[1].weight.copy_(to_t(params["01_prelu"]["a"]))
        net[2].weight.copy_(
            to_t(cols_nhwc_to_chw(params["02_fc2"]["w"], scale, scale, C)).T)
        net[2].bias.copy_(
            to_t(vec_nhwc_to_chw(params["02_fc2"]["b"], scale, scale, C)))
    net.eval()
    with torch.no_grad():
        theirs = np.transpose(net(to_t(z)).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def _torch_conv_stack(specs):
    """nn.Sequential mirroring a facegen conv/prelu/pool/fc stack; specs
    entries: ("conv", cin, cout, k[, stride]) / ("prelu",) / ("pool",) /
    ("drop",) / ("sdrop",) / ("flat",) / ("fc", fin, fout) / ("id",)."""
    import torch.nn as nn

    layers = []
    for s in specs:
        kind = s[0]
        if kind == "conv":
            _, cin, cout, k = s[:4]
            stride = s[4] if len(s) > 4 else 1
            layers.append(nn.Conv2d(cin, cout, k, stride=stride,
                                    padding=(k - 1) // 2))
        elif kind == "prelu":
            layers.append(nn.PReLU())
        elif kind == "pool":
            layers.append(nn.MaxPool2d(2))
        elif kind == "drop":
            layers.append(nn.Dropout(0.5))
        elif kind == "sdrop":
            layers.append(nn.Dropout2d(0.5))
        elif kind == "flat":
            layers.append(nn.Flatten())
        elif kind == "fc":
            layers.append(nn.Linear(s[1], s[2]))
        else:
            raise ValueError(kind)
    return nn.Sequential(*layers)


def _unwrap_inner(p):
    """subpixel_conv(factor=1) stores its conv params under 'inner'."""
    return {k: (v["inner"] if isinstance(v, dict) and "inner" in v else v)
            for k, v in p.items()}


C2F_G_VARIANTS = {
    # name -> (factory attr, torch conv specs given (C+1) input channels)
    "g_a": ("create_g_a", lambda c: [
        ("conv", c + 1, 64, 3), ("prelu",),
        ("conv", 64, 128, 7), ("prelu",),
        ("conv", 128, c, 5)]),
    "g_b": ("create_g_b", lambda c: [
        ("conv", c + 1, 64, 3), ("prelu",),
        ("conv", 64, 64, 3), ("prelu",),
        ("conv", 64, 256, 5), ("prelu",),
        ("conv", 256, c, 7)]),
    "g_c": ("create_g_c", lambda c: [
        ("conv", c + 1, 64, 3), ("prelu",),
        ("conv", 64, 128, 3), ("prelu",),
        ("conv", 128, 256, 5), ("prelu",),
        ("conv", 256, c, 7)]),
}


@pytest.mark.parametrize("name", sorted(C2F_G_VARIANTS))
def test_c2f_g_variant_matches_torch(name):
    """Unused c2f G variants (models_c2f.lua:16-111) vs torch builds —
    channel-concat head, conv stacks exactly as the reference defines."""
    from facegen.models import c2f as c2f_models

    attr, spec_fn = C2F_G_VARIANTS[name]
    channels, fs = 1, 16
    g = getattr(c2f_models, attr)(fs, channels)
    params, state, _ = g.init(jax.random.key(0), ((fs, fs, 1),
                                                  (fs, fs, channels)))
    net = _torch_conv_stack(spec_fn(channels))
    with torch.no_grad():
        _load_sequential_params(net, _unwrap_inner(params["body"]))
    net.eval()
    z = np.asarray(jax.random.uniform(jax.random.key(1), (2, fs, fs, 1),
                                      jnp.float32, -1, 1))
    cond = np.asarray(jax.random.uniform(jax.random.key(2),
                                         (2, fs, fs, channels), jnp.float32))
    ours, _ = g.apply(params, state, (jnp.asarray(z), jnp.asarray(cond)),
                      Ctx(None, False))
    joint = np.concatenate([z, cond], axis=-1)
    with torch.no_grad():
        theirs = np.transpose(
            net(to_t(np.transpose(joint, (0, 3, 1, 2)))).numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=5e-4, atol=5e-4)


C2F_D_VARIANTS = {
    "d_a": ("create_d_a", lambda c: [
        ("conv", c, 64, 3), ("prelu",),
        ("conv", 64, 64, 3), ("prelu",),
        ("pool",), ("drop",), ("flat",),
        ("fc", 64 * 8 * 8, 512), ("prelu",), ("drop",),
        ("fc", 512, 1)], {7: (8, 8, 64)}),
    "d_b": ("create_d_b", lambda c: [
        ("conv", c, 64, 3), ("prelu",),
        ("conv", 64, 64, 3), ("prelu",),
        ("pool",),
        ("conv", 64, 128, 3), ("prelu",),
        ("conv", 128, 128, 3), ("prelu",),
        ("pool",), ("drop",), ("flat",),
        ("fc", 128 * 4 * 4, 512), ("prelu",), ("drop",),
        ("fc", 512, 1)], {12: (4, 4, 128)}),
}


@pytest.mark.parametrize("name", sorted(C2F_D_VARIANTS))
def test_c2f_d_variant_matches_torch(name):
    """Unused c2f D variants (models_c2f.lua:155-235) vs torch builds —
    CAddTable head, conv stacks exactly as the reference defines."""
    from facegen.models import c2f as c2f_models

    attr, spec_fn, fc_hwc = C2F_D_VARIANTS[name]
    channels, fs = 1, 16
    d = getattr(c2f_models, attr)(fs, channels)
    params, state, _ = d.init(jax.random.key(0), ((fs, fs, channels),
                                                  (fs, fs, channels)))
    net = _torch_conv_stack(spec_fn(channels))
    with torch.no_grad():
        _load_sequential_params(net, _unwrap_inner(params["body"]),
                                fc_hwc=fc_hwc)
    net.eval()
    diff = np.asarray(jax.random.uniform(jax.random.key(1),
                                         (2, fs, fs, channels),
                                         jnp.float32, -0.3, 0.3))
    coarse = np.asarray(jax.random.uniform(jax.random.key(2),
                                           (2, fs, fs, channels), jnp.float32))
    ours, _ = d.apply(params, state, (jnp.asarray(diff), jnp.asarray(coarse)),
                      Ctx(None, False))
    with torch.no_grad():
        theirs = net(to_t(np.transpose(diff + coarse, (0, 3, 1, 2)))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=2e-4, atol=2e-4)
