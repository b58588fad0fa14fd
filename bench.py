"""Benchmark: GAN train-step throughput, facegen-on-TPU vs Torch-CPU.

Prints ONE JSON line to stdout:
  {"metric": "train_images_per_sec_per_chip_32x32", "value": N,
   "unit": "images/sec/chip", "vs_baseline": R}

Benchmarked config = the reference's headline run (`th train.lua`,
README.md:128: color 32x32, batch 32, Adam, D_L2=1e-4, one D and one G
iteration per step). Throughput follows the reference's own accounting
(adversarial.lua:305 "time to learn 1 sample" = epoch_time / N_epoch):
images/sec = N_epoch / epoch_wallclock.

Baseline denominator: the reference is Lua/Torch7 (not installable
here); we measure an equivalent PyTorch-CPU implementation of the exact
same models + step (G32/D32b, fp32, Adam, batch 32) as the Torch-CPU
proxy — if anything a GENEROUS stand-in, PyTorch's CPU kernels being
newer than TH's. See BASELINE.md.
"""

from __future__ import annotations

import json
import sys
import time


def bench_torch_cpu_baseline(iters: int = 8, batch: int = 32) -> float:
    """Images/sec of the reference train step on CPU torch (proxy).

    One loop iteration = 1 D step (half real, half G-generated) + 1 G
    step, advancing batch/2 epoch samples (adversarial.lua:54).
    """
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    torch.set_num_threads(8)

    c = 3

    g_net = nn.Sequential(
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
        nn.Conv2d(128, c, 3, padding=1),
        nn.Sigmoid(),
    )
    d_layers = []
    in_c = c
    for out_c in (64, 128, 256, 512):
        d_layers += [
            nn.Conv2d(in_c, out_c, 3, padding=1),
            nn.PReLU(),
            nn.Dropout2d(0.2),
            nn.AvgPool2d(2),
        ]
        in_c = out_c
    d_layers += [
        nn.Flatten(),
        nn.Linear(512 * 2 * 2, 512), nn.PReLU(), nn.Dropout(),
        nn.Linear(512, 512), nn.PReLU(), nn.Dropout(),
        nn.Linear(512, 1), nn.Sigmoid(),
    ]
    d_net = nn.Sequential(*d_layers)
    opt_d = torch.optim.Adam(d_net.parameters(), lr=1e-3)
    opt_g = torch.optim.Adam(g_net.parameters(), lr=1e-3)
    bce = nn.BCELoss()

    half = batch // 2
    real = torch.rand(half, c, 32, 32)

    def one_iter():
        # D step
        with torch.no_grad():
            fake = g_net(torch.rand(half, 100) * 2 - 1)
        inputs = torch.cat([real, fake])
        targets = torch.cat([torch.ones(half, 1), torch.zeros(half, 1)])
        opt_d.zero_grad()
        loss_d = bce(d_net(inputs), targets)
        loss_d.backward()
        for p in d_net.parameters():
            if p.grad is not None:
                p.grad.clamp_(-1.0, 1.0)
        opt_d.step()
        # G step
        opt_g.zero_grad()
        out = d_net(g_net(torch.rand(batch, 100) * 2 - 1))
        loss_g = bce(out, torch.ones(batch, 1))
        loss_g.backward()
        for p in g_net.parameters():
            if p.grad is not None:
                p.grad.clamp_(-5.0, 5.0)
        opt_g.step()

    one_iter()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    dt = time.perf_counter() - t0
    ips = (half * iters) / dt  # epoch advances batch/2 per iteration
    return ips


def bench_facegen_tpu(n_epoch: int = 1000, batch: int = 32, timed_epochs: int = 3):
    """Images/sec of the jitted whole-epoch facegen train loop."""
    import jax
    import jax.numpy as jnp

    from facegen.config import TrainConfig
    from facegen.data.synthetic import synthetic_faces
    from facegen.data.pipeline import prepare_pool
    from facegen.models import gan
    from facegen.train.step import init_state, make_epoch_fn

    cfg = TrainConfig(
        batch_size=batch,
        scale=32,
        grayscale=False,
        n_epoch=n_epoch,
        compute_dtype="bfloat16",
        d_l2=1e-4,
    ).validate()

    g, d, bundle = gan.init_gan(
        jax.random.key(cfg.seed), cfg.scale, cfg.channels, cfg.noise_dim
    )
    state = init_state(cfg, bundle)
    raw = synthetic_faces(jax.random.key(1), 4096)
    pool = prepare_pool(raw, jax.random.key(2), cfg.scale, cfg.channels)
    epoch = jax.jit(make_epoch_fn(g, d, cfg))

    def sync(x):
        # block_until_ready is a no-op on some remote-tunnel backends
        # (axon); a scalar value fetch is the only reliable barrier.
        return float(jnp.sum(x))

    state, ms = epoch(state, jax.random.key(3), pool)  # compile + warmup
    sync(ms.loss_d)
    t0 = time.perf_counter()
    for e in range(timed_epochs):
        state, ms = epoch(state, jax.random.fold_in(jax.random.key(4), e), pool)
    last = sync(ms.loss_d)
    dt = time.perf_counter() - t0
    ips = n_epoch * timed_epochs / dt
    assert last == last and abs(last) < 1e9, "non-finite loss in bench"
    return ips


def _baseline_in_subprocess() -> float:
    """Run the torch baseline in a child process: importing torch next
    to the TPU tunnel client corrupts the backend (FailedPrecondition
    on later fetches), so keep them in separate processes."""
    import subprocess

    out = subprocess.run(
        [sys.executable, __file__, "--baseline-only"],
        capture_output=True,
        text=True,
        timeout=600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("BASELINE_IPS="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"baseline subprocess failed: {out.stderr[-2000:]}")


def main():
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    if "--baseline-only" in sys.argv:
        print(f"BASELINE_IPS={bench_torch_cpu_baseline()}")
        return
    log("measuring Torch-CPU baseline (reference proxy) ...")
    baseline_ips = _baseline_in_subprocess()
    log(f"baseline: {baseline_ips:.1f} images/sec (torch CPU, batch 32)")
    log("measuring facegen on default JAX backend ...")
    import jax

    dev = jax.devices()[0]
    tpu_ips = bench_facegen_tpu()
    log(f"facegen: {tpu_ips:.1f} images/sec/chip on {dev.device_kind}")
    result = {
        "metric": "train_images_per_sec_per_chip_32x32",
        "value": round(tpu_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(tpu_ips / baseline_ips, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
