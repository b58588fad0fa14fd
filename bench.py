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
    # config parity with the facegen side: D_L2=1e-4 (adversarial.lua:
    # 103-109 adds coef*params to the gradient — exactly Adam weight
    # decay in its L2 form), same clamps below.
    opt_d = torch.optim.Adam(d_net.parameters(), lr=1e-3, weight_decay=1e-4)
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


# bf16 peak TFLOP/s per chip, by device_kind substring
_PEAK_TFLOPS = {
    "v5 lite": 197.0,   # TPU v5e
    "v5e": 197.0,
    "v5p": 459.0,
    "v4": 275.0,
    "v6": 918.0,        # Trillium
}


def _chip_peak_tflops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in _PEAK_TFLOPS.items():
        if key in kind:
            return peak
    return 0.0  # unknown chip: MFU reported as null


def bench_facegen_tpu(n_epoch: int = 1000, batch: int = 32, timed_epochs: int = 3):
    """(images/sec, mfu) of the jitted whole-epoch facegen train loop.

    MFU = XLA's own cost-analysis FLOP count for the epoch program /
    measured epoch wall-clock / chip peak bf16 FLOP/s — "fast for the
    chip", not just "fast for this model". For this workload the model
    is tiny (G 2.5M + D 2.9M params at 32x32), so the bound is
    HBM/latency, not the MXU; MFU is reported for honesty, not as the
    target.
    """
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

    compiled = epoch.lower(state, jax.random.key(3), pool).compile()
    flops_per_epoch = 0.0
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops_per_epoch = float(ca.get("flops", 0.0))
    except Exception:
        pass
    state, ms = epoch(state, jax.random.key(3), pool)  # warmup run
    sync(ms.loss_d)
    t0 = time.perf_counter()
    for e in range(timed_epochs):
        state, ms = epoch(state, jax.random.fold_in(jax.random.key(4), e), pool)
    last = sync(ms.loss_d)
    dt = time.perf_counter() - t0
    ips = n_epoch * timed_epochs / dt
    assert last == last and abs(last) < 1e9, "non-finite loss in bench"
    peak = _chip_peak_tflops(jax.devices()[0]) * 1e12
    mfu = (flops_per_epoch * timed_epochs / dt / peak) if (peak and flops_per_epoch) else None
    return ips, mfu


def bench_sampling(n: int = 1024, dataset_n: int = 4096) -> dict:
    """BASELINE config 3: the sample.lua pipeline — generate n images,
    D-score-rank them, nearest-neighbour search for the 16 best."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from facegen.data.pipeline import prepare_pool
    from facegen.data.synthetic import synthetic_faces
    from facegen.models import gan
    from facegen.utils.infer import GanInference, nearest_neighbours, prepare_nn_dataset

    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 3, 100)
    inf = GanInference(g, d, 100)
    raw = synthetic_faces(jax.random.key(1), dataset_n)
    dataset = prepare_nn_dataset(
        np.asarray(prepare_pool(raw, jax.random.key(2), 32, 3))
    )

    def once(i):
        imgs = inf.generate_n(bundle, jax.random.fold_in(jax.random.key(3), i), n)
        best, scores = inf.rank(bundle, imgs, ascending=False, max_out=64)
        idx, dist = nearest_neighbours(best[:16], dataset)
        return float(scores[0]) + float(dist.sum())

    once(0)  # compile
    t0 = time.perf_counter()
    runs = 5
    acc = 0.0
    for i in range(runs):
        acc += once(1 + i)
    dt = (time.perf_counter() - t0) / runs
    return {"seconds_per_run": dt, "images_per_sec": n / dt}


def bench_c2f(n_epoch: int = 1000, batch: int = 32) -> dict:
    """BASELINE config 4: coarse-to-fine refinement GAN train epoch."""
    import jax
    import jax.numpy as jnp

    from facegen.config import C2FConfig
    from facegen.data.c2f import make_triples
    from facegen.data.pipeline import prepare_pool
    from facegen.data.synthetic import synthetic_faces
    from facegen.models import c2f as c2f_models
    from facegen.train.c2f import init_c2f_state, make_epoch_fn

    cfg = C2FConfig(batch_size=batch, n_epoch=n_epoch,
                    compute_dtype="bfloat16").validate()
    g, d, bundle = c2f_models.init_c2f(jax.random.key(0), cfg.fine_size, cfg.channels)
    state = init_c2f_state(cfg, bundle)
    raw = synthetic_faces(jax.random.key(1), 4096)
    fine = prepare_pool(raw, jax.random.key(2), cfg.fine_size, cfg.channels)
    pool = make_triples(fine, cfg.coarse_size)
    epoch = jax.jit(make_epoch_fn(g, d, cfg))
    s, ms = epoch(state, jax.random.key(3), pool)
    float(jnp.sum(ms.loss_d))
    t0 = time.perf_counter()
    for e in range(3):
        s, ms = epoch(s, jax.random.fold_in(jax.random.key(4), e), pool)
    float(jnp.sum(ms.loss_d))
    dt = (time.perf_counter() - t0) / 3
    return {"seconds_per_epoch": dt, "images_per_sec": n_epoch / dt}


def bench_ae_denoiser(batch: int = 32) -> dict:
    """BASELINE config 5: autoencoder + denoiser train epochs."""
    import dataclasses

    from facegen.config import TrainConfig
    from facegen.data.pipeline import DataSource
    from facegen.train.ae_loop import train_autoencoder, train_denoiser

    cfg = TrainConfig(batch_size=batch, scale=32, grayscale=True, n_epoch=4096,
                      compute_dtype="bfloat16", synthetic_data=True,
                      save="/tmp/facegen_bench_ae").validate()
    src = DataSource(scale=32, channels=1, synthetic=True)
    _, _, _, hist = train_autoencoder(cfg, source=src, epochs=3, verbose=False)
    ae_ips = 4096 / min(h["seconds"] for h in hist[1:])
    cfg16 = dataclasses.replace(cfg, scale=16)
    src16 = DataSource(scale=16, channels=1, synthetic=True)
    _, _, hist2 = train_denoiser(cfg16, source=src16, epochs=3, verbose=False)
    dn_ips = 4096 / min(h["seconds"] for h in hist2[1:])
    return {"autoencoder_images_per_sec": ae_ips, "denoiser_images_per_sec": dn_ips}


def full_suite():
    """Measure all five BASELINE.md configs; writes BENCH_FULL.json."""
    import json as _json

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    results = {}
    log("config 2: color GAN train (headline)...")
    ips, mfu = bench_facegen_tpu()
    results["gan_color_32"] = {"images_per_sec": ips, "mfu": mfu}
    log("config 1: grayscale GAN train...")
    import jax

    results["gan_gray_32"] = {"images_per_sec": _bench_gray()}
    log("config 3: sampling pipeline...")
    results["sample_pipeline"] = bench_sampling()
    log("config 4: c2f train...")
    results["c2f_train"] = bench_c2f()
    log("config 5: AE/denoiser train...")
    results["ae_denoiser"] = bench_ae_denoiser()
    with open("BENCH_FULL.json", "w") as f:
        _json.dump(results, f, indent=1)
    log(_json.dumps(results, indent=1))
    return results


def _bench_gray(n_epoch: int = 1000, batch: int = 32):
    import jax
    import jax.numpy as jnp

    from facegen.config import TrainConfig
    from facegen.data.pipeline import prepare_pool
    from facegen.data.synthetic import synthetic_faces
    from facegen.models import gan
    from facegen.train.step import init_state, make_epoch_fn

    cfg = TrainConfig(batch_size=batch, scale=32, grayscale=True,
                      n_epoch=n_epoch, compute_dtype="bfloat16").validate()
    g, d, bundle = gan.init_gan(jax.random.key(0), 32, 1, 100)
    state = init_state(cfg, bundle)
    raw = synthetic_faces(jax.random.key(1), 4096)
    pool = prepare_pool(raw, jax.random.key(2), 32, 1)
    epoch = jax.jit(make_epoch_fn(g, d, cfg))
    s, ms = epoch(state, jax.random.key(3), pool)
    float(jnp.sum(ms.loss_d))
    t0 = time.perf_counter()
    for e in range(3):
        s, ms = epoch(s, jax.random.fold_in(jax.random.key(4), e), pool)
    float(jnp.sum(ms.loss_d))
    return n_epoch * 3 / (time.perf_counter() - t0)


def _start_baseline_subprocess():
    """Launch the torch baseline in a child process (importing torch
    next to the TPU tunnel client corrupts the backend) and return the
    Popen handle; it runs CONCURRENTLY with the TPU compile/measure."""
    import subprocess

    return subprocess.Popen(
        [sys.executable, __file__, "--baseline-only"],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def _join_baseline(proc) -> float:
    out, err = proc.communicate(timeout=600)
    for line in out.splitlines():
        if line.startswith("BASELINE_IPS="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(f"baseline subprocess failed: {err[-2000:]}")


def main():
    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    if "--baseline-only" in sys.argv:
        print(f"BASELINE_IPS={bench_torch_cpu_baseline()}")
        return
    if "--full" in sys.argv:
        full_suite()
        return
    log("starting Torch-CPU baseline subprocess (runs concurrently) ...")
    proc = _start_baseline_subprocess()
    log("measuring facegen on default JAX backend ...")
    import jax

    dev = jax.devices()[0]
    tpu_ips, mfu = bench_facegen_tpu()
    log(f"facegen: {tpu_ips:.1f} images/sec/chip on {dev.device_kind}"
        + (f" (MFU {100*mfu:.2f}%)" if mfu else ""))
    baseline_ips = _join_baseline(proc)
    log(f"baseline: {baseline_ips:.1f} images/sec (torch CPU, batch 32, "
        "config-matched incl. D_L2)")
    result = {
        "metric": "train_images_per_sec_per_chip_32x32",
        "value": round(tpu_ips, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(tpu_ips / baseline_ips, 2),
        "mfu": round(mfu, 5) if mfu else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
