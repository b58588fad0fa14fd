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


def _model_flops_per_epoch(g, d, bundle, cfg) -> float:
    """Analytic model-FLOPs of one train epoch.

    XLA's `cost_analysis()` on the whole-epoch program counts the
    `lax.scan` BODY ONCE — not times the trip count — which under-
    reported MFU ~60x in earlier rounds. Instead: take XLA's (accurate)
    FLOP counts for the scan-free single forward programs and scale by
    the standard fwd/bwd factors — a backward pass costs ~2x forward
    (dW + dX transposed convs), so fwd+bwd ~ 3x; when only the input-
    gradient chain is needed (D inside the G step: no D weight grads)
    it is ~2x. Per step (train/step.py, adversarial.lua:240-288):

      D iter: G fwd on batch/2 fakes  +  3x D(batch)
      G iter: 3x G(batch)             +  2x D(batch)
    """
    import jax
    import jax.numpy as jnp

    from facegen.nn.core import Ctx
    from facegen.train.step import steps_per_epoch

    def fwd_flops(model, params, state, x):
        fn = jax.jit(lambda p, s, xx: model.apply(p, s, xx, Ctx(jax.random.key(0), True)))
        ca = fn.lower(params, state, x).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0))

    dtype = jnp.dtype(cfg.compute_dtype)
    half = cfg.batch_size // 2
    z_half = jnp.zeros((half, cfg.noise_dim), dtype)
    z_full = jnp.zeros((cfg.batch_size, cfg.noise_dim), dtype)
    imgs = jnp.zeros((cfg.batch_size,) + cfg.img_shape, dtype)
    fg_half = fwd_flops(g, bundle["params_g"], bundle["state_g"], z_half)
    fg_full = fwd_flops(g, bundle["params_g"], bundle["state_g"], z_full)
    fd_full = fwd_flops(d, bundle["params_d"], bundle["state_d"], imgs)
    step_flops = (
        cfg.d_iterations * (fg_half + 3.0 * fd_full)
        + cfg.g_iterations * (3.0 * fg_full + 2.0 * fd_full)
    )
    return step_flops * steps_per_epoch(cfg)


def bench_facegen_tpu(n_epoch: int = 1000, batch: int = 32, timed_epochs: int = 25,
                      multi_epoch: bool = True, profile_dir: str | None = None,
                      grayscale: bool = False):
    """(images/sec, mfu) of the jitted whole-epoch facegen train loop.

    ``multi_epoch=True`` (the default, matching the Trainer's
    --epochsPerCompile product path) compiles all timed epochs into ONE
    device program (train/step.py:make_multi_epoch_fn): a single host
    dispatch + sync for the whole measurement, which removes the
    remote-tunnel round-trip jitter BASELINE.md attributed to per-epoch
    dispatch. ``multi_epoch=False`` reproduces the round-2 per-epoch
    measurement loop.

    ``timed_epochs=25`` sizes the program like the product default
    (--epochsPerCompile auto-engages under --noplot; make demo-refgrid
    trains at 50): dispatch/sync cost is ~11 ms per program on the
    tunnel-attached chip, which at 3 epochs/program was still ~4 ms/
    epoch of non-device wall (round-3 numbers); at 25+ the per-epoch
    wall converges to the 81-82 ms module time (measured 3/10/25/50 ->
    10.7k/11.9k/12.2k/12.3k img/s, docs/KERNELS.md round 4).

    MFU = analytic model FLOPs per epoch (`_model_flops_per_epoch`) /
    measured epoch wall-clock / chip peak bf16 FLOP/s — "fast for the
    chip", not just "fast for this model". Counted on the IMPLEMENTED
    algorithm: the phase-decomposed upsample+conv (ops/upsample_conv.py)
    does ~3x fewer FLOPs in G's pyramid than the reference's naive
    nearest-upsample-then-5x5-conv (models.lua:63-69), so ~31% measured
    MFU here corresponds to >90% utilization in reference-algorithm
    FLOP terms — the hot path is at the MXU roofline, the rest is the
    bf16 elementwise/BN/optimizer glue between the big convs.
    """
    import jax
    import jax.numpy as jnp

    from facegen.config import TrainConfig
    from facegen.data.synthetic import synthetic_faces
    from facegen.data.pipeline import prepare_pool
    from facegen.models import gan
    from facegen.train.step import init_state, make_epoch_fn, make_multi_epoch_fn

    cfg = TrainConfig(
        batch_size=batch,
        scale=32,
        grayscale=grayscale,
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

    def sync(x):
        # block_until_ready is a no-op on some remote-tunnel backends
        # (axon); a scalar value fetch is the only reliable barrier.
        return float(jnp.sum(x))

    try:
        flops_per_epoch = _model_flops_per_epoch(g, d, bundle, cfg)
    except Exception:
        flops_per_epoch = 0.0
    import contextlib

    from facegen.utils import profiling

    trace_ctx = (profiling.trace(profile_dir) if profile_dir
                 else contextlib.nullcontext())
    if multi_epoch:
        multi = jax.jit(make_multi_epoch_fn(g, d, cfg, timed_epochs))
        pools = jnp.broadcast_to(pool, (timed_epochs,) + pool.shape)
        state, summaries = multi(state, jax.random.key(3), pools)  # warmup
        sync(summaries.loss_d)
        with trace_ctx:
            t0 = time.perf_counter()
            state, summaries = multi(state, jax.random.key(4), pools)
            last = sync(summaries.loss_d)
            dt = time.perf_counter() - t0
    else:
        epoch = jax.jit(make_epoch_fn(g, d, cfg))
        state, ms = epoch(state, jax.random.key(3), pool)  # warmup run
        sync(ms.loss_d)
        with trace_ctx:
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


def bench_c2f(n_epoch: int = 1000, batch: int = 32,
              timed_epochs: int = 25) -> dict:
    """BASELINE config 4: coarse-to-fine refinement GAN train epoch.

    Timed as ONE compiled ``timed_epochs``-epoch program (a lax.scan of
    the epoch fn), the round-4 methodology adopted for the headline
    number — per-epoch host dispatch on the tunnel-attached chip costs
    ~11 ms, which at sub-100-ms epochs would dominate the measurement.
    """
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
    epoch = make_epoch_fn(g, d, cfg)

    @jax.jit
    def multi(state, rng, pool):
        def body(carry, i):
            st, ms = epoch(carry, jax.random.fold_in(rng, i), pool)
            return st, ms.loss_d
        return jax.lax.scan(body, state, jnp.arange(timed_epochs))

    s, ld = multi(state, jax.random.key(3), pool)  # warmup/compile
    float(jnp.sum(ld))
    t0 = time.perf_counter()
    s, ld = multi(s, jax.random.key(4), pool)
    float(jnp.sum(ld))
    dt = (time.perf_counter() - t0) / timed_epochs
    return {"seconds_per_epoch": dt, "images_per_sec": n_epoch / dt,
            "epochs_per_program": timed_epochs}


def bench_ae_denoiser(batch: int = 32, timed_epochs: int = 25) -> dict:
    """BASELINE config 5: autoencoder + denoiser train epochs.

    Round-4 methodology: each side timed as ONE compiled
    ``timed_epochs``-epoch program (lax.scan over the jittable epoch
    fns) so per-epoch host dispatch does not dominate these sub-50-ms
    epochs — same accounting as the GAN headline and bench_c2f.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp

    from facegen.config import TrainConfig
    from facegen.data.pipeline import DataSource
    from facegen.models import ae as AE
    from facegen.nn import init as winit
    from facegen.train.ae_loop import make_ae_epoch, make_denoiser_epoch
    import optax

    n_pool = 4096
    cfg = TrainConfig(batch_size=batch, scale=32, grayscale=True, n_epoch=n_pool,
                      compute_dtype="bfloat16", synthetic_data=True,
                      noise_dim=256,  # reference AE bottleneck default
                      save="/tmp/facegen_bench_ae").validate()
    src = DataSource(scale=32, channels=1, synthetic=True)
    pool = src.epoch_pool(jax.random.key(1), n_pool)

    def timed_program(multi, *args):
        out = multi(*args)  # warmup/compile
        float(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
        t0 = time.perf_counter()
        out = multi(*args)
        float(jnp.sum(jax.tree.leaves(out)[-1].astype(jnp.float32)))
        return (time.perf_counter() - t0) / timed_epochs

    # --- plain AE (train_autoencoder.lua config: L1 loss, Adam) ----------
    model = AE.create_autoencoder(cfg.scale, cfg.channels, cfg.noise_dim)
    params, state, _ = model.init(jax.random.key(cfg.seed),
                                  (cfg.scale, cfg.scale, cfg.channels))
    params = winit.gaussian_overwrite(params, jax.random.key(cfg.seed + 1))
    ae_epoch = make_ae_epoch(model, cfg)
    opt = optax.adam(1e-3).init(params)

    @jax.jit
    def ae_multi(params, state, opt, rng, pool):
        def body(carry, i):
            p, s, o = carry
            p, s, o, losses = ae_epoch(p, s, o, jax.random.fold_in(rng, i), pool)
            return (p, s, o), jnp.mean(losses)
        (params, state, opt), ls = jax.lax.scan(
            body, (params, state, opt), jnp.arange(timed_epochs))
        return params, state, opt, ls

    ae_dt = timed_program(ae_multi, params, state, opt, jax.random.key(2), pool)
    ae_ips = n_pool / ae_dt

    # --- two-stage denoiser (train_denoiser.lua, default scale 16) -------
    cfg16 = dataclasses.replace(cfg, scale=16)
    pool16 = DataSource(scale=16, channels=1, synthetic=True).epoch_pool(
        jax.random.key(3), n_pool)
    enc, dec1, dec2, bundle = AE.init_denoiser(jax.random.key(4), cfg16.scale,
                                               cfg16.channels)
    dn_epoch = make_denoiser_epoch(enc, dec1, dec2, cfg16)
    opt1 = optax.adam(1e-3).init(bundle["AE1_DECODER"]["params"])
    opt2 = optax.adam(1e-3).init(bundle["AE2_DECODER"]["params"])

    @jax.jit
    def dn_multi(bundle, opt1, opt2, rng, pool):
        def body(carry, i):
            b, o1, o2 = carry
            b, o1, o2, losses = dn_epoch(b, o1, o2,
                                         jax.random.fold_in(rng, i), pool)
            return (b, o1, o2), jnp.mean(losses)
        (bundle, opt1, opt2), ls = jax.lax.scan(
            body, (bundle, opt1, opt2), jnp.arange(timed_epochs))
        return bundle, opt1, opt2, ls

    dn_dt = timed_program(dn_multi, bundle, opt1, opt2, jax.random.key(5),
                          pool16)
    dn_ips = n_pool / dn_dt
    return {"autoencoder_images_per_sec": ae_ips,
            "denoiser_images_per_sec": dn_ips,
            "epochs_per_program": timed_epochs}


def full_suite():
    """Measure all five BASELINE.md configs; writes BENCH_FULL.json."""
    import json as _json

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    results = {"methodology": "round-4 timing: each TRAIN config measured "
                              "as one compiled 25-epoch program (see "
                              "bench_facegen_tpu docstring / docs/KERNELS.md); "
                              "sample_pipeline is timed as 5 host-driven "
                              "pipeline runs (generate+rank+NN is a one-shot "
                              "pipeline, not an epoch loop)"}
    log("config 2: color GAN train (headline)...")
    ips, mfu = bench_facegen_tpu()
    results["gan_color_32"] = {"images_per_sec": ips, "mfu": mfu}
    log("config 1: grayscale GAN train...")
    g_ips, g_mfu = bench_facegen_tpu(grayscale=True)
    results["gan_gray_32"] = {"images_per_sec": g_ips, "mfu": g_mfu}
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
    profile_dir = None
    if "--profile" in sys.argv:
        i = sys.argv.index("--profile")
        nxt = sys.argv[i + 1] if i + 1 < len(sys.argv) else None
        # a following flag is NOT the directory value
        profile_dir = (nxt if nxt and not nxt.startswith("--")
                       else "/tmp/facegen_profile")
    log("starting Torch-CPU baseline subprocess (runs concurrently) ...")
    proc = _start_baseline_subprocess()
    log("measuring facegen on default JAX backend ...")
    import jax

    dev = jax.devices()[0]
    tpu_ips, mfu = bench_facegen_tpu(multi_epoch="--per-epoch" not in sys.argv,
                                     profile_dir=profile_dir)
    if profile_dir:
        from facegen.utils import profiling

        summary = profiling.aggregate_trace(profile_dir)
        log(profiling.format_op_table(summary))
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
