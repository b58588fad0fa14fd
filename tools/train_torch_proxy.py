"""Train the Torch-CPU reference proxy for the head-to-head quality run.

This is the same config-matched PyTorch implementation of the
reference's models + train loop that bench.py uses as the throughput
denominator, here actually TRAINED on the shared refgrid store so both
frameworks' sample populations can be scored by facegen.eval.parity on
identical data at identical image budgets (VERDICT round-3 task 1).

Faithful to the reference's published-images configuration
(README.md:11,128): `th train.lua --D_L1=0 --D_L2=0 --D_iterations=2`,
everything else default —
  * models G32 / D32b                      (models.lua:57-81, 382-416)
  * init: gaussian overwrite of every top-level module's weight with
    N(0, 0.005^2) and bias with N(0, 0.001^2) (train.lua:137-138 ->
    nn_utils.lua:8-29; hits PReLU slopes and BN gammas too)
  * Adam lr 1e-3 both nets                 (interruptable_optimizers.lua:53)
  * epoch = N_epoch(1000) random draws from the pre-augmented store,
    loop advances batchSize/2=16/step        (adversarial.lua:54-76)
  * D batch per iteration = fresh half real (random WITH replacement
    from the epoch pool) + half fresh G fakes (adversarial.lua:240-268)
  * G iteration: fresh U(-1,1) noise, all-"real" targets
    (adversarial.lua:275-288, nn_utils.lua:35-39)
  * grad clamps D +-1 / G +-5              (adversarial.lua:121-123,226-228)
  * rolling-accuracy D gate, window max(20, min(1000/batch, 250)),
    threshold D_maxAcc=1.01 (default: never fires) (adversarial.lua:154-178)
  * tail batch: thisBatchSize = min(batch, N_epoch - t + 1), skip < 4

Usage:
  python tools/train_torch_proxy.py --store dataset/refgrid_aug32.npy \
      --save logs/proxy_headtohead --epochs 400
  python tools/train_torch_proxy.py --sample logs/proxy_headtohead/proxy_latest.pt \
      --out logs/proxy_headtohead/samples_1024.npy
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time

import numpy as np


def build_models(c: int = 3):
    import torch.nn as nn

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
    return g_net, nn.Sequential(*d_layers)


def reference_init(net, gen):
    """train.lua:137-138 -> nn_utils.lua:8-29: gaussian overwrite of
    every module's .weight (N(0,0.005^2)) and .bias (N(0,0.001^2))."""
    import torch

    for m in net.modules():
        w = getattr(m, "weight", None)
        if w is not None and w.requires_grad:
            with torch.no_grad():
                w.normal_(0.0, 0.005, generator=gen)
        b = getattr(m, "bias", None)
        if b is not None and b.requires_grad:
            with torch.no_grad():
                b.normal_(0.0, 0.001, generator=gen)


def train(args):
    import torch
    import torch.nn as nn

    torch.set_num_threads(args.threads)
    torch.manual_seed(args.seed)
    gen = torch.Generator().manual_seed(args.seed)
    rng = np.random.default_rng(args.seed)

    store = np.load(args.store)  # (M, 32, 32, 3) uint8
    assert store.dtype == np.uint8 and store.shape[1:] == (32, 32, 3), store.shape

    g_net, d_net = build_models(3)
    reference_init(g_net, gen)
    reference_init(d_net, gen)
    opt_d = torch.optim.Adam(d_net.parameters(), lr=1e-3,
                             betas=(0.9, 0.999), eps=1e-8)
    opt_g = torch.optim.Adam(g_net.parameters(), lr=1e-3,
                             betas=(0.9, 0.999), eps=1e-8)
    bce = nn.BCELoss()
    start_epoch, elapsed0 = 1, 0.0

    os.makedirs(args.save, exist_ok=True)
    latest = os.path.join(args.save, "proxy_latest.pt")
    if args.resume and os.path.exists(latest):
        ck = torch.load(latest, weights_only=False)
        g_net.load_state_dict(ck["G"])
        d_net.load_state_dict(ck["D"])
        opt_g.load_state_dict(ck["optG"])
        opt_d.load_state_dict(ck["optD"])
        start_epoch = ck["epoch"] + 1
        elapsed0 = ck.get("elapsed", 0.0)
        rng = np.random.default_rng([args.seed, ck["epoch"]])
        print(f"resumed at epoch {start_epoch}", flush=True)

    batch, half, n_epoch = args.batchSize, args.batchSize // 2, args.n_epoch
    d_iterations = args.D_iterations
    acc_window = max(20, int(min(1000 / batch, 250)))  # train.lua:207
    accs: list[float] = []
    log_path = os.path.join(args.save, "train_log.jsonl")

    def save(epoch, elapsed):
        ck = {
            "G": g_net.state_dict(), "D": d_net.state_dict(),
            "optG": opt_g.state_dict(), "optD": opt_d.state_dict(),
            "epoch": epoch, "elapsed": elapsed,
            "config": vars(args),
        }
        tmp = latest + ".tmp"
        torch.save(ck, tmp)
        os.replace(tmp, latest)
        if epoch % args.snapshotFreq == 0:
            torch.save(ck, os.path.join(args.save, f"proxy_ep{epoch:05d}.pt"))

    t_run0 = time.perf_counter()
    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.perf_counter()
        # TRAIN_DATA = N_epoch random images from the store (train.lua:201)
        pool_idx = rng.integers(0, store.shape[0], n_epoch)
        pool = torch.from_numpy(
            store[pool_idx].astype(np.float32) / 255.0
        ).permute(0, 3, 1, 2).contiguous()
        loss_d_sum = loss_g_sum = 0.0
        n_d = n_g = 0
        d_trained = d_skipped = 0
        for t in range(1, n_epoch + 1, half):
            this = min(batch, n_epoch - t + 1)
            if this < 4:
                break
            h = this // 2
            for _ in range(d_iterations):
                real = pool[torch.from_numpy(rng.integers(0, n_epoch, h))]
                with torch.no_grad():
                    fake = g_net(torch.rand(h, 100, generator=gen) * 2 - 1)
                inputs = torch.cat([real, fake])
                targets = torch.cat([torch.ones(h, 1), torch.zeros(h, 1)])
                opt_d.zero_grad(set_to_none=True)
                out = d_net(inputs)
                loss_d = bce(out, targets)
                loss_d.backward()
                acc = ((out > 0.5) == (targets > 0.5)).float().mean().item()
                accs.append(acc)
                if len(accs) > acc_window:
                    accs.pop(0)
                if sum(accs) / len(accs) >= args.D_maxAcc:
                    d_skipped += 1  # gate: skip update, batch consumed
                else:
                    for p in d_net.parameters():
                        if p.grad is not None:
                            p.grad.clamp_(-args.D_clamp, args.D_clamp)
                    opt_d.step()
                    d_trained += 1
                loss_d_sum += loss_d.item() * this
                n_d += this
            for _ in range(args.G_iterations):
                opt_g.zero_grad(set_to_none=True)
                noise = torch.rand(this, 100, generator=gen) * 2 - 1
                out = d_net(g_net(noise))
                loss_g = bce(out, torch.ones(this, 1))
                loss_g.backward()
                for p in g_net.parameters():
                    if p.grad is not None:
                        p.grad.clamp_(-args.G_clamp, args.G_clamp)
                opt_g.step()
                loss_g_sum += loss_g.item() * this
                n_g += this
        dt = time.perf_counter() - t0
        elapsed = elapsed0 + time.perf_counter() - t_run0
        rec = {
            "epoch": epoch, "seconds": round(dt, 2),
            "images_per_sec": round(n_epoch / dt, 2),
            "loss_d": round(loss_d_sum / max(n_d, 1), 4),
            "loss_g": round(loss_g_sum / max(n_g, 1), 4),
            "d_trained": d_trained, "d_skipped": d_skipped,
            "elapsed": round(elapsed, 1),
        }
        print(json.dumps(rec), flush=True)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if epoch % args.saveFreq == 0 or epoch == args.epochs:
            save(epoch, elapsed)
    save(args.epochs, elapsed0 + time.perf_counter() - t_run0)


def sample(args):
    import torch

    torch.set_num_threads(args.threads)
    ck = torch.load(args.sample, weights_only=False)
    g_net, d_net = build_models(3)
    g_net.load_state_dict(ck["G"])
    d_net.load_state_dict(ck["D"])
    g_net.eval()  # reference samples in eval mode (nn_utils.lua:131-139)
    d_net.eval()
    gen = torch.Generator().manual_seed(args.seed)
    outs, scores = [], []
    with torch.no_grad():
        for i in range(0, args.n, 128):
            m = min(128, args.n - i)
            imgs = g_net(torch.rand(m, 100, generator=gen) * 2 - 1)
            scores.append(d_net(imgs).squeeze(1))
            outs.append(imgs.permute(0, 2, 3, 1))
    imgs = torch.cat(outs).numpy().astype(np.float32)  # (n, 32, 32, 3)
    scores = torch.cat(scores).numpy().astype(np.float32)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    np.save(args.out, imgs)
    np.save(os.path.splitext(args.out)[0] + "_dscores.npy", scores)
    print(f"wrote {args.out}: {imgs.shape} (epoch {ck['epoch']})")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--store", default="dataset/refgrid_aug32.npy")
    p.add_argument("--save", default="logs/proxy_headtohead")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--n_epoch", type=int, default=1000)
    p.add_argument("--batchSize", type=int, default=32)
    p.add_argument("--D_iterations", type=int, default=2)
    p.add_argument("--G_iterations", type=int, default=1)
    p.add_argument("--D_maxAcc", type=float, default=1.01)
    p.add_argument("--D_clamp", type=float, default=1.0)
    p.add_argument("--G_clamp", type=float, default=5.0)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--threads", type=int, default=1)
    p.add_argument("--saveFreq", type=int, default=5)
    p.add_argument("--snapshotFreq", type=int, default=25)
    p.add_argument("--resume", action="store_true", default=True)
    p.add_argument("--sample", default=None,
                   help="checkpoint path: generate instead of training")
    p.add_argument("--out", default="logs/proxy_headtohead/samples_1024.npy")
    p.add_argument("--n", type=int, default=1024)
    args = p.parse_args(argv)
    if args.sample:
        sample(args)
    else:
        train(args)


if __name__ == "__main__":
    main()
