"""Train the facegen side of the head-to-head quality run.

Counterpart of tools/train_torch_proxy.py: the SAME pre-augmented
store (dataset/refgrid_aug32.npy, built by tools/make_proxy_store.py),
the SAME reference published-images config (`--D_L1 0 --D_L2 0
--D_iterations 2`, Adam, batch 32 — /root/reference/README.md:11,128),
trained through facegen's own TPU pipeline with augmentation OFF
(the store is already the reference's offline 1-original+19-augmented
regime, generate_dataset.py:29-30).

A snapshot of the checkpoint is retained every --snap epochs so the
comparison can be made at MATCHED image budgets against whatever epoch
the one-core torch proxy reaches (its checkpoints land every 25
epochs too; 1 epoch = 1000 images on both sides, adversarial.lua:54).

Usage:
  python tools/train_facegen_headtohead.py --store dataset/refgrid_aug32.npy \
      --save logs/facegen_headtohead --epochs 400 --snap 25
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--store", default="dataset/refgrid_aug32.npy")
    p.add_argument("--save", default="logs/facegen_headtohead")
    p.add_argument("--epochs", type=int, default=400)
    p.add_argument("--snap", type=int, default=25)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--dtype", default="bfloat16",
                   help="compute_dtype (diagnostic: fp32 vs bf16 training)")
    # round-5 additions: drive other routes (16px grayscale sweep) through
    # the same stage/snapshot structure
    p.add_argument("--scale", type=int, default=32)
    p.add_argument("--grayscale", action="store_true")
    p.add_argument("--dIterations", type=int, default=2)
    p.add_argument("--dL2", type=float, default=0.0)
    p.add_argument("--augment", action="store_true",
                   help="augment per-epoch on device (for 64px stores); "
                        "default off — the h2h store is pre-augmented")
    # round-5 convergence-study ablations (docs/PARITY.md round-5 table)
    p.add_argument("--noiseView", default="nhwc", choices=["nhwc", "nchw"],
                   help="G fc->plane wiring: native nhwc reshape vs the "
                        "reference's nn.View(128,s0,s0) unit order")
    p.add_argument("--gEvalInDPhase", action="store_true",
                   help="freeze G's BN running stats while generating "
                        "D-phase fakes (default: train mode, like "
                        "adversarial.lua:252)")
    p.add_argument("--resume-from", type=int, default=0,
                   help="continue from <save>/adversarial_ep<N> (epoch "
                        "counter, optimizer state and RNG schedule resume; "
                        "train/loop.py Trainer.resume)")
    args = p.parse_args(argv)

    from facegen.config import TrainConfig
    from facegen.data.pipeline import DataSource
    from facegen.train.loop import Trainer

    cfg = TrainConfig(
        batch_size=32,
        save=args.save,
        save_freq=args.snap,
        noplot=True,
        n_epoch=1000,          # adversarial.lua:54 default
        d_l1=0.0, d_l2=args.dL2,  # published-images config (README.md:128)
        d_iterations=args.dIterations,
        scale=args.scale,
        grayscale=args.grayscale,
        seed=args.seed,
        epochs=args.epochs,
        epochs_per_compile=args.snap,
        compute_dtype=args.dtype,
        noise_view=args.noiseView,
        g_train_in_d_phase=not args.gEvalInDPhase,
        network=(os.path.join(args.save,
                              f"adversarial_ep{args.resume_from:05d}")
                 if args.resume_from else ""),
    )
    store = np.load(args.store, mmap_mode="r")
    if not args.augment:
        assert store.shape[1:] == (cfg.scale, cfg.scale, 3), store.shape
    source = DataSource(cfg.scale, cfg.channels, store=store,
                        augment=args.augment)
    trainer = Trainer(cfg, source=source)

    os.makedirs(args.save, exist_ok=True)
    log_path = os.path.join(args.save, "train_log.jsonl")
    t0 = time.time()
    # carry wall-clock across resumes (the torch proxy trainer does the
    # same), else a resumed run's `elapsed` restarts at 0 and corrupts
    # the equal-wallclock comparison in tools/headtohead_report.py
    elapsed0 = 0.0
    if args.resume_from and os.path.exists(log_path):
        with open(log_path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if (row.get("epoch", 0) <= args.resume_from
                        and "elapsed" in row):
                    elapsed0 = max(elapsed0, float(row["elapsed"]))
    done = args.resume_from
    with open(log_path, "a") as log:
        while done < args.epochs:
            n = min(args.snap, args.epochs - done)
            t_seg = time.time()
            for stats in trainer.run(epochs=n):
                row = {k: (float(v) if hasattr(v, "item") or
                           isinstance(v, float) else v)
                       for k, v in stats.items()
                       if isinstance(v, (int, float)) or hasattr(v, "item")}
                row["elapsed"] = round(elapsed0 + time.time() - t0, 1)
                log.write(json.dumps(row) + "\n")
            log.flush()
            done += n
            trainer.save()
            src = os.path.join(args.save, "adversarial")
            dst = os.path.join(args.save, f"adversarial_ep{done:05d}")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            shutil.copytree(src, dst)
            dt = time.time() - t_seg
            print(f"[headtohead] epoch {done}/{args.epochs} "
                  f"({n * cfg.n_epoch / dt:.0f} img/s) -> {dst}", flush=True)


if __name__ == "__main__":
    main()
