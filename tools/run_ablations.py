"""Round-5 convergence-study ablations (VERDICT round-4 task 2).

The matched-image-budget head-to-head left one open question: does the
rebuild convert images to sample quality slower than the reference
recipe? The candidate semantic deviations (docs/PARITY.md round-5
elimination table) that are NOT already matched by inspection are:

- the NHWC noise-plane wiring (facegen/models/gan.py "Layout note") vs
  the reference's nn.View(128,8,8) unit order (models.lua:60), and
- G's BN running stats updating during the D phase (both frameworks do
  update them — adversarial.lua:252 runs createImages under
  net:training() — but the interaction with jax's fold-in RNG and
  bf16 stats could differ in effect, so we measure sensitivity).

This driver trains each ablation over --seeds seeds for --epochs epochs
under the published-images head-to-head config (in-process, one jax
import), scores every run at the final epoch (pixel Fréchet vs the
first-n store images + mean NN distance — same conventions as
parity_headtohead.json / seed_spread.json), and writes
docs/artifacts/ablation_convergence.json with the matched-seed baseline
rows pulled from the fgspread population.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import train_facegen_headtohead as h2h

VARIANTS = {
    "nchw_view": ["--noiseView", "nchw"],
    "g_eval_in_d_phase": ["--gEvalInDPhase"],
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--store", default="dataset/refgrid_aug32.npy")
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--seeds", default="2,3,4,5,6")
    p.add_argument("--baseline-glob", default="logs/fgspread_s{seed}",
                   help="where the matched-seed baseline runs live")
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--out", default="docs/artifacts/ablation_convergence.json")
    p.add_argument("--score-only", action="store_true")
    args = p.parse_args(argv)
    seeds = [int(s) for s in args.seeds.split(",")]

    # ---- train ----------------------------------------------------------
    if not args.score_only:
        for variant, flags in VARIANTS.items():
            for seed in seeds:
                save = f"logs/abl_{variant}_s{seed}"
                marker = os.path.join(save, f"adversarial_ep{args.epochs:05d}")
                if os.path.isdir(marker):
                    print(f"[abl] {variant} s{seed}: done, skipping", flush=True)
                    continue
                t0 = time.time()
                h2h.main([
                    "--store", args.store, "--save", save,
                    "--epochs", str(args.epochs), "--snap", str(args.epochs),
                    "--seed", str(seed), *flags,
                ])
                print(f"[abl] {variant} s{seed}: {time.time()-t0:.0f}s",
                      flush=True)

    # ---- score ----------------------------------------------------------
    import jax

    from facegen.eval import parity
    from facegen.utils.infer import GanInference, prepare_nn_dataset

    store = np.load(args.store, mmap_mode="r")
    train_images = np.asarray(store, np.float32) / 255.0
    real_px = train_images[: args.n].reshape(
        min(args.n, len(train_images)), -1)
    nn_ds = prepare_nn_dataset(train_images)
    key = jax.random.key(7)

    def score_ckpt(ck):
        g, d, bundle, meta, _ = parity._load_gan(ck)
        inf = GanInference(g, d, int(meta.get("noise_dim", 100)))
        samples = np.asarray(inf.generate_n(bundle, key, args.n))
        px = samples.reshape(len(samples), -1)
        nn = parity.min_nn_distances(samples, nn_ds)
        return {
            "frechet_pixels_vs_real": parity.frechet_distance(px, real_px),
            "nn_distance_mean": float(nn.mean()),
        }

    out = {
        "setup": {
            "store": args.store, "epochs": args.epochs, "n": args.n,
            "seeds": seeds,
            "config": "published-images head-to-head config; baseline = "
                      "fgspread runs at the same seeds/budget",
            "metric": "pixel Fréchet vs first-n store images (matches "
                      "parity_headtohead.json / seed_spread.json)",
        },
        "variants": {},
    }
    rows = {"baseline": [
        os.path.join(args.baseline_glob.format(seed=s),
                     f"adversarial_ep{args.epochs:05d}") for s in seeds]}
    for variant in VARIANTS:
        rows[variant] = [
            os.path.join(f"logs/abl_{variant}_s{s}",
                         f"adversarial_ep{args.epochs:05d}") for s in seeds]

    for variant, cks in rows.items():
        scores = {}
        for s, ck in zip(seeds, cks):
            if not os.path.isdir(ck):
                print(f"[abl] missing {ck}, skipped", flush=True)
                continue
            scores[f"s{s}"] = score_ckpt(ck)
            print(f"[abl] score {variant} s{s}: "
                  f"fid_px={scores[f's{s}']['frechet_pixels_vs_real']:.2f}",
                  flush=True)
        vals = [v["frechet_pixels_vs_real"] for v in scores.values()]
        out["variants"][variant] = {
            "per_seed": scores,
            "frechet_mean": float(np.mean(vals)) if vals else None,
            "frechet_std": float(np.std(vals)) if vals else None,
        }
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
