"""Score the matched-budget seed spread: facegen's seed DISTRIBUTION
vs the torch proxy's run(s) at each matched image budget.

Round-5 closure of the round-4 head-to-head's statistical-power gap:
the round-4 artifact compared ONE proxy run against six facegen runs
at a single 40k-image budget (proxy below all six, p~0.14 under the
null). This report scores ~20 facegen seeds and every available proxy
run at EVERY matched budget, so the comparison is between a
distribution and a sample, not two samples.

Metric: pixel Fréchet vs the shared train store (checkpoint- and
framework-independent; the quality evidence this mirrors is the
reference's published grids, /root/reference/sample.lua:80-98) plus
mean NN distance to the store. Real side = first --n store images,
matching facegen.eval.parity.sample_report's convention so numbers are
comparable with parity_headtohead.json.

Usage:
  python tools/seed_spread_report.py \
      --facegen logs/facegen_headtohead --facegen 'logs/fgspread_s*' \
      --proxy main=logs/proxy_headtohead --proxy seed2=logs/proxy_seed2 \
      --out docs/artifacts/seed_spread.json
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def facegen_epochs(save: str):
    out = []
    for p in glob.glob(os.path.join(save, "adversarial_ep*")):
        m = re.search(r"adversarial_ep(\d+)$", p)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def score_samples(samples: np.ndarray, real_px: np.ndarray, nn_ds) -> dict:
    from facegen.eval import parity

    px = samples.reshape(len(samples), -1)
    nn = parity.min_nn_distances(samples, nn_ds)
    return {
        "frechet_pixels_vs_real": parity.frechet_distance(px, real_px),
        "nn_distance_mean": float(nn.mean()),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--facegen", action="append", default=[],
                   help="facegen save dir or glob (repeatable)")
    p.add_argument("--proxy", action="append", default=[],
                   metavar="LABEL=SAVEDIR",
                   help="proxy save dir (repeatable)")
    p.add_argument("--store", default="dataset/refgrid_aug32.npy")
    p.add_argument("--out", default="docs/artifacts/seed_spread.json")
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--budgets", default=None,
                   help="comma-separated epochs; default = every epoch "
                        "where >= 2 facegen runs and >= 1 proxy run "
                        "have snapshots")
    p.add_argument("--merge", action="store_true",
                   help="keep budgets already present in --out (scored at "
                        "the same n) instead of rescoring them; only new "
                        "budgets, or existing budgets that gained a proxy "
                        "snapshot, are (re)computed")
    args = p.parse_args(argv)

    import jax

    from facegen.eval import parity
    from facegen.utils.infer import GanInference, prepare_nn_dataset
    from tools.headtohead_report import proxy_epochs, proxy_samples

    # Under --merge, load the previous artifact FIRST: already-scored rows
    # must survive even when the checkpoints behind them no longer exist
    # on disk (this box's logs/ lives outside git and has been reset).
    prev_budgets = {}
    if args.merge and os.path.exists(args.out):
        with open(args.out) as f:
            prev = json.load(f)
        # reuse rows only if BOTH the sample count and the sampling seed
        # match — otherwise old rows were scored on a different sample
        # population and mixing them would be silent (a seed of None in
        # an old artifact predates seed recording: treat as seed 7, the
        # default every committed artifact was produced with)
        prev_setup = prev.get("setup", {})
        if (prev_setup.get("n") == args.n
                and prev_setup.get("seed", 7) == args.seed):
            prev_budgets = prev.get("budgets", {})

    fg_dirs = []
    for spec in args.facegen:
        hits = sorted(glob.glob(spec)) or [spec]
        fg_dirs += [h for h in hits if os.path.isdir(h)]
    # previously-scored runs whose checkpoints are gone still count
    for row in prev_budgets.values():
        fg_dirs += list(row.get("facegen", {}))
    fg_dirs = list(dict.fromkeys(fg_dirs))
    if not fg_dirs:
        raise SystemExit("no facegen save dirs found")
    proxies = [s.split("=", 1) for s in args.proxy]
    for row in prev_budgets.values():
        for lab in row.get("proxy", {}):
            if lab not in {l for l, _ in proxies}:
                proxies.append([lab, "<merged-from-artifact>"])

    store = np.load(args.store, mmap_mode="r")
    train_images = np.asarray(store, np.float32) / 255.0
    real_px = train_images[: args.n].reshape(
        min(args.n, len(train_images)), -1)
    nn_ds = prepare_nn_dataset(train_images)

    fg_eps = {d: set(facegen_epochs(d)) for d in fg_dirs}
    px_eps = {lab: set(proxy_epochs(sv)) if os.path.isdir(sv) else set()
              for lab, sv in proxies}
    # epochs covered by the previous artifact count as "has a snapshot"
    for es, row in prev_budgets.items():
        for d in row.get("facegen", {}):
            fg_eps[d].add(int(es))
        for lab in row.get("proxy", {}):
            px_eps[lab].add(int(es))
    if args.budgets:
        budgets = [int(b) for b in args.budgets.split(",")]
    else:
        all_eps = sorted(set().union(*fg_eps.values()))
        budgets = [
            e for e in all_eps
            if sum(e in s for s in fg_eps.values()) >= 2
            and any(e in s for s in px_eps.values())
        ]
    if not budgets:
        raise SystemExit("no common budgets")
    print(f"facegen runs: {len(fg_dirs)}; proxies: {[l for l, _ in proxies]}; "
          f"budgets: {budgets}", flush=True)

    out = {
        "setup": {
            "store": args.store,
            "n": args.n,
            "seed": args.seed,
            "metric": "pixel Fréchet vs first-n store images + mean NN "
                      "distance; matches parity_headtohead.json conventions",
            "facegen_runs": fg_dirs,
            "proxy_runs": {lab: sv for lab, sv in proxies},
            "config": "reference published-images config (README.md:11,128)",
        },
        "partial": True,
        "budgets": {},
    }
    out["budgets"] = dict(prev_budgets)

    def flush():
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, args.out)

    key = jax.random.key(args.seed)
    for e in budgets:
        have = out["budgets"].get(str(e), {}) if args.merge else {}
        row = {"images_seen": e * 1000, "facegen": {}, "proxy": {}}
        for d in fg_dirs:
            if d in have.get("facegen", {}):
                row["facegen"][d] = have["facegen"][d]
                continue
            if e not in fg_eps[d]:
                continue
            ck = os.path.join(d, f"adversarial_ep{e:05d}")
            if not os.path.isdir(ck):
                print(f"  ep{e} {d}: checkpoint gone and no merged row — "
                      f"skipped", flush=True)
                continue
            g, dd, bundle, meta, _ = parity._load_gan(ck)
            inf = GanInference(g, dd, int(meta.get("noise_dim", 100)))
            samples = np.asarray(inf.generate_n(bundle, key, args.n))
            row["facegen"][d] = score_samples(samples, real_px, nn_ds)
            print(f"  ep{e} {d}: fid_px="
                  f"{row['facegen'][d]['frechet_pixels_vs_real']:.2f}",
                  flush=True)
        for lab, sv in proxies:
            if lab in have.get("proxy", {}):
                row["proxy"][lab] = have["proxy"][lab]
                continue
            if e not in px_eps[lab] or not os.path.isdir(sv):
                continue
            sb, _ = proxy_samples(sv, e, args.n, args.seed)
            row["proxy"][lab] = score_samples(
                np.asarray(sb, np.float32), real_px, nn_ds)
            print(f"  ep{e} proxy:{lab}: fid_px="
                  f"{row['proxy'][lab]['frechet_pixels_vs_real']:.2f}",
                  flush=True)

        fg_vals = sorted(v["frechet_pixels_vs_real"]
                         for v in row["facegen"].values())
        if fg_vals:
            k = len(fg_vals)
            summary = {
                "n_runs": k,
                "mean": float(np.mean(fg_vals)),
                "std": float(np.std(fg_vals)),
                "min": float(fg_vals[0]),
                "median": float(np.median(fg_vals)),
                "max": float(fg_vals[-1]),
            }
            for lab in row["proxy"]:
                pv = row["proxy"][lab]["frechet_pixels_vs_real"]
                below = sum(v < pv for v in fg_vals)
                # probability that a fresh facegen seed beats this proxy
                # run (empirical), and the rank the proxy would take
                summary[f"p_facegen_beats_{lab}"] = below / k
                summary[f"{lab}_rank_among_facegen"] = (
                    f"{below + 1}/{k + 1}")
            row["facegen_frechet_summary"] = summary
        out["budgets"][str(e)] = row
        flush()

    out["partial"] = False
    flush()
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
