"""Score the head-to-head quality run: facegen vs the trained torch proxy.

Both sides trained on the IDENTICAL pre-augmented store
(dataset/refgrid_aug32.npy) under the reference's published-images
config; this script compares their sample populations at MATCHED image
budgets (epoch N on both sides = N x 1000 images, adversarial.lua:54)
with facegen.eval.parity.sample_report — pixel Fréchet (checkpoint-
independent), D-feature Fréchet, NN-distance distribution vs the
shared train set, D-score KS, pixel moments. The quality evidence this
mirrors is the reference's published grids (sample.lua:80-98).

Usage:
  python tools/headtohead_report.py \
      --facegen-save logs/facegen_headtohead \
      --proxy-save logs/proxy_headtohead \
      --out docs/artifacts/parity_headtohead.json \
      --grids docs/artifacts/r4_headtohead
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def proxy_epochs(proxy_save: str):
    """Snapshot epochs available on the proxy side, sorted."""
    eps = []
    for p in glob.glob(os.path.join(proxy_save, "proxy_ep*.pt")):
        m = re.search(r"proxy_ep(\d+)\.pt$", p)
        if m:
            eps.append(int(m.group(1)))
    return sorted(eps)


def proxy_samples(proxy_save: str, epoch: int, n: int, seed: int):
    """Generate the proxy's eval-mode sample population for a snapshot
    (same path as `train_torch_proxy.py --sample`)."""
    from tools import train_torch_proxy as ttp

    class A:
        pass

    a = A()
    a.sample = os.path.join(proxy_save, f"proxy_ep{epoch:05d}.pt")
    a.out = os.path.join(proxy_save, f"samples_ep{epoch:05d}.npy")
    a.n = n
    a.seed = seed
    a.threads = 1
    if not os.path.exists(a.out):
        ttp.sample(a)
    return (np.load(a.out),
            np.load(os.path.splitext(a.out)[0] + "_dscores.npy"))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--facegen-save", default="logs/facegen_headtohead")
    p.add_argument("--proxy-save", default="logs/proxy_headtohead")
    p.add_argument("--store", default="dataset/refgrid_aug32.npy")
    p.add_argument("--out", default="docs/artifacts/parity_headtohead.json")
    p.add_argument("--grids", default=None,
                   help="directory for side-by-side best-64 grids")
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--variant", action="append", default=[],
                   metavar="LABEL=SAVEDIR",
                   help="extra facegen runs (seed/dtype robustness) scored "
                        "at the final matched epoch only")
    args = p.parse_args(argv)

    import jax

    from facegen.eval import parity
    from facegen.utils.infer import GanInference

    store = np.load(args.store, mmap_mode="r")
    train_images = np.asarray(store, np.float32) / 255.0

    eps = []
    for e in proxy_epochs(args.proxy_save):
        fg = os.path.join(args.facegen_save, f"adversarial_ep{e:05d}")
        if os.path.isdir(fg):
            eps.append(e)
    if not eps:
        raise SystemExit("no matched snapshot epochs found on both sides")
    print(f"matched budgets (epochs): {eps}")

    reports = {}
    for e in eps:
        fg_ckpt = os.path.join(args.facegen_save, f"adversarial_ep{e:05d}")
        g, d, bundle, meta, resolved = parity._load_gan(fg_ckpt)
        sb, proxy_scores = proxy_samples(args.proxy_save, e, args.n,
                                         args.seed)
        rep = parity.sample_report(
            g, d, bundle, sb,
            train_images=train_images,
            n_samples=args.n,
            noise_dim=int(meta.get("noise_dim", 100)),
            key=jax.random.key(args.seed),
            label_a="facegen", label_b="torch_proxy",
        )
        rep["images_seen"] = e * 1000
        reports[e] = rep
        px = rep["frechet_pixels"]
        print(f"epoch {e}: pixel Fréchet facegen_vs_real "
              f"{px['facegen_vs_real']:.2f} vs torch_proxy_vs_real "
              f"{px['torch_proxy_vs_real']:.2f}; "
              f"NN mean {rep['nn_distance']['mean_facegen']:.3f} vs "
              f"{rep['nn_distance']['mean_torch_proxy']:.3f}", flush=True)

    final = eps[-1]

    variants = {}
    for spec in args.variant:
        label, savedir = spec.split("=", 1)
        fg_ckpt = os.path.join(savedir, f"adversarial_ep{final:05d}")
        if not os.path.isdir(fg_ckpt):
            print(f"variant {label}: no snapshot at epoch {final}, skipped")
            continue
        g, d, bundle, meta, _ = parity._load_gan(fg_ckpt)
        sb, _ = proxy_samples(args.proxy_save, final, args.n, args.seed)
        rep = parity.sample_report(
            g, d, bundle, sb,
            train_images=train_images,
            n_samples=args.n,
            noise_dim=int(meta.get("noise_dim", 100)),
            key=jax.random.key(args.seed),
            label_a="facegen", label_b="torch_proxy",
        )
        variants[label] = {
            "save": savedir,
            "frechet_pixels": rep["frechet_pixels"],
            "nn_distance_mean": {
                "facegen": rep["nn_distance"]["mean_facegen"],
                "torch_proxy": rep["nn_distance"]["mean_torch_proxy"],
            },
            "pixel_moments": rep["pixel_moments"],
        }
        px = rep["frechet_pixels"]
        print(f"variant {label} @ epoch {final}: pixel Fréchet vs real "
              f"{px['facegen_vs_real']:.2f} (proxy "
              f"{px['torch_proxy_vs_real']:.2f})", flush=True)

    out = {
        "setup": {
            "store": args.store,
            "n_store_images": int(store.shape[0]),
            "config": "reference published-images config: D_L1=0 D_L2=0 "
                      "D_iterations=2, Adam 1e-3, batch 32 "
                      "(README.md:11,128); both sides trained on the "
                      "identical pre-augmented store, matched image "
                      "budgets (1 epoch = 1000 images, adversarial.lua:54)",
            "proxy": "tools/train_torch_proxy.py (torch-CPU, config-"
                     "matched reference implementation)",
            "facegen": "tools/train_facegen_headtohead.py (this repo, "
                       "TPU, augment=False fixed store)",
            "embedding_note": "D-feature rows use the facegen "
                              "checkpoint's D for BOTH populations; "
                              "frechet_pixels and nn_distance are "
                              "checkpoint-independent",
        },
        "final_epoch": final,
        "final": reports[final],
        "variants_at_final_epoch": variants,
        "trajectory": {
            str(e): {
                "images_seen": reports[e]["images_seen"],
                "frechet_pixels": reports[e]["frechet_pixels"],
                "nn_distance_mean": {
                    "facegen": reports[e]["nn_distance"]["mean_facegen"],
                    "torch_proxy":
                        reports[e]["nn_distance"]["mean_torch_proxy"],
                },
                "pixel_moments": reports[e]["pixel_moments"],
            } for e in eps
        },
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")

    if args.grids:
        from facegen.utils.grids import save_grid

        os.makedirs(args.grids, exist_ok=True)
        fg_ckpt = os.path.join(args.facegen_save,
                               f"adversarial_ep{final:05d}")
        g, d, bundle, meta, _ = parity._load_gan(fg_ckpt)
        inf = GanInference(g, d, int(meta.get("noise_dim", 100)))
        key = jax.random.key(args.seed)
        sa = np.asarray(inf.generate_n(bundle, key, args.n))
        sc_a = np.asarray(inf.score(bundle, sa))
        sb, sc_b = proxy_samples(args.proxy_save, final, args.n, args.seed)
        # each population ranked by ITS OWN discriminator — the
        # reference's best-64 selection (sample.lua:84-89)
        best_a = sa[np.argsort(-sc_a)[:64]]
        best_b = sb[np.argsort(-sc_b)[:64]]
        save_grid(os.path.join(args.grids,
                               f"facegen_best64_ep{final:05d}.png"), best_a)
        save_grid(os.path.join(args.grids,
                               f"torch_proxy_best64_ep{final:05d}.png"),
                  best_b)
        save_grid(os.path.join(args.grids, "train_store_64.png"),
                  train_images[:64])
        print(f"wrote grids to {args.grids}")


if __name__ == "__main__":
    main()
