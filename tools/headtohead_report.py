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
    # cache key includes the sampling seed: re-running the report with a
    # different --seed must not silently reuse samples drawn under the
    # previous seed (advisor round-4 finding)
    a.out = os.path.join(proxy_save, f"samples_ep{epoch:05d}_n{n}_s{seed}.npy")
    a.n = n
    a.seed = seed
    a.threads = 1
    if not os.path.exists(a.out):
        ttp.sample(a)
    return (np.load(a.out),
            np.load(os.path.splitext(a.out)[0] + "_dscores.npy"))


def proxy_d_features(proxy_save: str, epoch: int, image_sets):
    """512-dim penultimate-layer embeddings from the PROXY's trained D
    (everything before the final Linear(512,1)+Sigmoid, eval mode).

    The main report's D-feature rows embed both populations with the
    facegen checkpoint's D; this is the symmetric row — the same three
    Fréchets measured with the OTHER side's ruler, so neither framework
    is judged only in its own feature space.

    image_sets: list of (n, 32, 32, 3) float arrays in [0, 1].
    Returns a list of (n, 512) float32 arrays.
    """
    import torch

    from tools import train_torch_proxy as ttp

    torch.set_num_threads(1)
    ck = torch.load(os.path.join(proxy_save, f"proxy_ep{epoch:05d}.pt"),
                    weights_only=False)
    _, d_net = ttp.build_models(3)
    d_net.load_state_dict(ck["D"])
    d_net.eval()
    feat = d_net[:-2]
    outs = []
    with torch.no_grad():
        for imgs in image_sets:
            fs = []
            for i in range(0, len(imgs), 256):
                x = torch.from_numpy(
                    np.ascontiguousarray(imgs[i:i + 256], np.float32)
                ).permute(0, 3, 1, 2)
                fs.append(feat(x))
            outs.append(torch.cat(fs).numpy().astype(np.float32))
    return outs


def log_elapsed(save_dir: str, epoch: int):
    """Wall-clock seconds at the end of `epoch` from train_log.jsonl
    (both trainers write an `elapsed` field per epoch row)."""
    path = os.path.join(save_dir, "train_log.jsonl")
    if not os.path.exists(path):
        return None
    best = None
    with open(path) as f:
        for line in f:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                continue
            if int(row.get("epoch", -1)) == epoch and "elapsed" in row:
                best = float(row["elapsed"])
    return best


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--facegen-save", default="logs/facegen_headtohead")
    p.add_argument("--proxy-save", default="logs/proxy_headtohead")
    p.add_argument("--store", default="dataset/refgrid_aug32.npy")
    p.add_argument("--out", default="docs/artifacts/parity_headtohead.json")
    p.add_argument("--grids", default=None,
                   help="directory for side-by-side best-64 grids")
    p.add_argument("--n", type=int, default=1024)
    p.add_argument("--n-final", type=int, default=2048,
                   help="larger sample count for the FINAL matched epoch "
                        "(stabilizes the 3072-dim pixel Fréchet estimate)")
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

    # Built incrementally and flushed after every stage so a long run cut
    # off mid-way (the proxy side is hours of CPU) still leaves a valid,
    # honestly-marked artifact on disk ("partial": true until the end).
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
        "partial": True,
        "final_epoch": eps[-1],
        "final": None,
        "noise_floor": None,
        "equal_wallclock": None,
        "variants_at_final_epoch": {},
        "trajectory": {},
    }

    def flush_out():
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(out, f, indent=1)
        os.replace(tmp, args.out)

    reports = {}
    for e in eps:
        n_e = args.n_final if e == eps[-1] else args.n
        fg_ckpt = os.path.join(args.facegen_save, f"adversarial_ep{e:05d}")
        g, d, bundle, meta, resolved = parity._load_gan(fg_ckpt)
        sb, proxy_scores = proxy_samples(args.proxy_save, e, n_e,
                                         args.seed)
        rep = parity.sample_report(
            g, d, bundle, sb,
            train_images=train_images,
            n_samples=n_e,
            noise_dim=int(meta.get("noise_dim", 100)),
            key=jax.random.key(args.seed),
            label_a="facegen", label_b="torch_proxy",
        )
        rep["images_seen"] = e * 1000
        rep["n_samples_scored"] = n_e
        reports[e] = rep
        out["trajectory"][str(e)] = {
            "images_seen": rep["images_seen"],
            # sample count varies along the trajectory (--n vs --n-final);
            # pixel-Fréchet estimates are n-dependent, so record which n
            # produced each point (advisor round-4 finding)
            "n": n_e,
            "frechet_pixels": rep["frechet_pixels"],
            "nn_distance_mean": {
                "facegen": rep["nn_distance"]["mean_facegen"],
                "torch_proxy": rep["nn_distance"]["mean_torch_proxy"],
            },
            "pixel_moments": rep["pixel_moments"],
        }
        if e == eps[-1]:
            out["final"] = rep
        flush_out()
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
        sb, _ = proxy_samples(args.proxy_save, final, args.n_final,
                              args.seed)
        rep = parity.sample_report(
            g, d, bundle, sb,
            train_images=train_images,
            n_samples=args.n_final,
            noise_dim=int(meta.get("noise_dim", 100)),
            key=jax.random.key(args.seed),
            label_a="facegen", label_b="torch_proxy",
        )
        variants[label] = {
            "save": savedir,
            "n": args.n_final,
            "frechet_pixels": rep["frechet_pixels"],
            "nn_distance_mean": {
                "facegen": rep["nn_distance"]["mean_facegen"],
                "torch_proxy": rep["nn_distance"]["mean_torch_proxy"],
            },
            "pixel_moments": rep["pixel_moments"],
        }
        out["variants_at_final_epoch"] = variants
        flush_out()
        px = rep["frechet_pixels"]
        print(f"variant {label} @ epoch {final}: pixel Fréchet vs real "
              f"{px['facegen_vs_real']:.2f} (proxy "
              f"{px['torch_proxy_vs_real']:.2f})", flush=True)

    # --- estimator noise floor at the final matched epoch -----------------
    # The 3072-dim pixel Fréchet from n samples has irreducible estimation
    # noise; two checkpoint-independent floors calibrate how big a
    # facegen-vs-proxy difference must be to mean anything:
    #  * real_split: the SAME real distribution against itself (two
    #    disjoint halves of the shuffled store)
    #  * facegen_redraw: the SAME generator, two independent noise draws
    fg_ckpt = os.path.join(args.facegen_save, f"adversarial_ep{final:05d}")
    g, d, bundle, meta, _ = parity._load_gan(fg_ckpt)
    inf = GanInference(g, d, int(meta.get("noise_dim", 100)))
    nf = args.n_final
    draw1 = np.asarray(inf.generate_n(bundle, jax.random.key(args.seed), nf))
    draw2 = np.asarray(inf.generate_n(bundle, jax.random.key(args.seed + 1),
                                      nf))
    perm = np.random.default_rng(0).permutation(train_images.shape[0])
    half = min(nf, train_images.shape[0] // 2)
    ra = train_images[perm[:half]].reshape(half, -1)
    rb = train_images[perm[half:2 * half]].reshape(half, -1)
    noise_floor = {
        "n": nf,
        "frechet_pixels_real_split": parity.frechet_distance(ra, rb),
        "frechet_pixels_facegen_redraw": parity.frechet_distance(
            draw1.reshape(nf, -1), draw2.reshape(nf, -1)),
    }
    print(f"noise floor (n={nf}): real-split "
          f"{noise_floor['frechet_pixels_real_split']:.2f}, "
          f"facegen-redraw "
          f"{noise_floor['frechet_pixels_facegen_redraw']:.2f}", flush=True)
    out["noise_floor"] = noise_floor
    flush_out()

    # --- symmetric embedding: the proxy's D as the feature space ----------
    # reports[final]'s frechet_d_features embeds both populations with
    # facegen's D; measure the same three distances with the proxy's D so
    # the comparison does not depend on whose ruler is used.
    sb_final, _ = proxy_samples(args.proxy_save, final, nf, args.seed)
    real_sub = train_images[perm[:nf]]
    f_fg, f_px, f_re = proxy_d_features(
        args.proxy_save, final, [draw1, sb_final, real_sub])
    reports[final]["frechet_d_features_proxy_embedding"] = {
        "facegen_vs_torch_proxy": parity.frechet_distance(f_fg, f_px),
        "facegen_vs_real": parity.frechet_distance(f_fg, f_re),
        "torch_proxy_vs_real": parity.frechet_distance(f_px, f_re),
    }
    pe = reports[final]["frechet_d_features_proxy_embedding"]
    print(f"proxy-D embedding Fréchet: facegen_vs_real "
          f"{pe['facegen_vs_real']:.2f} vs torch_proxy_vs_real "
          f"{pe['torch_proxy_vs_real']:.2f} (cross "
          f"{pe['facegen_vs_torch_proxy']:.2f})", flush=True)
    flush_out()  # reports[final] is out["final"]; embedding row just landed

    # --- equal wall-clock comparison --------------------------------------
    # Matched image budgets answer "same data seen"; this answers the
    # throughput-quality product a user actually buys: what each framework
    # delivers in the same elapsed time on its own hardware (facegen's
    # FURTHEST snapshot was reached in less wall-clock than the proxy's).
    fg_eps = sorted(
        int(m.group(1)) for p in glob.glob(
            os.path.join(args.facegen_save, "adversarial_ep*"))
        if (m := re.search(r"adversarial_ep(\d+)$", p)))
    equal_wallclock = None
    # the proxy may have snapshots beyond the last MATCHED epoch; the
    # "furthest vs furthest" comparison must use its true furthest
    px_last = proxy_epochs(args.proxy_save)[-1]
    if fg_eps and fg_eps[-1] > px_last:
        fg_last = fg_eps[-1]
        g2, d2, bundle2, meta2, _ = parity._load_gan(
            os.path.join(args.facegen_save, f"adversarial_ep{fg_last:05d}"))
        sb, _ = proxy_samples(args.proxy_save, px_last, args.n_final,
                              args.seed)
        rep = parity.sample_report(
            g2, d2, bundle2, sb,
            train_images=train_images,
            n_samples=args.n_final,
            noise_dim=int(meta2.get("noise_dim", 100)),
            key=jax.random.key(args.seed),
            label_a="facegen", label_b="torch_proxy",
        )
        # directional claim derived from the measured elapsed values, not
        # hardcoded (advisor round-4 finding)
        fg_el = log_elapsed(args.facegen_save, fg_last)
        px_el = log_elapsed(args.proxy_save, px_last)
        if fg_el is not None and px_el is not None and fg_el < px_el:
            ew_note = ("facegen's furthest snapshot vs the proxy's furthest "
                       "— facegen reached MORE images in LESS wall-clock "
                       "(elapsed fields below), so this is the quality each "
                       "framework delivers per unit time")
        else:
            ew_note = ("facegen's furthest snapshot vs the proxy's furthest; "
                       "compare the elapsed fields below for the per-time "
                       "interpretation")
        equal_wallclock = {
            "note": ew_note,
            "facegen_epoch": fg_last,
            "facegen_images_seen": fg_last * 1000,
            "facegen_elapsed_s": fg_el,
            "torch_proxy_epoch": px_last,
            "torch_proxy_images_seen": px_last * 1000,
            "torch_proxy_elapsed_s": px_el,
            "frechet_pixels": rep["frechet_pixels"],
            "frechet_d_features": rep["frechet_d_features"],
            "nn_distance": rep["nn_distance"],
            "pixel_moments": rep["pixel_moments"],
        }
        px = rep["frechet_pixels"]
        print(f"equal-wallclock: facegen ep{fg_last} pixel Fréchet vs real "
              f"{px['facegen_vs_real']:.2f} vs proxy ep{px_last} "
              f"{px['torch_proxy_vs_real']:.2f}", flush=True)

    out["equal_wallclock"] = equal_wallclock
    out["partial"] = False
    flush_out()
    print(f"wrote {args.out}")

    if args.grids:
        from facegen.utils.grids import save_grid

        os.makedirs(args.grids, exist_ok=True)
        fg_ckpt = os.path.join(args.facegen_save,
                               f"adversarial_ep{final:05d}")
        g, d, bundle, meta, _ = parity._load_gan(fg_ckpt)
        inf = GanInference(g, d, int(meta.get("noise_dim", 100)))
        key = jax.random.key(args.seed)
        sa = np.asarray(inf.generate_n(bundle, key, args.n_final))
        sc_a = np.asarray(inf.score(bundle, sa))
        sb, sc_b = proxy_samples(args.proxy_save, final, args.n_final,
                                 args.seed)
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
