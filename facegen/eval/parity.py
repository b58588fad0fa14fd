"""Quality-parity harness — the measurement half of the north star.

The reference's quality evidence is behavioral: sample.lua:80-98 ranks
1024 generated images by D score and saves best/worst grids, and
sample.lua:133-151 / README.md:18-23 pairs the best generations with
their nearest training neighbours by L2 distance ("the network does not
(merely) memorize"). adversarial_c2f.lua:305-344 (approxParzen) turns
the same min-NN-distance statistic into a scalar metric. This module
makes those behaviors *measurable* between two checkpoints/frameworks:

(a) **D-score rank correlation** — two discriminators are
    ranking-compatible when they induce the same order on a shared image
    set (Spearman rho over a mixed real+generated pool; the statistic
    behind sample.lua:84-89's best/worst selection).
(b) **NN-distance distribution parity** — each generator's
    min-L2-distance-to-training-set sample (one value per generated
    image, sample.lua:140-146 semantics, computed as one MXU GEMM) is
    compared across frameworks with a two-sample Kolmogorov–Smirnov
    test: same distribution => same memorization/coverage profile.
(c) **Fréchet feature distance** (FID-style) — Gaussian-Fréchet distance
    between sample populations embedded by a shared discriminator's
    penultimate features; reported A-vs-real, B-vs-real and A-vs-B.

CLI:
    python -m facegen.eval.parity --network_a logs_a/adversarial \
        --network_b logs_b/adversarial --n 1024 --synthetic \
        --out parity.json
emits one JSON report. Programmatic entry: `parity_report(...)`.
"""

from __future__ import annotations

import json
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from facegen.nn.core import Ctx, Module
from facegen.utils.infer import (
    GanInference,
    nearest_neighbours,
    prepare_nn_dataset,
)

# ---------------------------------------------------------------------------
# statistics (host-side, numpy; the heavy lifting is done on device first)
# ---------------------------------------------------------------------------


def _rankdata(x: np.ndarray) -> np.ndarray:
    """Average ranks (ties averaged), 1-based — matches scipy.rankdata."""
    x = np.asarray(x, np.float64)
    order = np.argsort(x, kind="mergesort")
    ranks = np.empty(len(x), np.float64)
    sx = x[order]
    i = 0
    while i < len(x):
        j = i
        while j + 1 < len(x) and sx[j + 1] == sx[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    return ranks


def spearman(a: np.ndarray, b: np.ndarray) -> float:
    """Spearman rank correlation (Pearson on average ranks)."""
    ra, rb = _rankdata(a), _rankdata(b)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra * ra).sum() * (rb * rb).sum())
    return float((ra * rb).sum() / denom) if denom > 0 else 0.0


def ks_2samp(a: np.ndarray, b: np.ndarray) -> Tuple[float, float]:
    """Two-sample KS statistic + asymptotic p-value.

    Tiny self-contained implementation (scipy-compatible on the
    statistic; p-value via the Kolmogorov asymptotic series) so the
    harness has no hard scipy dependency.
    """
    a = np.sort(np.asarray(a, np.float64))
    b = np.sort(np.asarray(b, np.float64))
    na, nb = len(a), len(b)
    both = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, both, side="right") / na
    cdf_b = np.searchsorted(b, both, side="right") / nb
    d = float(np.abs(cdf_a - cdf_b).max())
    en = np.sqrt(na * nb / (na + nb))
    t = (en + 0.12 + 0.11 / en) * d
    # Kolmogorov survival series
    p = 2.0 * sum((-1.0) ** (k - 1) * np.exp(-2.0 * (k * t) ** 2)
                  for k in range(1, 101))
    return d, float(min(max(p, 0.0), 1.0))


def frechet_distance(feats_a: np.ndarray, feats_b: np.ndarray,
                     eps: float = 1e-6) -> float:
    """Gaussian Fréchet distance between two feature populations.

    ||mu_a - mu_b||^2 + tr(Ca + Cb - 2 (Ca Cb)^(1/2)), with the matrix
    square root computed through an eigendecomposition of the symmetrized
    product (features are a few hundred dims — this is cheap on host).
    """
    a = np.asarray(feats_a, np.float64)
    b = np.asarray(feats_b, np.float64)
    mu_a, mu_b = a.mean(0), b.mean(0)
    diff = mu_a - mu_b
    dim = a.shape[1]
    if min(a.shape[0], b.shape[0]) < dim:
        # At least one covariance is rank-deficient (n < dim — the usual
        # case for pixel Fréchet: n<=4096 samples in 3072 dims). The
        # nonzero eigenvalues of Ca@Cb equal those of (Xa Xb^T)(Xb Xa^T)
        # for centered/scaled Xa, Xb (cyclic-permutation identity), so
        # tr sqrt(Ca Cb) comes from one eigvalsh of the SMALLER side's
        # min(n)-sized Gram — GEMMs plus an n^3 eigvalsh instead of two
        # dim^3 eigendecompositions (~6x cheaper at n=2048, dim=3072).
        # The eps*I ridge is unnecessary here (no inverse is taken); its
        # effect on the exact path is O(dim*sqrt(eps)) and the two paths
        # agree to ~1e-2 at these scales (tests/test_parity.py).
        xa = (a - mu_a) / np.sqrt(max(a.shape[0] - 1, 1))
        xb = (b - mu_b) / np.sqrt(max(b.shape[0] - 1, 1))
        if xb.shape[0] < xa.shape[0]:
            xa, xb = xb, xa
        m = xa @ xb.T                      # (n_small, n_large)
        w = np.clip(np.linalg.eigvalsh(m @ m.T), 0.0, None)
        tr_sqrt = float(np.sqrt(w).sum())
        tr_ca = float(np.sum(xa * xa))
        tr_cb = float(np.sum(xb * xb))
        return float(diff @ diff + tr_ca + tr_cb - 2.0 * tr_sqrt)
    ca = np.cov(a, rowvar=False) + eps * np.eye(a.shape[1])
    cb = np.cov(b, rowvar=False) + eps * np.eye(b.shape[1])
    # sqrtm(ca @ cb) has the same trace as sqrtm(sa @ cb @ sa) where
    # sa = sqrtm(ca); the latter is symmetric PSD => eigh is stable.
    wa, va = np.linalg.eigh(ca)
    wa = np.clip(wa, 0.0, None)
    sa = (va * np.sqrt(wa)) @ va.T
    m = sa @ cb @ sa
    wm = np.clip(np.linalg.eigvalsh(m), 0.0, None)
    tr_sqrt = float(np.sqrt(wm).sum())
    return float(diff @ diff + np.trace(ca) + np.trace(cb) - 2.0 * tr_sqrt)


# ---------------------------------------------------------------------------
# device-side measurement primitives
# ---------------------------------------------------------------------------

_EMBED_CACHE: dict = {}


def d_penultimate_features(
    d: Module, bundle: dict, images, batch: int = 256,
    compute_dtype: str = "bfloat16",
) -> np.ndarray:
    """Embed images with the discriminator's penultimate activations.

    Captures the input of D's final dense layer (the 512-d representation
    feeding fc_out in D32b, models.lua:411-413) via the module tree's
    activation hook; eval mode, fixed batch size for one compile.
    """
    dtype = jnp.dtype(compute_dtype)
    children = d.children
    assert len(children) >= 2, "discriminator must be a sequential"

    # a report embeds 2-3 populations with the SAME d — cache the jitted
    # closure per (module, dtype) or every call would recompile the
    # identical D-forward program (the dict holds d alive, so ids stay
    # unique for the cache's lifetime)
    cache_key = (id(d), compute_dtype)
    cached = _EMBED_CACHE.get(cache_key)
    if cached is None or cached[0] is not d:

        @jax.jit
        def _embed(params_d, state_d, x):
            ctx = Ctx(None, False)
            h = x.astype(dtype)
            for i, (k, m) in enumerate(children[:-1]):
                h, _ = m.apply(params_d[k], state_d[k], h, ctx.fold(i))
            return h.astype(jnp.float32)

        _EMBED_CACHE[cache_key] = (d, _embed)
    _embed = _EMBED_CACHE[cache_key][1]

    imgs = np.asarray(images, np.float32)
    n = imgs.shape[0]
    out = []
    for s in range(0, n, batch):
        chunk = imgs[s : s + batch]
        pad = batch - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:],
                                                    np.float32)])
        feats = np.asarray(_embed(bundle["params_d"], bundle["state_d"],
                                  jnp.asarray(chunk)))
        out.append(feats[: batch - pad] if pad else feats)
    return np.concatenate(out)


def min_nn_distances(images, train_set, batch: int = 1024) -> np.ndarray:
    """Min L2 distance from each image to the training set
    (sample.lua:140-146 / approxParzen adversarial_c2f.lua:316-327),
    as one GEMM sweep per batch over the HBM-resident set."""
    df = (train_set if isinstance(train_set, jax.Array) and train_set.ndim == 2
          else prepare_nn_dataset(train_set))
    imgs = np.asarray(images, np.float32)
    dists = []
    for s in range(0, imgs.shape[0], batch):
        _, dist = nearest_neighbours(jnp.asarray(imgs[s : s + batch]), df, k=1)
        dists.append(dist[:, 0])
    return np.concatenate(dists)


def train_set_nn_calibration(train_images, key: Optional[jax.Array] = None,
                             ) -> Dict:
    """The training set's own nearest-neighbour spacing — the yardstick
    for reading generated-sample NN distances (a generator emitting
    novel in-distribution faces lands near these values; ~0 would be
    memorization, far above p90 would be off-distribution).

    Two views: **half-vs-half** (min distance from each image of one
    random half to the other half) and **leave-one-out** (min distance
    to any *other* train image, via a k=2 self-search whose first
    neighbour is the image itself at distance 0). Both run as the same
    MXU GEMM sweep as the generated-sample statistic
    (sample.lua:140-146 semantics)."""
    train_np = np.asarray(train_images, np.float32)
    if train_np.max() > 1.5:
        train_np = train_np / 255.0
    flat = train_np.reshape(len(train_np), -1)

    _, d2 = nearest_neighbours(jnp.asarray(flat), jnp.asarray(flat), k=2)
    loo = d2[:, 1]

    key = jax.random.key(0) if key is None else key
    perm = np.asarray(jax.random.permutation(key, len(flat)))
    h = len(flat) // 2
    _, dab = nearest_neighbours(jnp.asarray(flat[perm[:h]]),
                                jnp.asarray(flat[perm[h : 2 * h]]), k=1)
    hvh = dab[:, 0]

    def _stats(x: np.ndarray) -> Dict:
        return {"mean": float(x.mean()),
                "p10": float(np.percentile(x, 10)),
                "p90": float(np.percentile(x, 90))}

    return {"nn_half_vs_half": _stats(hvh), "nn_leave_one_out": _stats(loo)}


# ---------------------------------------------------------------------------
# the report
# ---------------------------------------------------------------------------


def parity_report(
    g_a: Module, d_a: Module, bundle_a: dict,
    g_b: Module, d_b: Module, bundle_b: dict,
    train_images,
    n_samples: int = 1024,
    noise_dim_a: int = 100,
    noise_dim_b: int = 100,
    key: Optional[jax.Array] = None,
    compute_dtype: str = "bfloat16",
    label_a: str = "a",
    label_b: str = "b",
) -> Dict:
    """Compute the three parity statistics between two trained GANs.

    train_images: (N, H, W, C) array in [0,1] (or uint8) — the shared
    training distribution both samplers are measured against.
    """
    key = jax.random.key(0) if key is None else key
    k_a, k_b, k_mix = jax.random.split(key, 3)
    inf_a = GanInference(g_a, d_a, noise_dim_a, compute_dtype)
    inf_b = GanInference(g_b, d_b, noise_dim_b, compute_dtype)

    samples_a = np.asarray(inf_a.generate_n(bundle_a, k_a, n_samples))
    samples_b = np.asarray(inf_b.generate_n(bundle_b, k_b, n_samples))

    train_np = np.asarray(train_images, np.float32)
    if train_np.max() > 1.5:
        train_np = train_np / 255.0

    # (a) rank correlation on a shared pool: half real, quarter from each
    # G — the image population sample.lua:84-89 ranks.
    n_real = min(n_samples, train_np.shape[0])
    ridx = np.asarray(jax.random.permutation(k_mix, train_np.shape[0])[:n_real])
    quarter = max(n_samples // 4, 1)
    shared = np.concatenate([
        train_np[ridx][: n_samples // 2],
        samples_a[:quarter],
        samples_b[:quarter],
    ])
    scores_a = np.asarray(inf_a.score(bundle_a, jnp.asarray(shared)))
    scores_b = np.asarray(inf_b.score(bundle_b, jnp.asarray(shared)))
    rho = spearman(scores_a, scores_b)

    # (b) NN-distance distributions
    df = prepare_nn_dataset(train_np)
    nn_a = min_nn_distances(samples_a, df)
    nn_b = min_nn_distances(samples_b, df)
    ks_stat, ks_p = ks_2samp(nn_a, nn_b)

    # (c) Fréchet distance in a shared embedding (D_a's penultimate
    # features) — A-vs-real, B-vs-real, A-vs-B
    feats_real = d_penultimate_features(d_a, bundle_a, train_np[ridx],
                                        compute_dtype=compute_dtype)
    feats_a = d_penultimate_features(d_a, bundle_a, samples_a,
                                     compute_dtype=compute_dtype)
    feats_b = d_penultimate_features(d_a, bundle_a, samples_b,
                                     compute_dtype=compute_dtype)
    fd_a_real = frechet_distance(feats_a, feats_real)
    fd_b_real = frechet_distance(feats_b, feats_real)
    fd_a_b = frechet_distance(feats_a, feats_b)

    return {
        "n_samples": int(n_samples),
        "labels": [label_a, label_b],
        "rank_correlation": {
            "spearman_rho": rho,
            "pool": "50% real + 25% from each G",
            "pool_size": int(shared.shape[0]),
        },
        "nn_distance": {
            f"mean_{label_a}": float(nn_a.mean()),
            f"mean_{label_b}": float(nn_b.mean()),
            f"std_{label_a}": float(nn_a.std()),
            f"std_{label_b}": float(nn_b.std()),
            "ks_stat": ks_stat,
            "ks_pvalue": ks_p,
        },
        "frechet_d_features": {
            f"{label_a}_vs_real": fd_a_real,
            f"{label_b}_vs_real": fd_b_real,
            f"{label_a}_vs_{label_b}": fd_a_b,
        },
        "parity": {
            # rank order agreement: rho >= 0.7 is "same ranking behavior"
            "rank_parity": bool(rho >= 0.7),
            # same NN-distance distribution at the 1% level, or close
            # enough in KS distance
            "nn_parity": bool(ks_p >= 0.01 or ks_stat <= 0.15),
        },
    }


def sample_report(
    g_a: Module, d_a: Module, bundle_a: dict,
    samples_b,
    train_images=None,
    n_samples: Optional[int] = None,
    noise_dim: int = 100,
    key: Optional[jax.Array] = None,
    compute_dtype: str = "bfloat16",
    label_a: str = "ours",
    label_b: str = "reference",
) -> Dict:
    """Compare our generator against a RAW sample population (no second
    checkpoint) — e.g. the reference repo's published grid images
    (images/color_random1024.jpg, sliced by facegen/eval/refgrid.py).

    Cross-framework statistics that need only one discriminator:
    - D-score distribution KS: D_a scores both populations; identical
      generators give identical score distributions (the population
      statistic behind sample.lua:84-89's ranking).
    - Fréchet distance in D_a's penultimate features, A-vs-B (and each
      vs real when ``train_images`` is provided), plus the same distance
      in raw pixel space — the latter is independent of the measuring
      checkpoint (D-feature distances go blunt when D sits at its 0.5
      equilibrium).
    - NN-distance distribution KS vs the shared training set (only with
      ``train_images``; the reference grids were trained on LFW, so
      this is apples-to-apples only once the same dataset is packed).
    - per-channel pixel moments, as a cheap sanity row.
    """
    key = jax.random.key(0) if key is None else key
    sb = np.asarray(samples_b, np.float32)
    if sb.max() > 1.5:
        sb = sb / 255.0
    n = int(n_samples or sb.shape[0])
    inf_a = GanInference(g_a, d_a, noise_dim, compute_dtype)
    sa = np.asarray(inf_a.generate_n(bundle_a, key, n))

    scores_a = np.asarray(inf_a.score(bundle_a, jnp.asarray(sa)))
    scores_b = np.asarray(inf_a.score(bundle_a, jnp.asarray(sb)))
    ks_score, ks_score_p = ks_2samp(scores_a, scores_b)

    feats_a = d_penultimate_features(d_a, bundle_a, sa,
                                     compute_dtype=compute_dtype)
    feats_b = d_penultimate_features(d_a, bundle_a, sb,
                                     compute_dtype=compute_dtype)
    # pixel-space Fréchet rides along as a checkpoint-INDEPENDENT check:
    # the D-feature embedding is the measuring checkpoint's own
    # discriminator, which goes blunt as D reaches its 0.5 equilibrium —
    # a population gap that D no longer sees still shows up here.
    px_a = sa.reshape(len(sa), -1)
    px_b = sb.reshape(len(sb), -1)
    report: Dict = {
        "n_samples": {label_a: int(sa.shape[0]), label_b: int(sb.shape[0])},
        "labels": [label_a, label_b],
        "d_score": {
            f"mean_{label_a}": float(scores_a.mean()),
            f"mean_{label_b}": float(scores_b.mean()),
            "ks_stat": ks_score,
            "ks_pvalue": ks_score_p,
        },
        "frechet_d_features": {f"{label_a}_vs_{label_b}":
                               frechet_distance(feats_a, feats_b)},
        "frechet_pixels": {f"{label_a}_vs_{label_b}":
                           frechet_distance(px_a, px_b)},
        "pixel_moments": {
            f"mean_{label_a}": [float(v) for v in sa.mean(axis=(0, 1, 2))],
            f"mean_{label_b}": [float(v) for v in sb.mean(axis=(0, 1, 2))],
            f"std_{label_a}": [float(v) for v in sa.std(axis=(0, 1, 2))],
            f"std_{label_b}": [float(v) for v in sb.std(axis=(0, 1, 2))],
        },
    }
    if train_images is not None:
        train_np = np.asarray(train_images, np.float32)
        if train_np.max() > 1.5:
            train_np = train_np / 255.0
        df = prepare_nn_dataset(train_np)
        nn_a = min_nn_distances(sa, df)
        nn_b = min_nn_distances(sb, df)
        ks_stat, ks_p = ks_2samp(nn_a, nn_b)
        report["nn_distance"] = {
            f"mean_{label_a}": float(nn_a.mean()),
            f"mean_{label_b}": float(nn_b.mean()),
            "ks_stat": ks_stat,
            "ks_pvalue": ks_p,
        }
        report["calibration"] = {
            "note": "the train set's own nearest-neighbour spacings — "
                    "the yardstick for mean NN distances above (~0 = "
                    "memorizing; far above p90 = off-distribution)",
            **train_set_nn_calibration(train_np),
        }
        n_real = min(n, train_np.shape[0])
        feats_real = d_penultimate_features(d_a, bundle_a, train_np[:n_real],
                                            compute_dtype=compute_dtype)
        report["frechet_d_features"][f"{label_a}_vs_real"] = (
            frechet_distance(feats_a, feats_real))
        report["frechet_d_features"][f"{label_b}_vs_real"] = (
            frechet_distance(feats_b, feats_real))
        px_real = train_np[:n_real].reshape(n_real, -1)
        report["frechet_pixels"][f"{label_a}_vs_real"] = (
            frechet_distance(px_a, px_real))
        report["frechet_pixels"][f"{label_b}_vs_real"] = (
            frechet_distance(px_b, px_real))
    return report


def self_report(
    g: Module, d: Module, bundle: dict, train_images,
    n_samples: int = 1024, noise_dim: int = 100,
    key: Optional[jax.Array] = None, compute_dtype: str = "bfloat16",
) -> Dict:
    """Single-checkpoint quality report (no comparison target): NN
    distance stats of generated vs train (the approxParzen scalar,
    adversarial_c2f.lua:329-331) and Fréchet-to-real."""
    key = jax.random.key(0) if key is None else key
    inf = GanInference(g, d, noise_dim, compute_dtype)
    samples = np.asarray(inf.generate_n(bundle, key, n_samples))
    train_np = np.asarray(train_images, np.float32)
    if train_np.max() > 1.5:
        train_np = train_np / 255.0
    nn = min_nn_distances(samples, train_np)
    n_real = min(n_samples, train_np.shape[0])
    feats_real = d_penultimate_features(d, bundle, train_np[:n_real],
                                        compute_dtype=compute_dtype)
    feats = d_penultimate_features(d, bundle, samples,
                                   compute_dtype=compute_dtype)
    return {
        "n_samples": int(n_samples),
        "nn_distance": {"mean": float(nn.mean()), "std": float(nn.std()),
                        "min": float(nn.min()), "max": float(nn.max())},
        "frechet_vs_real": frechet_distance(feats, feats_real),
    }


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------


def _load_gan(network: str, scale=None, grayscale=None, noise_dim=None):
    """Load a GAN checkpoint given 'dir/name' (reference .net tolerated).

    Architecture is rebuilt from the checkpoint's own stored config;
    non-None arguments are checked overrides (models/gan.py:restore_gan).
    Returns (g, d, bundle, meta, resolved).
    """
    from facegen.models import gan

    return gan.restore_gan(network, default_dir="logs", scale=scale,
                           grayscale=grayscale, noise_dim=noise_dim)


def _load_train_images(args) -> np.ndarray:
    from facegen.data.pipeline import prepare_pool

    channels = 1 if args.grayscale else 3
    if args.synthetic:
        from facegen.data.synthetic import synthetic_faces

        raw = synthetic_faces(jax.random.key(0), args.n_train)
    else:
        from facegen.data.lfw import default_store_path, load_store

        path = args.data or default_store_path(False)
        store = load_store(path)
        raw = jnp.asarray(np.asarray(store[: args.n_train]))
    return np.asarray(prepare_pool(raw, jax.random.key(0), args.scale,
                                   channels, augment=False))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="facegen quality-parity report "
                    "(sample.lua:80-98 + adversarial_c2f.lua:305-344 "
                    "statistics, comparable across frameworks)")
    p.add_argument("--network_a", required=True,
                   help="checkpoint A as dir/name (e.g. logs/adversarial)")
    p.add_argument("--network_b", default=None,
                   help="checkpoint B; omit for a single-checkpoint report")
    p.add_argument("--samples_b", default=None,
                   help="grid image of raw samples to compare against "
                        "(e.g. the reference repo's images/"
                        "color_random1024.jpg), sliced at --tile px")
    p.add_argument("--tile", type=int, default=32,
                   help="tile size when slicing --samples_b")
    p.add_argument("--no_train_set", action="store_true",
                   help="with --samples_b: skip train-set statistics "
                        "(use when the raw samples came from a different "
                        "training distribution)")
    # None = take the value from checkpoint A's own meta.json config;
    # explicit flags are checked overrides (models/gan.py:restore_gan)
    p.add_argument("--scale", type=int, default=None)
    p.add_argument("--grayscale", action="store_true", default=None)
    p.add_argument("--noiseDim", type=int, default=None, dest="noise_dim")
    p.add_argument("--n", type=int, default=1024, help="samples per side")
    p.add_argument("--n_train", type=int, default=4096,
                   help="training images to measure against")
    p.add_argument("--synthetic", action="store_true",
                   help="use the procedural face dataset")
    p.add_argument("--data", type=str, default=None,
                   help="packed LFW store path (defaults to the standard one)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--out", type=str, default=None,
                   help="write the JSON report here as well as stdout")
    args = p.parse_args(argv)

    # checkpoint A's stored config resolves any flag left at None
    g_a, d_a, bundle_a, _, res = _load_gan(
        args.network_a, args.scale, args.grayscale, args.noise_dim)
    args.scale = res["scale"]
    args.grayscale = res["grayscale"]
    args.noise_dim = res["noise_dim"]
    train_images = None if (args.samples_b and args.no_train_set) else (
        _load_train_images(args))
    if args.samples_b:
        from facegen.eval.refgrid import load_grid

        samples_b = load_grid(args.samples_b, args.tile,
                              grayscale=args.grayscale)
        if samples_b.shape[1] != args.scale:
            # published grids are 32px; a 16px checkpoint compares
            # against the same population at ITS scale via the
            # load-time bilinear downscale every training image takes
            # (dataset.lua:90-95)
            n, _, _, c = samples_b.shape
            samples_b = np.asarray(jax.image.resize(
                jnp.asarray(samples_b, jnp.float32),
                (n, args.scale, args.scale, c), method="linear"))
        report = sample_report(
            g_a, d_a, bundle_a, samples_b, train_images,
            n_samples=args.n, noise_dim=args.noise_dim,
            key=jax.random.key(args.seed),
        )
    elif args.network_b:
        # B must agree with A's shapes for the shared statistics; passing
        # A's resolved values as overrides makes a mismatch error clearly
        g_b, d_b, bundle_b, _, _ = _load_gan(
            args.network_b, args.scale, args.grayscale, args.noise_dim)
        report = parity_report(
            g_a, d_a, bundle_a, g_b, d_b, bundle_b, train_images,
            n_samples=args.n, noise_dim_a=args.noise_dim,
            noise_dim_b=args.noise_dim, key=jax.random.key(args.seed),
            label_a="a", label_b="b",
        )
    else:
        report = self_report(g_a, d_a, bundle_a, train_images,
                             n_samples=args.n, noise_dim=args.noise_dim,
                             key=jax.random.key(args.seed))
    text = json.dumps(report, indent=2)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
