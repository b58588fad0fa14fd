"""Rank-uniformity analysis of the matched-budget seed spread.

Reproduces (from docs/artifacts/seed_spread.json) the ROUND5.md
headline statistics for the head-to-head quality question: at each
matched image budget, where does each torch-proxy run rank inside the
facegen seed field?  If the two implementations draw per-seed quality
from the SAME distribution, those ranks are uniform on 1..k+1 — so a
one-sample KS test of the observed ranks against uniform is the
summary statistic (asymptotic p with the Stephens small-sample
correction; the caveat that points along one proxy seed's trajectory
are not independent applies, as stated in ROUND5.md).

Mirrors the quality evidence of /root/reference/sample.lua:80-98 (the
reference's published sample grids) in distributional form.

Usage:
  python tools/rank_analysis.py \
      --spread docs/artifacts/seed_spread.json \
      --out docs/artifacts/rank_analysis.json
"""

from __future__ import annotations

import argparse
import json
import math
import os


def ks_uniform(us: list[float]) -> tuple[float, float]:
    """One-sample KS statistic of `us` against U(0,1) + asymptotic
    p-value with the Stephens correction (matches scipy to ~1e-2 at
    n>=10)."""
    n = len(us)
    xs = sorted(us)
    d = 0.0
    for i, x in enumerate(xs):
        d = max(d, (i + 1) / n - x, x - i / n)
    lam = (math.sqrt(n) + 0.12 + 0.11 / math.sqrt(n)) * d
    p = 2.0 * sum((-1) ** (k - 1) * math.exp(-2.0 * k * k * lam * lam)
                  for k in range(1, 101))
    return d, max(0.0, min(1.0, p))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--spread", default="docs/artifacts/seed_spread.json")
    ap.add_argument("--out", default="docs/artifacts/rank_analysis.json")
    args = ap.parse_args(argv)

    with open(args.spread) as f:
        spread = json.load(f)

    rows = []
    ranks = []          # (proxy label, budget, rank r, field size m)
    for ep in sorted(spread["budgets"], key=int):
        b = spread["budgets"][ep]
        fg = sorted(v["frechet_pixels_vs_real"] for v in b["facegen"].values())
        if not fg:
            continue
        k = len(fg)
        row = {
            "images": b["images_seen"],
            "facegen_n_runs": k,
            "facegen_median": round(_median(fg), 2),
            "facegen_mean": round(sum(fg) / k, 2),
            "facegen_sd": round(_sd(fg), 2),
            "facegen_min": round(fg[0], 2),
            "facegen_max": round(fg[-1], 2),
            "proxy": {},
        }
        for lab, v in sorted(b["proxy"].items()):
            pv = v["frechet_pixels_vs_real"]
            r = sum(x < pv for x in fg) + 1
            row["proxy"][lab] = {"frechet": round(pv, 2),
                                 "rank": f"{r}/{k + 1}"}
            ranks.append((lab, int(ep), r, k + 1))
        rows.append(row)

    # rank -> (0,1): the mid-rank convention r/(m+1) keeps a rank of
    # (m+1)/2 at exactly 0.5 and never touches the 0/1 endpoints.
    us = [r / (m + 1) for _, _, r, m in ranks]
    d, p = ks_uniform(us) if len(us) >= 3 else (float("nan"), float("nan"))
    out = {
        "spread": args.spread,
        "n_observations": len(ranks),
        "observations": [
            {"proxy": lab, "budget_epochs": ep, "rank": r, "of": m}
            for lab, ep, r, m in ranks
        ],
        "rank_mean": round(sum(r for _, _, r, _ in ranks) / len(ranks), 2),
        "rank_median": _median(sorted(r for _, _, r, _ in ranks)),
        "rank_min": min(r for _, _, r, _ in ranks),
        "rank_max": max(r for _, _, r, _ in ranks),
        "null_expected_mean": round(
            sum((m + 1) / 2 for _, _, _, m in ranks) / len(ranks), 2),
        "ks_vs_uniform": {"D": round(d, 3), "p_asymptotic": round(p, 3),
                          "caveat": "trajectory points within one proxy "
                                    "seed are not independent; p is "
                                    "approximate"},
        "budgets": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)

    print(f"{len(ranks)} proxy observations; ranks "
          f"{out['rank_min']}..{out['rank_max']}, median "
          f"{out['rank_median']}, mean {out['rank_mean']} "
          f"(null {out['null_expected_mean']})")
    print(f"KS vs uniform: D={d:.3f}, p~{p:.3f}")
    for row in rows:
        pstr = "  ".join(f"{lab}={v['frechet']:.1f} (r{v['rank']})"
                         for lab, v in row["proxy"].items())
        print(f"  {row['images']:>7d} imgs: fg median "
              f"{row['facegen_median']:6.2f} "
              f"[{row['facegen_min']:.1f},{row['facegen_max']:.1f}]  {pstr}")
    print(f"wrote {args.out}")


def _median(xs):
    n = len(xs)
    return (xs[n // 2] if n % 2 else (xs[n // 2 - 1] + xs[n // 2]) / 2)


def _sd(xs):
    m = sum(xs) / len(xs)
    return math.sqrt(sum((x - m) ** 2 for x in xs) / len(xs))


if __name__ == "__main__":
    main()
