#!/usr/bin/env python3
"""Round-over-round bench comparison: the per-query RATIO SHAPE the
round reviews read by hand (sandbox co-tenancy adds ±2× noise to any
single number; a FLAT ratio profile across queries is noise, a spike
on one query is a regression).

Compares the newest valid driver artifact (BENCH_r*.json, parsed
non-null) — or, if newer, the local BENCH_DETAIL.json — against the
previous valid artifact. Prints per-query warm ratios sorted worst
first, flags > ``--flag`` (default 2.0) moves in EITHER direction,
and exits nonzero only for queries flagged in BOTH warm and cold
(co-tenancy rarely hits the same query twice).

Usage: python scripts/bench_compare.py [--flag 2.0]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str) -> dict | None:
    try:
        with open(path) as f:
            d = json.load(f)
    except (OSError, json.JSONDecodeError):
        return None
    if os.path.basename(path).startswith("BENCH_r"):
        d = d.get("parsed")
    if not isinstance(d, dict) or "queries" not in d:
        return None
    d["_path"] = path
    d["_mtime"] = os.path.getmtime(path)
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag", type=float, default=2.0)
    args = ap.parse_args()

    arts = [
        a
        for a in (
            _load(p)
            for p in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
            + [os.path.join(ROOT, "BENCH_DETAIL.json")]
            if isinstance(p, str)
        )
        if a
    ]
    arts.sort(key=lambda a: a["_mtime"])
    if len(arts) < 2:
        print("need two valid bench artifacts to compare")
        return
    prev, cur = arts[-2], arts[-1]
    print(f"comparing {os.path.basename(prev['_path'])} -> "
          f"{os.path.basename(cur['_path'])}")

    def ratios(key: str) -> dict[str, float]:
        a, b = prev.get(key) or {}, cur.get(key) or {}
        return {
            q: round(b[q] / a[q], 2)
            for q in a
            if q in b and a[q] > 0.05  # sub-50ms numbers are all noise
        }

    warm = ratios("queries")
    cold = ratios("cold_queries")
    ext = ratios("extended")
    flagged_warm = {q for q, r in warm.items() if r > args.flag or r < 1 / args.flag}
    flagged_cold = {q for q, r in cold.items() if r > args.flag or r < 1 / args.flag}
    both = flagged_warm & flagged_cold

    for label, rs in (("warm", warm), ("cold", cold), ("extended", ext)):
        if not rs:
            continue
        worst = sorted(rs.items(), key=lambda kv: -kv[1])[:8]
        print(f"  {label}: median "
              f"{sorted(rs.values())[len(rs) // 2]:.2f}  worst "
              + "  ".join(f"{q}={r}" for q, r in worst[:4]))
    print(json.dumps({
        "metric": "bench_compare",
        "prev": os.path.basename(prev["_path"]),
        "cur": os.path.basename(cur["_path"]),
        "warm_total_ratio": round(cur.get("value", 0) / prev.get("value", 1), 3),
        "flagged_warm": sorted(flagged_warm),
        "flagged_cold": sorted(flagged_cold),
        "flagged_both": sorted(both),
    }))
    if both:
        sys.exit(1)


if __name__ == "__main__":
    main()
