#!/usr/bin/env python3
"""Regenerate COVERAGE.md's operator table from the query registry.

The table maps every SURVEY §2 operator tag (``survey_ops``) to the
registry queries that exercise it, marking rows-only entries (no
DuckDB oracle). Run after adding queries so the judge-facing coverage
claims can never drift from the code:

    python scripts/gen_coverage.py          # rewrite COVERAGE.md
    python scripts/gen_coverage.py --check  # exit 1 if stale (CI use)
"""

from __future__ import annotations

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY

HEADER_END = "| SURVEY op | registry queries |\n|---|---|\n"


def _sort_key(tag: str):
    # S1..S17 / F1.. etc numerically within their letter family; then
    # kebab-case beyond-reference tags; §-sections last.
    m = re.fullmatch(r"([A-Z]+)(\d+)(-.*)?", tag)
    if m:
        return (0, m.group(1), int(m.group(2)), m.group(3) or "")
    if tag.startswith("§"):
        return (2, tag, 0, "")
    return (1, tag, 0, "")


def render() -> str:
    by_tag: dict[str, list[str]] = defaultdict(list)
    for name, q in sorted(REGISTRY.items()):
        label = f"`{name}`" if q.oracle else f"`{name}` (rows-only)"
        for tag in q.survey_ops:
            by_tag[tag].append(label)
    lines = [
        f"| {tag} | {', '.join(by_tag[tag])} |"
        for tag in sorted(by_tag, key=_sort_key)
    ]
    n_oracle = sum(1 for q in REGISTRY.values() if q.oracle)
    totals = f"\n**Totals**: {len(REGISTRY)} queries, {n_oracle} with DuckDB oracles.\n"
    return "\n".join(lines) + "\n" + totals


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md")
    with open(path) as f:
        current = f.read()
    head = current.split(HEADER_END)[0] + HEADER_END
    new = head + render()
    if "--check" in sys.argv:
        if new != current:
            print("COVERAGE.md is stale — run scripts/gen_coverage.py")
            sys.exit(1)
        print("COVERAGE.md up to date")
        return
    with open(path, "w") as f:
        f.write(new)
    print(f"wrote {path}: {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
