#!/usr/bin/env python3
"""Oracle-fragility linter: catch cross-engine / cross-DuckDB-build
parity traps BEFORE a query rotates into the external driver window.

Round-5 forensics: 4 of 50 driver-window queries failed the driver's
value hash while being bit-identical locally. The common factor was
NOT hex-casts or libm ln (both driver-green elsewhere) — it was the
oracle's OUTPUT COLUMN TYPE. DuckDB's SUM(BIGINT) returns HUGEINT
(int128); the local gate compares via cursor.fetchall() (Python ints,
equal either way), but a harness that normalizes through pandas or
Arrow sees HUGEINT as float64 / decimal128 ("6.0" / Decimal('6') vs
Spark's long "6") and the value hash diverges. All 4 red queries — and
ONLY the red queries among the 50 — had a HUGEINT output column.

Checks, in order of severity:

FAIL  output column type outside the driver-proven-safe set
      {BIGINT, INTEGER, SMALLINT, VARCHAR, DOUBLE, BOOLEAN, DATE,
      TIMESTAMP}. HUGEINT/UHUGEINT (any SUM of an integer column),
      DECIMAL (pandas keeps scale: Decimal('0.50') != 0.5), FLOAT
      (binary32 repr drift), TINYINT (pandas int8 — safe in theory,
      but never driver-proven) all flag. Fix at the oracle's final
      projection: CAST(... AS BIGINT / DOUBLE).
FAIL  oracle does not parse / bind on the local DuckDB.
WARN  WITH RECURSIVE — recursion depth is data-dependent and engine
      evaluation differs across builds; justify in the docstring.
WARN  CTE chain depth > 35 — deep unrolled folds are legal but are
      the place engine-version differences hide; keep them shallow.
WARN  raw FLOOR(...LN(...)) quantization — a libm knife-edge only
      fires when 1e6*ln(x) lands within ~1e-9 of an integer
      (measured: the registry's grids sit >= 1e-2 away), so this is
      informational; new oracles should keep ratios rational.

Usage:
    python scripts/oracle_lint.py [sf_dir] [name ...]   # default: all
    python scripts/oracle_lint.py --window              # first 50 only

Exit nonzero on any FAIL.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from mlentory_etl_pipeline_spark.sources.tpch import TABLES  # noqa: E402

SAFE_TYPES = re.compile(
    r"^(BIGINT|INTEGER|SMALLINT|VARCHAR|DOUBLE|BOOLEAN|DATE|TIMESTAMP)$"
)


def lint_one(con, name: str, sql: str) -> tuple[list[str], list[str]]:
    fails: list[str] = []
    warns: list[str] = []
    try:
        rel = con.sql("SELECT * FROM (" + sql + ") LIMIT 0")
    except Exception as e:  # noqa: BLE001 - a bind error IS the finding
        return [f"oracle does not bind: {type(e).__name__}: {e}"[:160]], []
    for col, typ in zip(rel.columns, rel.types):
        ts = str(typ)
        if not SAFE_TYPES.match(ts):
            fails.append(
                f"output column `{col}` is {ts} — outside the "
                f"driver-proven-safe type set; CAST it in the oracle"
            )
    up = sql.upper()
    if "WITH RECURSIVE" in up:
        warns.append("WITH RECURSIVE — engine-version-sensitive; justify")
    depth = len(re.findall(r"\bAS\s+(?:MATERIALIZED\s+)?\(", up))
    if depth > 35:
        warns.append(f"CTE chain depth {depth} > 35")
    if re.search(r"FLOOR\s*\(\s*LN\s*\(", up) or re.search(
        r"FLOOR\s*\([^()]*\bLN\s*\(", up
    ):
        warns.append("floor(ln(...)) quantization — keep away from knife-edges")
    return fails, warns


def main() -> None:
    args = sys.argv[1:]
    window_only = "--window" in args
    args = [a for a in args if a != "--window"]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = [a for a in args if not os.path.isdir(a)]
    if not names:
        names = list(REGISTRY)[:50] if window_only else list(REGISTRY)
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE VIEW {tname} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tname}.parquet')"
        )
    n_fail = n_warn = 0
    for name in names:
        q = REGISTRY.get(name)
        sql = getattr(q, "oracle", None) if q else None
        if not sql:
            continue
        fails, warns = lint_one(con, name, sql)
        for f in fails:
            print(f"FAIL {name}: {f}")
        for w in warns:
            print(f"warn {name}: {w}")
        n_fail += len(fails)
        n_warn += len(warns)
    print(
        f"oracle_lint: {len(names)} checked, "
        f"{n_fail} failures, {n_warn} warnings"
    )
    if n_fail:
        sys.exit(1)


if __name__ == "__main__":
    main()
