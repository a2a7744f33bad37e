#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

For every registry query with an oracle: run the Spark plan and the
DuckDB SQL on the same sf dir, compare row count, column-name set, and
an order-insensitive canonicalized multiset of values. Prints a table
and exits nonzero on any mismatch.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime, timezone
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from mlentory_etl_pipeline_spark.session import get_spark  # noqa: E402
from mlentory_etl_pipeline_spark.sources.tpch import TABLES  # noqa: E402


def canon(v, naive_utc: bool = False):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("num", "nan")
        return ("num", round(v, 9))
    if isinstance(v, int):
        return ("num", float(v))
    if isinstance(v, datetime):
        # Canonicalize to the INSTANT (epoch seconds), host-TZ-invariant.
        # PySpark collect() renders TimestampType as a NAIVE datetime in
        # the HOST local zone (TimestampType.fromInternal uses
        # datetime.fromtimestamp), so interpreting naive-as-local
        # recovers the instant regardless of the machine's TZ; DuckDB
        # naive timestamps are UTC wall clocks and go through
        # canon(..., naive_utc=True). Aware datetimes carry their zone.
        # (Known limit: a DST-fold local hour is ambiguous — the gate
        # and audits run in DST-free zones.)
        if v.tzinfo is None and not naive_utc:
            return ("ts", v.timestamp())
        return ("ts", v.replace(tzinfo=v.tzinfo or timezone.utc).timestamp())
    if isinstance(v, date):
        # UTC-midnight epoch, so a DATE on one side equals a midnight
        # TIMESTAMP on the other (as the old isoformat canon did)
        return (
            "ts",
            datetime(v.year, v.month, v.day, tzinfo=timezone.utc).timestamp(),
        )
    if isinstance(v, (list, tuple)):
        return tuple(canon(x, naive_utc=naive_utc) for x in v)
    if isinstance(v, dict):
        return tuple(
            sorted((k, canon(x, naive_utc=naive_utc)) for k, x in v.items())
        )
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def _timestamp_kinds(dt) -> set:
    """Recursively collect timestamp type-names ('timestamp' /
    'timestamp_ntz') appearing anywhere inside a Spark DataType —
    including array elements, struct fields, and map keys/values."""
    kinds = set()
    name = dt.typeName()
    if name in ("timestamp", "timestamp_ntz"):
        kinds.add(name)
    if hasattr(dt, "elementType"):  # ArrayType
        kinds |= _timestamp_kinds(dt.elementType)
    if hasattr(dt, "fields"):  # StructType
        for f in dt.fields:
            kinds |= _timestamp_kinds(f.dataType)
    if hasattr(dt, "keyType"):  # MapType
        kinds |= _timestamp_kinds(dt.keyType)
        kinds |= _timestamp_kinds(dt.valueType)
    return kinds


def instant_cols(df) -> frozenset:
    """Columns containing Spark type TIMESTAMP (instant semantics) at
    ANY nesting depth — array/struct/map included, since collect()
    renders every nested TimestampType as a naive HOST-LOCAL datetime
    too, and canon recurses with the column's flag. canon must
    interpret these as local to recover the instant; every other naive
    datetime (TIMESTAMP_NTZ from Spark, DuckDB TIMESTAMP) is a
    TZ-independent wall clock and goes through naive_utc=True. A column
    mixing both semantics under one nested type can't be classified by
    a per-column flag — assert it out (no registry query produces one)."""
    out = set()
    for f in df.schema.fields:
        kinds = _timestamp_kinds(f.dataType)
        if kinds == {"timestamp", "timestamp_ntz"}:
            raise AssertionError(
                f"column {f.name!r} nests both TIMESTAMP and "
                "TIMESTAMP_NTZ — per-column instant canonicalization "
                "cannot represent it; split the column"
            )
        if "timestamp" in kinds:
            out.add(f.name)
    return frozenset(out)


def spark_canonical_sorted_rows(df) -> list:
    """Host-TZ-invariant canonical row reprs, sorted — the form the
    determinism and TZ audits hash."""
    cols = df.columns
    inst = instant_cols(df)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        repr(
            tuple(
                canon(r[cols[i]], naive_utc=cols[i] not in inst)
                for i in order
            )
        )
        for r in df.collect()
    )


def spark_result(spark, name, sf_dir):
    df = REGISTRY[name].spark_fn(spark, sf_dir)
    cols = df.columns
    rows = df.collect()
    return cols, [tuple(r[c] for c in cols) for r in rows], instant_cols(df)


def duck_result(con, name):
    cur = con.execute(REGISTRY[name].oracle)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(name, s_cols, s_rows, d_cols, d_rows, inst=frozenset()):
    problems = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} duck={len(d_rows)}")
    order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    s_set = Counter(
        tuple(canon(r[i], naive_utc=s_cols[i] not in inst) for i in order)
        for r in s_rows
    )
    d_set = Counter(
        tuple(canon(r[i], naive_utc=True) for i in d_order) for r in d_rows
    )
    if s_set != d_set:
        only_s = list((s_set - d_set).items())[:3]
        only_d = list((d_set - s_set).items())[:3]
        problems.append(f"values: only-spark={only_s} only-duck={only_d}")
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or [n for n, q in REGISTRY.items() if q.oracle]
    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{sf_dir}/{tbl}.parquet'"
        )
    failures = 0
    for name in names:
        q = REGISTRY[name]
        if not q.oracle:
            print(f"  SKIP (rows-only) {name}")
            continue
        t0 = time.time()
        try:
            s_cols, s_rows, inst = spark_result(spark, name, sf_dir)
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        try:
            d_cols, d_rows = duck_result(con, name)
        except Exception as e:
            print(f"✗ {name}: ORACLE ERROR {type(e).__name__}: {str(e).splitlines()[0][:200]}")
            failures += 1
            continue
        problems = compare(name, s_cols, s_rows, d_cols, d_rows, inst)
        dt = time.time() - t0
        if problems:
            failures += 1
            print(f"✗ {name} ({dt:.1f}s, {len(s_rows)} rows)")
            for p in problems:
                print(f"    {p}")
        else:
            print(f"✓ {name} ({dt:.1f}s, {len(s_rows)} rows)")
    print(f"\n{len(names) - failures}/{len(names)} matched")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
