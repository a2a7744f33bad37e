#!/usr/bin/env python3
"""Audit every registry query's output schema for complex-typed columns.

The external correctness driver canonicalizes results via pandas, which
cannot hash list/dict cells — any ArrayType/MapType/StructType output
column turns a value-correct query into a red row. This script builds
each registry plan (lazy — no execution) and reports offenders.

Usage: python scripts/audit_schemas.py [sf_dir] [--execute]

``--execute`` additionally runs every query at the given sf and pushes
its collected output through a pandas ``sort_values`` over all columns
— the driver canonicalizer's crash surface — catching hazards the
schema scan can't see (mixed-type object columns etc.).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql.types import ArrayType, MapType, StructType  # noqa: E402

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from mlentory_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    bad: list[tuple[str, str]] = []
    errs: list[tuple[str, str]] = []
    for name, q in sorted(REGISTRY.items()):
        try:
            df = q.spark_fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001 - report, keep auditing
            errs.append((name, f"{type(e).__name__}: {e}"))
            continue
        complex_cols = [
            f.name
            for f in df.schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if complex_cols:
            bad.append((name, ", ".join(complex_cols)))
        dupes = [c for c in set(df.columns) if df.columns.count(c) > 1]
        if dupes:
            bad.append((name, "DUPLICATE column names: " + ", ".join(dupes)))
        if "--execute" in sys.argv and not complex_cols and not dupes:
            import pandas as pd

            try:
                pdf = pd.DataFrame(
                    [tuple(r) for r in df.collect()], columns=df.columns
                )
                if len(pdf):
                    pdf.sort_values(by=list(pdf.columns))
            except Exception as e:  # noqa: BLE001
                bad.append((name, f"CANONICALIZER CRASH: {type(e).__name__}: {e}"))
    for name, cols in bad:
        print(f"COMPLEX  {name}: {cols}")
    for name, err in errs:
        print(f"ERROR    {name}: {err}")
    print(f"\n{len(REGISTRY)} queries audited, {len(bad)} with complex output columns, {len(errs)} errored")
    return 1 if (bad or errs) else 0


if __name__ == "__main__":
    sys.exit(main())
