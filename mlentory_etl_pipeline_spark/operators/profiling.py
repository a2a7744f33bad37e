"""Data-profiling operators: skew diagnostics and column statistics.

The engine-side tooling for operating joins and layouts at 100 TB:
``heavy_hitters`` tells you WHICH keys need salting/AQE-skew handling
before a join melts one task; ``profile_columns`` is the ANALYZE TABLE
surface (null fractions, cardinalities, ranges) that drives layout
choices (partition column selection, dictionary-encoding wins, zone-map
usefulness).

Scale posture:

- heavy_hitters: one map-side-combined count per key + a bounded
  global top-k (``TakeOrderedAndProject`` — never a full sort); the
  total row count rides along as a 1-row broadcast, no driver
  round-trip.
- profile_columns: ONE aggregation pass computes every column's stats
  as a wide row (map-side partial aggs), then an unpivot projects it
  long — C columns cost one shuffle, not C. Exact distinct counts keep
  the oracle checkable; pass ``approx=True`` to swap in HLL++
  (`approx_count_distinct`) at corpus scale where exact per-column
  distinct would shuffle the world.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(df: DataFrame, key_cols: list[str], k: int = 10) -> DataFrame:
    """Top-``k`` hottest key values with absolute and relative
    frequency. Returns (key..., n, frac) ordered by n desc (ties:
    key asc)."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("n"))
    total = df.groupBy().agg(F.count("*").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            *key_cols,
            "n",
            F.round(F.col("n") / F.col("_total").cast("double"), 6).alias("frac"),
        )
        .orderBy(F.desc("n"), *[F.asc(c) for c in key_cols])
        .limit(k)
    )


def profile_columns(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Per-column stats in long form: (column, n_nulls, n_distinct,
    min_value, max_value) with min/max rendered as strings for a
    uniform schema. One aggregation pass for all columns."""
    aggs = []
    for c in cols:
        distinct = (
            F.approx_count_distinct(c) if approx else F.count_distinct(F.col(c))
        )
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_nn_{c}"),
            distinct.alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"_nn_{c}"),
            F.col(f"_nd_{c}"),
            F.col(f"_mn_{c}"),
            F.col(f"_mx_{c}"),
        ]
    return wide.select(
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_nulls", "n_distinct", "min_value", "max_value")
    )
