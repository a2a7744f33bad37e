"""Bucketed-table layout for shuffle-free co-located joins.

The 100 TB join discipline (SURVEY §4 / SCALE.md): fact-to-fact joins
that repeat on the same key — triplet_hash in the SCD2 store, subject
in the graph tables, doc_id in dedup pipelines — should not pay a
shuffle per query. Writing both sides bucketed by the join key with the
same bucket count pins rows to buckets by ``hash(key) % n``; Spark's
scan then reports a ``HashPartitioning`` output and the join planner
drops both Exchanges (asserted in ``tests/test_operators.py``).

This is plain open-source Spark bucketing (``DataFrameWriter.bucketBy``
+ ``saveAsTable``); the trade is a one-time shuffle at write for zero
shuffles on every subsequent join/aggregation keyed by the bucket
column. Sort-by within buckets additionally removes the join's sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key: str,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table."""
    w = df.write.mode("overwrite").option("path", path).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str):
    """Join two same-bucketed tables on their bucket key — planner
    output contains no shuffle Exchange (both sides pre-partitioned)."""
    return spark.table(left_table).join(spark.table(right_table), key)
