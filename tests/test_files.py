"""Tests for raw-file ingest + compaction (sources/files.py): corrupt
JSONL quarantine and small-file compaction with range-sorted output."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from mlentory_etl_pipeline_spark.sources import files as files_src


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "name": "fine"}\n'
        '{"id": "NOT_A_NUMBER", "name": "bad-type"}\n'
    )
    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    df = files_src.read_jsonl(spark, str(p), schema)
    good, bad = files_src.quarantine(df)
    assert sorted(r.id for r in good.collect()) == [1, 2]
    bad_lines = [r[files_src.CORRUPT_COL] for r in bad.collect()]
    assert len(bad_lines) == 2
    assert "this is not json at all" in bad_lines[0] or "this is not json at all" in bad_lines[1]


def test_compact_small_files(spark, tmp_path):
    src, dest = str(tmp_path / "src"), str(tmp_path / "dest")
    # 40 tiny files of 25 rows each.
    spark.range(0, 1000).withColumn("k", F.col("id") % 7).repartition(40).write.parquet(src)
    n_files = files_src.compact(spark, src, dest, "id", target_rows_per_file=250)
    assert n_files == 4
    written = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert len(written) == 4
    out = spark.read.parquet(dest)
    assert out.count() == 1000
    # Range partitioning: per-file id ranges must not overlap (zone-map
    # friendliness) — check via min/max per input_file_name.
    stats = (
        out.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in stats)
    for (_, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 < lo2


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    dest = str(tmp_path / "zorder")
    # Two independent uniform dimensions.
    df = (
        spark.range(0, 4096)
        .withColumn("a", (F.col("id") * 48271) % 4096)
        .withColumn("b", (F.col("id") * 16807) % 4096)
    )
    files_src.zorder_write(spark, df, dest, "a", "b", n_files=16)
    out = spark.read.parquet(dest)
    assert out.count() == 4096

    stats = (
        out.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("a").alias("a_lo"), F.max("a").alias("a_hi"),
            F.min("b").alias("b_lo"), F.max("b").alias("b_hi"),
        )
        .collect()
    )
    assert len(stats) == 16

    def files_overlapping(lo_col, hi_col, lo, hi):
        return sum(1 for r in stats if not (r[hi_col] < lo or r[lo_col] > hi))

    # A 1/8-range predicate on EITHER dimension must skip at least half
    # the files via footer min/max — the property a single-column sort
    # gives only to its own column.
    assert files_overlapping("a_lo", "a_hi", 0, 511) <= 8
    assert files_overlapping("b_lo", "b_hi", 0, 511) <= 8
