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
