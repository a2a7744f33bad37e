"""Parquet source layer for the driver's synthetic tables (TESTDATA.md).

Equivalent of the reference's bulk snapshot scan S1
(``HFDatasetManager.py:201-212``): a plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown + column pruning for free. At 100 TB
the same call reads a partitioned lake path; nothing here changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# Columns stored as parquet TIMESTAMP(NANOS): Spark reads them as long
# (see session.py nanosAsLong); normalize to micros TimestampType here so
# every downstream plan sees a proper timestamp (same truncation DuckDB
# applies when reading nanos).
_NANOS_TS_COLS = {"events": ("ts",)}

# Unmaterialized-DataFrame memo, keyed by (applicationId, sf_dir, name).
# ``spark.read.parquet`` pays ~75-115 ms of driver work PER CALL (file
# listing + footer schema inference + Py4J), and a bench/gate session
# re-reads the same immutable fixture tables hundreds of times. The memo
# returns the SAME lazy DataFrame (identical logical plan — a plain
# parquet relation), so every action still scans parquet from disk:
# this caches plan *metadata*, never results. Keyed by applicationId so
# a stopped-and-recreated session can never see a stale JVM handle.
_DF_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir), name)
    except Exception:
        key = None
    if key is not None:
        memo = _DF_MEMO.get(key)
        if memo is not None:
            return memo
    try:
        # Required to scan TIMESTAMP(NANOS) parquet columns; set here too
        # so externally-created sessions (e.g. the driver's) work.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, ()):
        if col in df.columns and isinstance(df.schema[col].dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    if key is not None:
        if len(_DF_MEMO) > 512:  # dead-session entries; bound the dict
            _DF_MEMO.clear()
        _DF_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` access."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
