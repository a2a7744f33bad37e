"""Parquet source layer for the driver's synthetic tables (TESTDATA.md).

Equivalent of the reference's bulk snapshot scan S1
(``HFDatasetManager.py:201-212``): a plain ``spark.read.parquet`` so
Catalyst gets predicate pushdown + column pruning for free. At 100 TB
the same call reads a partitioned lake path; nothing here changes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for ``spark.sql`` access."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
