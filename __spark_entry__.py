"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose the full operator-coverage registry
(``mlentory_etl_pipeline_spark/plans/queries.py`` — one entry per
implemented SURVEY §2 operator plus the beyond-reference training-data
ops, each with a DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY
from mlentory_etl_pipeline_spark.plans.queries import oracle_sql as _oracle_sql
from mlentory_etl_pipeline_spark.plans.queries import queries as _queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the SCD2 versioned-store
    fold (the engine's centerpiece — V2–V5 merge over the event stream)."""
    return REGISTRY["scd2_version_ranges"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _queries()


def oracle_sql() -> dict[str, str]:
    return _oracle_sql()
