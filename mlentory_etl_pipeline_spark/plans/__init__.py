from mlentory_etl_pipeline_spark.plans.queries import REGISTRY, Query, oracle_sql, queries

__all__ = ["REGISTRY", "Query", "oracle_sql", "queries"]
