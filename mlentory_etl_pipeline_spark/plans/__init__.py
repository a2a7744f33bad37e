"""Query-plan layer. Import the registry via the submodule
(``from mlentory_etl_pipeline_spark.plans.queries import REGISTRY``) —
re-exporting the ``queries()`` function here would shadow the
``plans.queries`` submodule attribute and break module-style imports.
"""

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY, Query

__all__ = ["REGISTRY", "Query"]
