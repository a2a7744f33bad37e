"""Lineage capping for iterative folds.

:func:`lazy_cap` is the shared stage-boundary cap for fixed-iteration
folds (ALS, EM, pagerank, Lloyd-style rounds, funnel stages): a lazy
``localCheckpoint`` that truncates the logical plan so fold plans stay
O(1) per round — but planned with AQE and auto-broadcast OFF (restored
immediately after), because an adaptive plan's ``toRdd`` — and any
broadcast exchange's ``doExecute`` — materializes its query stages
EAGERLY. A plain ``.localCheckpoint(eager=False)`` therefore *executes
the fold's shuffles at constructor time*, one driver-coordinated mini
job per cap (guide §5 "the driver should do almost no data work"):
r11 measured the rank-1 ALS fold at 6.6 s with plain lazy caps (9 ×
~0.64 s of eager stage materialization inside ``localCheckpoint``)
vs 5.4-5.6 s with job-free caps, identical output — and constructors
go back to running zero jobs, the registry contract.

The trade (documented since r10 on curation's funnel, now shared):
joins INSIDE a capped segment are planned without AQE/broadcast, so a
small side that would have broadcast runs as a shuffle join. For the
iterative folds this guards, the segment bodies are agg→rejoin rounds
keyed on the fold key — already shuffle-bound — and the outer query
plan (planned under normal conf) keeps AQE and broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_CAP_KEYS = (
    "spark.sql.adaptive.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
)


def lazy_cap(df: DataFrame) -> DataFrame:
    """Truncate ``df``'s lineage with a lazy localCheckpoint WITHOUT
    running any job at plan-build time (see module docstring)."""
    sp = df.sparkSession
    saved = [(k, sp.conf.get(k)) for k in _CAP_KEYS]
    sp.conf.set(_CAP_KEYS[0], "false")
    sp.conf.set(_CAP_KEYS[1], "-1")
    try:
        return df.localCheckpoint(eager=False)
    finally:
        for k, v in saved:
            sp.conf.set(k, v)
