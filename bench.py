#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1,
     "cold_queries": {...}, "cold_total": N}

Methodology: each query is executed twice and the SECOND run is the
reported number; the first-run times are kept under ``cold_queries``
for transparency. The first execution of a plan shape in a fresh JVM
is dominated by one-time costs that amortize to zero on any long-lived
cluster (C2 JIT of interpreted HOF eval paths, codegen compilation,
parquet footer caching) — measured 5.1 s cold vs 0.4 s steady for the
minhash pipeline on identical data. Steady-state is the number that
predicts 100 TB throughput; cold total is the number that predicts a
one-off local run.

Each query is materialized via count() (results stay distributed — no
driver collect of large outputs).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY
from mlentory_etl_pipeline_spark.session import get_spark


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("mlentory-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n, q in REGISTRY.items() if q.headline]

    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        REGISTRY[name].spark_fn(spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
    for name in names:
        t0 = time.perf_counter()
        REGISTRY[name].spark_fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cold_queries": cold,
                "cold_total": round(sum(cold.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
