#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "headline_total", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is materialized via count() (results stay distributed — no
driver collect of large outputs). A warmup run of the smallest query
absorbs JVM/codegen startup so per-query numbers reflect steady state.
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
    # Warmup: JVM + codegen + parquet footer caches.
    REGISTRY["q5_region_rollup"].spark_fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        df.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
