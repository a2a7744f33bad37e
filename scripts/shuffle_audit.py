#!/usr/bin/env python3
"""Shuffle audit: MEASURED shuffle volume per query, not guessed.

Plan-shape checks (plan_audit.py) prove a query has no cartesian or
global window; they cannot see how many BYTES actually cross an
exchange. This harness executes each audited query and walks the
FINAL adaptive physical plan (through QueryStage wrappers), summing
per-Exchange `shuffleBytesWritten` / `shuffleRecordsWritten` /
`dataSize` and per-operator `spillSize` from the SQL metrics — the
same numbers the Spark UI shows.

Why it matters at 100 TB: shuffle volume is THE scale-out cost model —
a query whose shuffle bytes are O(groups) survives a 1000× scale-up; a
query shuffling O(rows) pays the network for the whole table every
run. The audit records both absolutes and the rows→records funnel so
regressions (a lost map-side combine, a broadcast that silently became
a shuffle join) show up as a NUMBER diff in SHUFFLE_AUDIT.json.

Spill invariant: at the audit scale every operator fits in memory —
any nonzero spillSize is a sizing bug; the script exits nonzero.

Usage: python scripts/shuffle_audit.py [--sf DIR] [--only a,b,c]
Audits the bench headline set by default.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY
from mlentory_etl_pipeline_spark.session import get_spark

SHUFFLE_KEYS = ("shuffleBytesWritten", "shuffleRecordsWritten", "dataSize")


def _children(node):
    out = []
    for i in range(node.children().size()):
        out.append(node.children().apply(i))
    # descend through AQE wrappers: AdaptiveSparkPlanExec.executedPlan,
    # QueryStageExec.plan, unary wrappers exposing child()
    for meth in ("plan", "executedPlan"):
        try:
            child = getattr(node, meth)()
            if child is not None and hasattr(child, "nodeName"):
                out.append(child)
        except Exception:
            pass
    return out


def plan_metrics(jdf) -> dict:
    """Sum exchange + spill metrics over the executed plan, deduping
    nodes by their SparkPlan id (wrapper descent can revisit)."""
    totals = {
        "n_exchanges": 0,
        "shuffle_bytes": 0,
        "shuffle_records": 0,
        "exchange_data_size": 0,
        "max_exchange_bytes": 0,
        "n_broadcasts": 0,
        "broadcast_bytes": 0,
        "spill_bytes": 0,
    }
    seen: set[int] = set()
    stack = [jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        nid = int(node.id())
        if nid in seen:
            continue
        seen.add(nid)
        mets = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            mets[kv._1()] = kv._2().value()
        if node.nodeName() == "Exchange":
            totals["n_exchanges"] += 1
            totals["shuffle_bytes"] += int(mets.get("shuffleBytesWritten", 0))
            totals["shuffle_records"] += int(
                mets.get("shuffleRecordsWritten", 0)
            )
            totals["exchange_data_size"] += int(mets.get("dataSize", 0))
            totals["max_exchange_bytes"] = max(
                totals["max_exchange_bytes"],
                int(mets.get("shuffleBytesWritten", 0)),
            )
        elif node.nodeName() == "BroadcastExchange":
            totals["n_broadcasts"] += 1
            totals["broadcast_bytes"] += int(mets.get("dataSize", 0))
        totals["spill_bytes"] += int(mets.get("spillSize", 0))
        stack.extend(_children(node))
    return totals


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", help="comma-separated query names")
    args = ap.parse_args()

    names = (
        args.only.split(",")
        if args.only
        else [n for n, q in REGISTRY.items() if q.headline]
    )
    spark = get_spark("mlentory-shuffle-audit")
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, dict] = {}
    spilled = []
    for name in names:
        df = REGISTRY[name].spark_fn(spark, args.sf)
        t0 = time.perf_counter()
        # run the df's OWN query execution (df.count() would plan a
        # separate execution and leave these metrics empty)
        n_out = df._jdf.queryExecution().toRdd().count()
        secs = round(time.perf_counter() - t0, 3)
        m = plan_metrics(df._jdf)
        m.update({"rows_out": n_out, "secs": secs})
        queries[name] = m
        if m["spill_bytes"]:
            spilled.append(name)
        print(
            f"  {name}: {m['n_exchanges']} exchanges, "
            f"{m['shuffle_records']} records / {m['shuffle_bytes']} B "
            f"shuffled (max single {m['max_exchange_bytes']} B), "
            f"{m['n_broadcasts']} broadcasts / {m['broadcast_bytes']} B, "
            f"spill {m['spill_bytes']} B",
            file=sys.stderr,
        )

    result = {
        "metric": "shuffle_audit",
        "sf": args.sf,
        "audited": len(queries),
        "spilled": spilled,
        "total_shuffle_bytes": sum(
            q["shuffle_bytes"] for q in queries.values()
        ),
        "queries": queries,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SHUFFLE_AUDIT.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "queries"}))
    spark.stop()
    sys.exit(1 if spilled else 0)


if __name__ == "__main__":
    main()
