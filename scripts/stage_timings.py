#!/usr/bin/env python3
"""Per-stage timing attribution for one query (VERDICT r7 №3).

The driver box has twice reported `scd2_version_ranges` slower than a
same-code local run while every other signal stayed flat. Plan-level
wall time cannot attribute that: this script executes the query and
walks the FINAL adaptive physical plan (the shuffle_audit traversal),
recording the per-NODE timing SQL metrics Spark already collects —
exchange shuffle-write time, fetch-wait time, broadcast build/collect
time, hash-aggregate/sort/join op time, scan time — so a driver-vs-
local divergence becomes attributable to a stage class (e.g. "all the
extra time is fetchWaitTime → co-tenant network/disk contention" vs
"op time grew → a real plan regression").

The result lands in BENCH_DETAIL.json under `stage_timings.<query>`
(merged, not overwritten, so the builder-local and any driver-side run
can coexist the way `local_warm` does). All times are milliseconds
summed across tasks; `wall_sec` is the end-to-end count() time.

Usage: python scripts/stage_timings.py [--sf DIR] [--only a,b,c]
Defaults to scd2_version_ranges at $SPARK_GRAFT_SF_DIR (sf0.1 — the
bench scale, where the watch item lives).
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
from shuffle_audit import _children  # same AQE-aware traversal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# metric keys that are nanosecond/millisecond timers in Spark's SQL
# metrics (timing-typed metrics report milliseconds via .value())
TIMING_SUBSTRINGS = ("time", "Time", "duration", "Duration")


def stage_timings(jdf) -> tuple[list[dict], list[str]]:
    """One entry per physical node carrying any timing metric, plus the
    names of timing metrics that failed to parse (ADVICE r8: silently
    dropped metrics made attribution gaps invisible — now they land in
    the artifact as ``dropped_metrics``)."""
    rows: list[dict] = []
    dropped: list[str] = []
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
            name = kv._1()
            if any(s in name for s in TIMING_SUBSTRINGS):
                try:
                    mets[name] = int(kv._2().value())
                except Exception:
                    dropped.append(f"{node.nodeName()}:{name}")
        if mets:
            # shuffleWriteTime is the one nsTiming metric here
            # (SQLMetrics.createNanoTimingMetric) — normalize to ms
            if "shuffleWriteTime" in mets:
                mets["shuffleWriteTime"] = mets["shuffleWriteTime"] // 1_000_000
            rows.append({"node": node.nodeName(), "id": nid, "ms": mets})
        stack.extend(_children(node))
    return rows, dropped


def classify(rows: list[dict]) -> dict:
    """Roll per-node timers into the attribution buckets. fetch-wait
    only counts on shuffle-read-carrying nodes (ADVICE r8: a metric
    whose NAME matches 'fetch'+'wait' on a non-shuffle node would have
    misattributed co-tenant I/O — those land in other_ms instead).
    operator_ms remains the catch-all for every other op-node timer by
    design (enumerating Spark's operator node names would rot); the
    visibility guarantees are other_ms for displaced fetch-wait and
    the per-node `nodes` list + `dropped_metrics` in the artifact,
    which let a reader re-bucket by hand when a new node class shows
    up."""
    buckets = {"exchange_write_ms": 0, "fetch_wait_ms": 0,
               "broadcast_ms": 0, "operator_ms": 0, "scan_ms": 0,
               "other_ms": 0}
    shuffle_read_nodes = ("Exchange", "AQEShuffleRead", "ShuffleQueryStage",
                          "CustomShuffleReader")
    for r in rows:
        node = r["node"]
        for k, v in r["ms"].items():
            lk = k.lower()
            if "fetch" in lk and "wait" in lk:
                if node in shuffle_read_nodes or "shuffle" in node.lower():
                    buckets["fetch_wait_ms"] += v
                else:
                    buckets["other_ms"] += v
            elif node == "Exchange" or "shuffle write" in lk:
                buckets["exchange_write_ms"] += v
            elif node == "BroadcastExchange" or "broadcast" in lk:
                buckets["broadcast_ms"] += v
            elif "scan" in lk or node.startswith("Scan"):
                buckets["scan_ms"] += v
            else:
                buckets["operator_ms"] += v
    return buckets


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    # default = the top-4 cost centers (VERDICT r8 №6 + r9 №6): the
    # SCD2 headliner, the two other expensive headline queries, and
    # ann_ivf_topk — the 4th cost center (trending up r8→r9), whose
    # quantizer-training stage is driver-coordinated, so per-node
    # attribution separates training cost from probe cost.
    ap.add_argument(
        "--only",
        default="scd2_version_ranges,streaming_stateful_sessions,"
                "dedup_minhash_lsh,ann_ivf_topk",
    )
    args = ap.parse_args()

    spark = get_spark("mlentory-stage-timings")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for name in args.only.split(","):
        # warm: second run, same methodology as bench.py. Execute the
        # df's OWN query execution — df.count() plans a separate
        # execution and leaves these metrics empty (shuffle_audit.py
        # pattern).
        REGISTRY[name].spark_fn(spark, args.sf)._jdf.queryExecution().toRdd().count()
        df = REGISTRY[name].spark_fn(spark, args.sf)
        t0 = time.perf_counter()
        df._jdf.queryExecution().toRdd().count()
        wall = round(time.perf_counter() - t0, 3)
        rows, dropped = stage_timings(df._jdf)
        out[name] = {
            "wall_sec": wall,
            "sf_dir": args.sf,
            "buckets": classify(rows),
            "dropped_metrics": dropped,
            "nodes": rows,
        }
        print(json.dumps({"query": name, "wall_sec": wall,
                          "buckets": out[name]["buckets"]}))

    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    try:
        with open(detail_path) as f:
            detail = json.load(f)
    except (OSError, ValueError):
        detail = {}
    detail.setdefault("stage_timings", {}).update(out)
    with open(detail_path, "w") as f:
        json.dump(detail, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
