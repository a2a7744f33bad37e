#!/usr/bin/env python3
"""Mechanized plan audit: the plan-shape review the round logs do by
hand, run over EVERY registered query and written to PLAN_AUDIT.json.

For each registry entry, build the DataFrame at the audit scale factor
(default sf0.001 — some queries execute jobs while *building*:
streaming drains, SCD2 localCheckpoints, quantizer training; the tiny
SF keeps those cheap) and inspect the executed plan string for the
load-bearing shape properties:

- ``exchanges``       — number of shuffle/broadcast Exchange nodes
- ``cartesian``       — CartesianProduct present (ALWAYS a failure)
- ``bnlj``            — BroadcastNestedLoopJoin count (legitimate only
                        for 1-row/bounded broadcast sides; reported so
                        a reviewer can spot-check new ones)
- ``global_windows``  — window specs whose FIRST argument is an order
                        expression (partition-less: the whole input
                        funnels through one task). Failure unless the
                        query is in GLOBAL_WINDOW_ALLOWED with a
                        documented bound.

Usage:
    python scripts/plan_audit.py [sf_dir] [name ...]

Exit nonzero on any cartesian product or unallowlisted global window.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mlentory_etl_pipeline_spark.plans.queries import REGISTRY  # noqa: E402
from mlentory_etl_pipeline_spark.session import get_spark  # noqa: E402

# Queries whose plan legitimately contains a partition-less window,
# each with the reason its input is BOUNDED (never corpus-sized).
# Spark 4's EliminateWindowPartitions strips foldable partition keys,
# so even deliberate partitionBy(lit(0)) bounded windows land here.
GLOBAL_WINDOW_ALLOWED: dict[str, str] = {
    "bootstrap_ci_avg_quantity": "ranks the B=64 replica means",
    "token_budget_waterfill_sources": (
        "rank/prefix-sum windows over ONE ROW PER DOMAIN "
        "(|sources| rows - metadata; the only corpus pass is the "
        "per-domain token sum aggregation)"
    ),
    "greedy_set_cover_docs": (
        "cumulative-coverage window over ONE ROW PER PICK (k=8 rows "
        "- the selection result, never corpus-sized)"
    ),
    "neyman_allocation_event_types": (
        "largest-remainder ranking over ONE ROW PER STRATUM "
        "(|event types| rows - metadata; the only corpus pass is the "
        "per-stratum moment aggregation)"
    ),
    "monroe_log_odds_sources": (
        "two ranking windows over ONE ROW PER DISTINCT TERM - "
        "vocab-bounded (the weighted_percentiles category), never "
        "corpus-bounded; token counts are map-side combined first"
    ),
    "wasserstein_value_drift_halves": (
        "gap-lead window over ONE ROW PER DISTINCT CENT VALUE - "
        "value-DOMAIN-bounded (range x scale rows, the "
        "weighted_percentiles category), never corpus-bounded"
    ),
    "qini_uplift_user_targeting": (
        "cumulative window over ONE ROW PER DECILE (10 rows - "
        "metadata, the best_split category)"
    ),
    "msprt_daily_value_monitor": (
        "cumulative + running-min windows over the global DAILY "
        "series - calendar-bounded (the moving_avg_daily_revenue "
        "category)"
    ),
    "bh_fdr_nation_fulfilled": (
        "BH step-up rank over ONE ROW PER TEST (25 nations - "
        "metadata-sized, the bootstrap-replica category)"
    ),
    "skew_join_key_profile": "rank over the <=top_k TakeOrdered survivors",
    "search_term_relevance": "rank over the <=k TakeOrdered survivors",
    "bm25_document_rank": "rank over the <=k TakeOrdered survivors",
    "zipf_slope_corpus": "rank over the <=top_n TakeOrdered survivors",
    "kaplan_meier_churn": (
        "lifetable cumulative windows over |distinct churn days| rows "
        "(observation-span-bounded, not corpus-bounded)"
    ),
    "moving_avg_daily_revenue": "global DAILY series - calendar-bounded",
    "ccf_views_purchases": (
        "lead windows over the global DAILY series - calendar-bounded "
        "(|days| rows, the moving_avg_daily_revenue category)"
    ),
    "bollinger_daily_revenue": (
        "trailing-frame windows over the global DAILY series - "
        "calendar-bounded (the moving_avg_daily_revenue category)"
    ),
    "best_split_value_purchase": (
        "cumulative window over ONE ROW PER BIN of the <=32-bin "
        "candidate grid (metadata, never corpus)"
    ),
    "skyline_parts_price_size": (
        "running min over ONE ROW PER LEVEL of the bounded size "
        "domain (|distinct sizes| rows - metadata, never corpus)"
    ),
    "sorted_neighborhood_link": (
        "the method IS one global sort + fixed-rank-window pairing "
        "(documented trade vs blocked_link; candidate count exactly "
        "N*(w-1)/2 regardless of skew)"
    ),
    "connector_arxiv_batching": "row_number over the fetch-request ID list",
    "hybrid_rrf_search": (
        "two bounded ranks: quality prior over <=20 TakeOrdered "
        "survivors, fusion over <=40 already-top-20 candidates"
    ),
    "range_partition_plan": (
        "ntile over a 1/mod sampled subset - the RangePartitioner "
        "sampling approach; sample size is the knob"
    ),
}


def audit_one(spark, name: str, sf_dir: str) -> dict:
    t0 = time.perf_counter()
    try:
        df = REGISTRY[name].spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception as e:  # noqa: BLE001 - record, don't abort the sweep
        return {"error": f"{type(e).__name__}: {e}"[:200],
                "build_secs": round(time.perf_counter() - t0, 2)}
    specs = re.findall(r"windowspecdefinition\(([^,)]+)[,)]", plan)
    global_windows = sum(
        1 for first in specs if " ASC" in first or " DESC" in first
    )
    return {
        "exchanges": plan.count("Exchange"),
        "cartesian": "CartesianProduct" in plan,
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "window_specs": len(specs),
        "global_windows": global_windows,
        "build_secs": round(time.perf_counter() - t0, 2),
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    names = [a for a in args if not os.path.isdir(a)] or list(REGISTRY)
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out, bad = {}, []
    for name in names:
        r = audit_one(spark, name, sf_dir)
        out[name] = r
        flag = ""
        if r.get("cartesian"):
            bad.append(f"{name}: CartesianProduct")
            flag = "  <-- CARTESIAN"
        if r.get("global_windows") and name not in GLOBAL_WINDOW_ALLOWED:
            bad.append(f"{name}: {r['global_windows']} global window(s)")
            flag += "  <-- GLOBAL WINDOW"
        if "error" in r:
            flag = f"  build error: {r['error'][:80]}"
        print(f"  {name}: ex={r.get('exchanges', '-')} "
              f"bnlj={r.get('bnlj', '-')} gw={r.get('global_windows', '-')}"
              f"{flag}", flush=True)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLAN_AUDIT.json",
    )
    # Merge into the standing artifact: a single-query re-audit must
    # refresh that query's row, not clobber the fleet-wide evidence
    # (round-5 ADVICE: the 360-plan audit was overwritten by a 1-query
    # run). Dropped registry entries are pruned so the summary stays
    # honest.
    merged = dict(out)
    if os.path.exists(path):
        try:
            with open(path) as f:
                prior = json.load(f).get("queries", {})
            for n, r in prior.items():
                if n in REGISTRY and n not in merged:
                    merged[n] = r
        except (json.JSONDecodeError, OSError):
            pass
    summary = {
        "audited": len(merged),
        "errors": sum(1 for r in merged.values() if "error" in r),
        "cartesians": sum(1 for r in merged.values() if r.get("cartesian")),
        "global_windows": sum(
            1 for n, r in merged.items()
            if r.get("global_windows") and n not in GLOBAL_WINDOW_ALLOWED
        ),
        "bnlj_queries": sorted(n for n, r in merged.items() if r.get("bnlj")),
    }
    with open(path, "w") as f:
        json.dump({"summary": summary, "queries": merged}, f, indent=1)
    print(json.dumps({"metric": "plan_audit", **summary}))
    spark.stop()
    if bad:
        print("FAILURES:\n  " + "\n  ".join(bad))
        sys.exit(1)


if __name__ == "__main__":
    main()
