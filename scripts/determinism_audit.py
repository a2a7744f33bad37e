#!/usr/bin/env python3
"""Partition-invariance (determinism) audit: every registry query must
produce the IDENTICAL canonical result under two deliberately different
execution regimes. The DuckDB gate proves Spark agrees with an oracle
ONCE; this proves the Spark answer is not an accident of partitioning.

Pass A runs the repo defaults (shuffle 32, 128 MB input splits); pass B
perturbs everything that changes data placement and arrival order
without changing semantics:

  - spark.sql.shuffle.partitions 32 -> 7 (different hash partitioning,
    different reducer interleaving)
  - spark.sql.files.maxPartitionBytes 128m -> 64k and openCostInBytes
    -> 0 (many tiny input splits: different scan task boundaries and
    different Arrow batch boundaries for every mapInPandas operator —
    the per-batch integer-partial schemes must be fold-order invariant)
  - spark.default.parallelism pinned differently
  - local[32] -> local[5] (different task interleaving)

Each pass runs in its OWN subprocess (fresh JVM) and writes
{query: {rows, hash}}; the parent diffs and writes
DETERMINISM_AUDIT.json. Exit nonzero on any divergence.

What a divergence means: an order-dependent fold (float sum the plan
reorders, a row_number tiebreak on a non-unique key, a first()/limit
without order) — exactly the class of bug the oracle gate can miss
when the oracle replicates the same accident.

Usage:
    python scripts/determinism_audit.py [sf_dir]          # full audit
    python scripts/determinism_audit.py [sf_dir] q1 q2..  # subset
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PASSES = {
    "A": {
        "cpus": "32",
        "shuffle": "32",
        "extra": {},
    },
    "B": {
        "cpus": "5",
        "shuffle": "7",
        "extra": {
            "spark.sql.files.maxPartitionBytes": "65536",
            "spark.sql.files.openCostInBytes": "0",
            "spark.default.parallelism": "5",
        },
    },
}


def _run_pass(which: str, sf_dir: str, names: list[str], out_path: str) -> None:
    from mlentory_etl_pipeline_spark.plans.queries import REGISTRY
    from mlentory_etl_pipeline_spark.session import get_spark

    sys.path.insert(0, os.path.join(REPO, "scripts"))
    from check_correctness import spark_canonical_sorted_rows  # noqa: E402

    cfg = PASSES[which]
    os.environ["SPARK_GRAFT_CPUS"] = cfg["cpus"]
    os.environ["SPARK_GRAFT_SHUFFLE_PARTITIONS"] = cfg["shuffle"]
    spark = get_spark(f"determinism-{which}", extra_conf=cfg["extra"])
    out: dict[str, dict] = {}
    for name in names:
        t0 = time.time()
        try:
            rows = spark_canonical_sorted_rows(
                REGISTRY[name].spark_fn(spark, sf_dir)
            )
            h = hashlib.md5("\n".join(rows).encode()).hexdigest()
            out[name] = {"rows": len(rows), "hash": h}
        except Exception as e:  # recorded, compared as error-vs-error
            out[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
        print(f"  [{which}] {name} ({time.time() - t0:.1f}s)", flush=True)
    with open(out_path, "w") as f:
        json.dump(out, f)
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 2 and sys.argv[1] == "--pass":
        _run_pass(sys.argv[2], sys.argv[3], json.loads(sys.argv[5]), sys.argv[4])
        return
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from mlentory_etl_pipeline_spark.plans.queries import REGISTRY

    names = sys.argv[2:] or list(REGISTRY)
    results = {}
    for which in ("A", "B"):
        out_path = f"/tmp/determinism_{which}.json"
        subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--pass",
                which,
                sf_dir,
                out_path,
                json.dumps(names),
            ],
            check=True,
        )
        results[which] = json.load(open(out_path))
    diverged = []
    for name in names:
        a, b = results["A"].get(name), results["B"].get(name)
        if a != b:
            diverged.append({"query": name, "A": a, "B": b})
    artifact = {
        "metric": "determinism_audit",
        "sf_dir": sf_dir,
        "audited": len(names),
        "diverged": diverged,
        "passes": {k: {"cpus": v["cpus"], "shuffle": v["shuffle"], **v["extra"]}
                   for k, v in PASSES.items()},
    }
    with open(os.path.join(REPO, "DETERMINISM_AUDIT.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: artifact[k] for k in
                      ("metric", "audited")} | {"n_diverged": len(diverged)}))
    if diverged:
        for d in diverged[:10]:
            print("DIVERGED:", d["query"], d["A"], d["B"])
        sys.exit(1)


if __name__ == "__main__":
    main()
