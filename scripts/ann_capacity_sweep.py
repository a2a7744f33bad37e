"""Empirical sweep for the scale-aware ANN capacity rule (VERDICT r8 №1).

Measures recall@5 vs brute force for trained IVF / flat PQ / IVF-PQ at
sf0.01 (N=500) and sf0.1 (N=2000) under candidate (nlist, nprobe, ksub,
shortlist) rules, to pick the written rule that clears 0.85 everywhere.
Run: python scripts/ann_capacity_sweep.py
"""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, "/root/repo")
from mlentory_etl_pipeline_spark.operators import similarity  # noqa: E402


# the shipped rule — measure IT, don't fork it (edit similarity.ann_capacity
# to experiment with an alternative rule)
capacity = similarity.ann_capacity


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for sf in ["sf0.01", "sf0.1"]:
        e = spark.read.parquet(f"/root/testdata/{sf}/embeddings.parquet")
        n = e.count()
        cap = capacity(n)
        print(f"{sf}: N={n} cap={cap}", flush=True)
        q = e.where("vec_id < 10").select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
        )
        t0 = time.time()
        brute = (
            similarity.brute_force_topk(e, q, k=5)
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=False)
        )
        n_exact = brute.count()
        cents = similarity.trained_centroids(e, n_centroids=cap["nlist"], iters=3)
        ivf = similarity.ivf_topk(
            e, q, nprobe=cap["nprobe"], k=5, centroids=cents
        ).select("query_id", "neighbor_id")
        cb = similarity.train_pq_codebook(e, m=16, ksub=cap["ksub"], iters=3)
        pq = similarity.pq_adc_topk(
            e, q, m=16, ksub=cap["ksub"], shortlist=cap["shortlist"], k=5, codebook=cb
        ).select("query_id", "neighbor_id")
        ivfpq = similarity.ivf_pq_topk(
            e, q, nprobe=cap["nprobe"], m=4, ksub=cap["ksub"],
            shortlist=cap["shortlist"], k=5, centroids=cents,
        ).select("query_id", "neighbor_id")

        def recall(approx):
            return brute.join(approx, ["query_id", "neighbor_id"]).count() / n_exact

        res = {
            "N": n,
            "cap": cap,
            "ivf": recall(ivf),
            "pq": recall(pq),
            "ivfpq": recall(ivfpq),
            "sec": round(time.time() - t0, 1),
        }
        print(f"  -> {res}", flush=True)
        out[sf] = res
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
