"""Error-bound and algebraic-property tests for the mergeable sketches
(operators/sketches.py): HLL estimates vs exact distinct counts, CMS
over-estimate sandwich, and CMS linearity (sketch of union == cell-wise
sum of sketches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import sketches

SF = "/root/testdata/sf0.01"


def test_hll_partitioned_within_error_bound(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    est = {
        r.event_type: r.est_distinct
        for r in sketches.hll_partitioned_distinct(e, "event_type", "user_id").collect()
    }
    exact = {
        r.event_type: r.n
        for r in e.groupBy("event_type").agg(F.count_distinct("user_id").alias("n")).collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        # lg_k=12 → relative standard error ~1.6%; 5% is >3 sigma
        assert abs(est[k] - n) <= max(2, 0.05 * n), (k, est[k], n)


def _skewed_tokens(spark):
    # zipf-ish: token_i appears (200 // (i+1)) times
    rows = [(f"tok{i}",) for i in range(50) for _ in range(200 // (i + 1))]
    return spark.createDataFrame(rows, "token string")


def test_cms_overestimates_and_bounds(spark):
    toks = _skewed_tokens(spark)
    n_total = toks.count()
    depth, width = 4, 2048
    sk = sketches.cms_build(toks, "token", depth, width)
    est = {
        r.token: r.est_count
        for r in sketches.cms_estimate(sk, toks.distinct(), "token", depth, width).collect()
    }
    true = {r.token: r.n for r in toks.groupBy("token").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, n in true.items():
        assert est[k] >= n, (k, est[k], n)  # CMS never undercounts
        assert est[k] - n <= 10 * n_total / width, (k, est[k], n)
    # heavy hitters survive estimation: exact top-5 == CMS top-5
    top_true = sorted(true, key=lambda k: (-true[k], k))[:5]
    top_est = sorted(est, key=lambda k: (-est[k], k))[:5]
    assert top_true == top_est


def test_cms_merge_is_linear(spark):
    toks = _skewed_tokens(spark).withColumn(
        "half", F.pmod(F.xxhash64("token"), F.lit(2))
    )
    a = sketches.cms_build(toks.where("half = 0"), "token")
    b = sketches.cms_build(toks.where("half = 1"), "token")
    merged = {(r.h, r.b): r.cnt for r in sketches.cms_merge(a, b).collect()}
    full = {(r.h, r.b): r.cnt for r in sketches.cms_build(toks, "token").collect()}
    assert merged == full


def test_cms_probe_of_unseen_key_is_bounded(spark):
    toks = _skewed_tokens(spark)
    sk = sketches.cms_build(toks, "token")
    probes = spark.createDataFrame([("never-seen",)], "token string")
    [row] = sketches.cms_estimate(sk, probes, "token").collect()
    # unseen keys can collide into occupied cells but stay ≤ εN-ish
    assert 0 <= row.est_count <= 10 * toks.count() / 2048
