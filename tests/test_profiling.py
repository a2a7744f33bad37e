"""Tests for the profiling operators (operators/profiling.py): heavy-
hitter skew diagnostics and the single-pass column profiler, including
null handling the all-non-null registry tables can't reach."""

from __future__ import annotations

from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import profiling


def test_heavy_hitters_finds_skew(spark):
    rows = [(1, "hot")] * 90 + [(i, "cold%d" % i) for i in range(2, 12)]
    df = spark.createDataFrame(rows, "k long, v string")
    top = profiling.heavy_hitters(df, ["k"], k=3).collect()
    assert top[0].k == 1 and top[0].n == 90
    assert abs(top[0].frac - 0.9) < 1e-9
    assert len(top) == 3 and top[1].n == 1


def test_heavy_hitters_bounded_topk_plan(spark):
    df = spark.range(0, 1000).withColumn("k", F.col("id") % 7)
    plan = profiling.heavy_hitters(df, ["k"], k=5)._jdf.queryExecution().executedPlan().toString()
    # global top-k must be TakeOrdered, never a full sort of all keys
    assert "TakeOrderedAndProject" in plan


def test_profile_columns_nulls_and_distinct(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b"), (None, "a"), (None, None)],
        "x int, s string",
    )
    stats = {r.column: r for r in profiling.profile_columns(df, ["x", "s"]).collect()}
    assert stats["x"].n_nulls == 2 and stats["x"].n_distinct == 3
    assert stats["x"].min_value == "1" and stats["x"].max_value == "3"
    assert stats["s"].n_nulls == 2 and stats["s"].n_distinct == 2
    assert stats["s"].min_value == "a" and stats["s"].max_value == "b"


def test_profile_columns_approx_mode(spark):
    df = spark.range(0, 5000).withColumn("s", F.col("id").cast("string"))
    stats = {r.column: r for r in profiling.profile_columns(df, ["id", "s"], approx=True).collect()}
    # HLL++ default rsd 5% — sanity band, not exactness
    assert abs(stats["id"].n_distinct - 5000) / 5000 < 0.10


# ---------------------------------------------------------------------
# Misra-Gries two-pass frequent items
# ---------------------------------------------------------------------

def test_frequent_items_partition_invariant(spark):
    from mlentory_etl_pipeline_spark.operators.profiling import frequent_items

    data = [(f"k{i % 23}",) for i in range(2000)] + [("hot",)] * 900
    df = spark.createDataFrame(data, "k string")
    outs = [
        frequent_items(df.repartition(p), "k", support=0.05).collect()
        for p in (1, 4, 17)
    ]
    assert outs[0] == outs[1] == outs[2]
    assert outs[0][0].k == "hot" and outs[0][0].n == 900


def test_mg_candidates_superset_guarantee_under_tiny_budget(spark):
    from mlentory_etl_pipeline_spark.operators.profiling import (
        frequent_items,
        mg_candidates,
    )

    # skewed: 3 hot keys + long tail; budget far below cardinality
    data = (
        [("a",)] * 400 + [("b",)] * 300 + [("c",)] * 200
        + [(f"t{i}",) for i in range(500)]
    )
    df = spark.createDataFrame(data, "k string").repartition(9)
    support = 0.1  # true frequent set: a, b (c = 200/1400 = 0.143 ≥ 0.1 too)
    budget = 40  # = ceil(4 / 0.1)
    cand = {r.k for r in mg_candidates(df, "k", budget).collect()}
    exact = (
        df.groupBy("k").count().where(f"count >= ceil(0.1 * 1400)").collect()
    )
    assert {r.k for r in exact} <= cand
    got = frequent_items(df, "k", support=support).collect()
    assert {r.k for r in got} == {r.k for r in exact}


def test_mg_candidates_bounded_output(spark):
    from mlentory_etl_pipeline_spark.operators.profiling import mg_candidates

    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(5000)], "k string"
    ).repartition(8)
    n = mg_candidates(df, "k", budget=25).count()
    assert n <= 8 * 25


def test_benford_audit_flags_uniform_and_passes_benford(spark):
    from mlentory_etl_pipeline_spark.operators.profiling import benford_audit
    import itertools

    # benford-ish group: magnitudes spread over 4 decades via 2^i
    # (first digits of powers of two famously follow Benford); uniform
    # group: every value 5xx.xx -> all mass on digit 5
    rows = [("b", float(2 ** (i % 40)) / 100.0) for i in range(400)]
    rows += [("u", 500.0 + i / 100.0) for i in range(400)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = benford_audit(df, F.col("v"), ["g"]).collect()
    chi = {g: 0.0 for g in ("b", "u")}
    for r in out:
        chi[r.g] += r.chi2_term
    # the 10x replication of each distinct value inflates both chi2s
    # equally, so assert the SEPARATION: the one-digit spike is orders
    # of magnitude further from Benford than the 2^i digits are
    assert chi["u"] > 30 * chi["b"]
    assert chi["u"] > 1000           # one-digit spike blows up chi2
    negs = benford_audit(
        spark.createDataFrame([("x", -1.0), ("x", 0.0)], "g string, v double"),
        F.col("v"), ["g"],
    ).collect()
    assert negs == []                # non-positive values excluded


def test_functional_dependency_audit_holds_and_g3(spark):
    from mlentory_etl_pipeline_spark.operators.profiling import (
        functional_dependency_audit,
    )

    rows = [
        (1, "x", "p"), (1, "x", "p"),      # key 1: single b -> fine
        (2, "y", "p"), (2, "y", "q"),      # dep col c varies under a=2
        (3, "z", "p"),
    ]
    df = spark.createDataFrame(rows, "a long, b string, c string")
    out = {(r.determinant, r.dependent): r for r in
           functional_dependency_audit(df, [("a", "b"), ("a", "c")]).collect()}
    ab = out[("a", "b")]
    assert ab.holds and ab.violating_keys == 0 and ab.g3_rows == 0
    ac = out[("a", "c")]
    # a=2 maps to {p,q}: 1 violating key, delete 1 row to repair
    assert (not ac.holds) and ac.violating_keys == 1 and ac.g3_rows == 1
    assert ac.n_keys == 3


def test_categorical_mi_determined_vs_independent(spark):
    from mlentory_etl_pipeline_spark.operators.profiling import categorical_mi
    import math

    # b = f(a) exactly (nmi = 1); c independent of a (mi ~ 0);
    # d constant (h_d = 0 -> nmi NULL)
    rows = [(i % 4, (i % 4) * 10, (i // 4) % 2, "k") for i in range(400)]
    df = spark.createDataFrame(rows, "a int, b int, c int, d string")
    out = {(r.col_x, r.col_y): r for r in categorical_mi(
        df, [("a", "b"), ("a", "c"), ("a", "d")]
    ).collect()}
    ab = out[("a", "b")]
    assert ab.nmi == 1.0 and abs(ab.mi_nats - math.log(4)) < 1e-6
    ac = out[("a", "c")]
    assert abs(ac.mi_nats) < 1e-9          # exactly balanced -> 0
    ad = out[("a", "d")]
    assert ad.mi_nats == 0.0 and ad.nmi is None
