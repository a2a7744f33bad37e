"""Oracle-style tests for operators/linkage.py: every blocked shape is
compared against a naive all-pairs computation on the same data, so the
blocking/prefix filters are verified lossless (or exactly as lossy as
their documented predicate)."""

from __future__ import annotations

import itertools
import math
import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators.linkage import (
    blocked_link,
    setsim_prefix_join,
    sorted_neighborhood_pairs,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _norm(s: str) -> str:
    return "".join(c for c in s.lower() if c.isalnum())


NAMES = [
    ("l1", "BERT-base"),
    ("l2", "bert base!"),
    ("l3", "RoBERTa-large"),
    ("l4", "T5"),
    ("l5", "GPT-2"),
    ("l6", "whisper tiny"),
]
RNAMES = [
    ("r1", "bertbase"),
    ("r2", "roberta-larg"),
    ("r3", "t5"),
    ("r4", "gpt2"),
    ("r5", "whispre tiny"),
    ("r6", "llama"),
]


def _blocked_expected(k: int, prefix_len: int) -> set[tuple[str, str, int]]:
    """Naive replica of blocked_link's documented semantics: edit
    distance <= k AND the pair shares a (prefix, length-bucket±1)
    block."""
    w = k + 1
    out = set()
    for lid, ln in NAMES:
        for rid, rn in RNAMES:
            a, b = _norm(ln), _norm(rn)
            if not a or not b:
                continue
            if a[:prefix_len] != b[:prefix_len]:
                continue
            if abs(len(a) // w - len(b) // w) > 1:
                continue
            d = _lev(a, b)
            if d <= k:
                out.add((lid, rid, d))
    return out


def test_blocked_link_matches_naive(spark):
    left = spark.createDataFrame(NAMES, ["lid", "lname"])
    right = spark.createDataFrame(RNAMES, ["rid", "rname"])
    got = {
        (r.lid, r.rid, r.edit_distance)
        for r in blocked_link(
            left, right, "lid", "rid", "lname", "rname",
            max_edit_distance=2, prefix_len=3,
        ).collect()
    }
    assert got == _blocked_expected(2, 3)
    # the short names DID link (regression: < prefix_len names used to
    # be dropped entirely)
    assert ("l4", "r3", 0) in got  # T5 <-> t5
    assert ("l5", "r4", 0) in got  # GPT-2 <-> gpt2


def test_blocked_link_skew_guard(spark):
    # a degenerate hot block ("aaa...") is dropped by max_block_size on
    # both sides; the well-behaved pair elsewhere survives
    left = spark.createDataFrame(
        [(f"l{i}", "aaaa") for i in range(20)] + [("lx", "unique-name")],
        ["lid", "lname"],
    )
    right = spark.createDataFrame(
        [(f"r{i}", "aaab") for i in range(20)] + [("rx", "unique-nam")],
        ["rid", "rname"],
    )
    got = blocked_link(
        left, right, "lid", "rid", "lname", "rname",
        max_edit_distance=2, prefix_len=3, max_block_size=5,
    ).collect()
    assert {(r.lid, r.rid) for r in got} == {("lx", "rx")}


def test_sorted_neighborhood_matches_naive(spark):
    rng = random.Random(7)
    rows = [(i, f"name-{rng.randrange(50):03d}") for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "name"]).repartition(7)
    got = {
        (r.a_id, r.b_id, r.a_rank, r.b_rank)
        for r in sorted_neighborhood_pairs(df, "id", F.col("name"), window=5).collect()
    }
    ranked = sorted(rows, key=lambda r: (r[1], r[0]))
    want = set()
    for i, (aid, _) in enumerate(ranked):
        for j in range(i + 1, min(i + 5, len(ranked))):
            want.add((aid, ranked[j][0], i + 1, j + 1))
    assert got == want


def _brute_jaccard(docs, threshold):
    want = set()
    for (aid, aset), (bid, bset) in itertools.combinations(docs, 2):
        if aid > bid:
            aid, bid, aset, bset = bid, aid, bset, aset
        inter = len(aset & bset)
        uni = len(aset | bset)
        if uni and inter / uni >= threshold:
            want.add((aid, bid, round(inter / uni, 6)))
    return want


@pytest.mark.parametrize("threshold", [0.07, 0.5, 0.8])
def test_setsim_prefix_join_matches_brute_force(spark, threshold):
    # t=0.07 over ~100-token sets is the regression case for the float
    # ceil overshoot (0.07*100 -> 7.000000000000001 -> ceil 8 used to
    # shorten the prefix and drop true pairs)
    rng = random.Random(13)
    docs = []
    for i in range(40):
        size = rng.choice([20, 60, 100])
        docs.append((i, set(rng.sample(range(160), size))))
    rows = [(i, [f"t{x}" for x in sorted(s)]) for i, s in docs]
    sdf = spark.createDataFrame(rows, ["doc_id", "toks"])
    got = {
        (r.a_id, r.b_id, r.jaccard)
        for r in setsim_prefix_join(sdf, "doc_id", "toks", threshold).collect()
    }
    want = _brute_jaccard([(i, {f"t{x}" for x in s}) for i, s in docs], threshold)
    assert got == want


def test_setsim_threshold_on_unrounded_ratio(spark):
    # J just below threshold must NOT pass even when it ROUNDS to the
    # threshold: 4/9 = 0.444444 vs t=0.4444445 — rounding to 6 dp first
    # would admit it
    a = [f"t{i}" for i in range(6)]
    b = a[:4] + ["x1", "x2", "x3"]  # inter=4, union=9
    sdf = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "toks"])
    t = 4 / 9 + 1e-9
    assert setsim_prefix_join(sdf, "doc_id", "toks", t).count() == 0
    assert setsim_prefix_join(sdf, "doc_id", "toks", 4 / 9).count() == 1


def test_setsim_exact_integer_threshold_boundary(spark):
    # pairs EXACTLY at threshold survive the epsilon guard
    a = [f"t{i}" for i in range(4)]
    b = a[:2] + ["x1", "x2"]  # inter=2, union=6 -> J=1/3
    sdf = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "toks"])
    got = setsim_prefix_join(sdf, "doc_id", "toks", 1 / 3).collect()
    assert len(got) == 1 and math.isclose(got[0].jaccard, round(1 / 3, 6))


def test_cogroup_reconcile_all_statuses(spark):
    from mlentory_etl_pipeline_spark.operators.linkage import cogroup_reconcile

    left = spark.createDataFrame(
        [(1, 10.00), (2, 20.00), (3, 30.00)], "k long, ltot double"
    ).select("k", F.col("ltot").cast("decimal(12,2)").alias("ltot"))
    right = spark.createDataFrame(
        [(1, 10.00), (2, 19.50), (4, 40.00)], "k long, rtot double"
    ).select("k", F.col("rtot").cast("decimal(12,2)").alias("rtot"))
    out = {r.k: r for r in cogroup_reconcile(
        left, right, "k", "ltot", "rtot"
    ).collect()}
    assert out[1].status == "match" and out[1].diff_cents == 0
    assert out[2].status == "mismatch" and out[2].diff_cents == 50
    assert out[3].status == "left_only" and out[3].right_total is None
    assert out[4].status == "right_only" and out[4].left_total is None
    assert out[2].left_total == 20.0 and out[2].right_total == 19.5


def test_cogroup_reconcile_float_totals_repr_exact(spark):
    """ADVICE r9: a DOUBLE totals column (the out_schema permits it)
    must not false-mismatch on binary float representation —
    10.55 * 100 = 1054.999... used to truncate to 1054 cents. to_cents
    now reads floats at their shortest repr (Decimal(str(v))) before
    the contract FLOOR, so 10.55 on both sides is an exact match and a
    genuine sub-cent difference still floors like the oracle's
    CAST(FLOOR(tot*100) AS BIGINT)."""
    from mlentory_etl_pipeline_spark.operators.linkage import cogroup_reconcile

    left = spark.createDataFrame(
        [(1, 10.55), (2, 0.29), (3, 12.345)], "k long, ltot double"
    )
    right = spark.createDataFrame(
        [(1, 10.55), (2, 0.29), (3, 12.341)], "k long, rtot double"
    )
    out = {r.k: r for r in cogroup_reconcile(
        left, right, "k", "ltot", "rtot"
    ).collect()}
    assert out[1].status == "match" and out[1].diff_cents == 0
    assert out[2].status == "match" and out[2].diff_cents == 0
    # sub-cent digits floor: 1234.5 -> 1234, 1234.1 -> 1234 -> match
    assert out[3].status == "match" and out[3].diff_cents == 0


# --- edit_distance_join vs brute-force DP ----------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


# tiny alphabet + short lengths: maximizes collisions AND exercises the
# short-string exploded-length path (len < q*(k+1))
ed_strings = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=8), min_size=1, max_size=12
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ed_strings, ed_strings, st.integers(1, 2))
@pytest.mark.slow
def test_edit_distance_join_matches_brute_force(spark, ls, rs, k):
    from mlentory_etl_pipeline_spark.operators.linkage import (
        edit_distance_join,
    )

    left = spark.createDataFrame(
        [(i, s) for i, s in enumerate(ls)], "lid long, ls string"
    )
    right = spark.createDataFrame(
        [(i, s) for i, s in enumerate(rs)], "rid long, rs string"
    )
    got = {
        (r.a_id, r.b_id): r.edit_distance
        for r in edit_distance_join(
            left, right, ("lid", "rid"), ("ls", "rs"), k=k, q=2
        ).collect()
    }
    expect = {
        (i, j): _lev(a, b)
        for i, a in enumerate(ls)
        for j, b in enumerate(rs)
        if _lev(a, b) <= k
    }
    assert got == expect


# --- containment_join vs brute-force set model ------------------------

cont_docs = st.lists(
    st.lists(st.sampled_from(["x", "y", "z", "w"]), min_size=0, max_size=10),
    min_size=1,
    max_size=8,
)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(cont_docs)
@pytest.mark.slow
def test_containment_join_matches_brute_force(spark, docs):
    from mlentory_etl_pipeline_spark.operators.dedup import containment_join

    t_ = 0.5
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.a_id, r.b_id): r.containment
        for r in containment_join(df, "doc_id", "text", n=3, threshold=t_).collect()
    }

    def shingles(ws):
        if not ws:
            return set()  # empty text still yields one ''-shingle upstream?
        return {
            " ".join(ws[i : i + 3]) for i in range(max(len(ws) - 3, 0) + 1)
        }

    texts = [" ".join(ws).lower().strip().split() if ws else [""] for ws in docs]
    sets = [shingles(ws) for ws in texts]
    expect = {}
    for i, a in enumerate(sets):
        if not a:
            continue
        for j, b in enumerate(sets):
            if i == j or not b:
                continue
            c = len(a & b) / len(a)
            if c >= t_:
                expect[(i, j)] = round(c, 6)
    assert got == expect


def test_b_cubed_hand_case(spark):
    """Classic contingency check: gold {1,2,3},{4,5}; pred puts 1,2
    together, 3,4 together, 5 alone.
    precision: items 1,2 -> 2/2; 3 -> 1/2; 4 -> 1/2; 5 -> 1/1
      => (1+1+.5+.5+1)/5 = 0.8
    recall: 1,2 -> 2/3; 3 -> 1/3; 4 -> 1/2; 5 -> 1/2
      => (2/3+2/3+1/3+.5+.5)/5 = 8/15 ~= 0.533333
    """
    from mlentory_etl_pipeline_spark.operators.linkage import b_cubed

    rows = [(1, "A", "X"), (2, "A", "X"), (3, "B", "X"),
            (4, "B", "Y"), (5, "C", "Y")]
    df = spark.createDataFrame(rows, "item long, pred string, gold string")
    r = b_cubed(df, "item", "pred", "gold").collect()[0]
    assert r.n_items == 5
    assert abs(r.b3_precision - 0.8) < 1e-5
    assert abs(r.b3_recall - 0.533333) < 1e-5
    f1 = 2 * 0.8 * (8 / 15) / (0.8 + 8 / 15)
    assert abs(r.b3_f1 - f1) < 1e-4
    # perfect clustering -> all ones
    perfect = spark.createDataFrame(
        [(i, g, g) for i, g in enumerate(["X", "X", "Y"])],
        "item long, pred string, gold string",
    )
    p = b_cubed(perfect, "item", "pred", "gold").collect()[0]
    assert (p.b3_precision, p.b3_recall, p.b3_f1) == (1.0, 1.0, 1.0)


def test_fellegi_pattern_counts_match_pair_stream(spark):
    """The r10 counting path (cube + inclusion-exclusion) must feed the
    EM the exact pattern table the pair stream groups to: same 2^F
    pattern multiset, same EM output to the last micro-unit. Mirrors
    fellegi_sunter_part_weights' construction on a small synthetic
    'part' table (non-null fields — the documented precondition)."""
    from mlentory_etl_pipeline_spark.operators.linkage import fellegi_sunter_em

    rng = random.Random(42)
    rows = [
        (
            i,
            f"b{rng.randrange(3)}",
            f"t{rng.randrange(4)}",
            rng.randrange(3),
            f"n{rng.randrange(2)}",
        )
        for i in range(120)
    ]
    p = spark.createDataFrame(
        rows, "p_partkey long, p_brand string, p_type string, p_size int, pfx string"
    )
    pairs = (
        p.alias("a")
        .join(p.alias("b"), "p_brand")
        .where(F.col("a.p_partkey") < F.col("b.p_partkey"))
        .select(
            (F.col("a.p_type") == F.col("b.p_type")).alias("type_agree"),
            (F.col("a.p_size") == F.col("b.p_size")).alias("size_agree"),
            (F.col("a.pfx") == F.col("b.pfx")).alias("name_agree"),
        )
    )
    g = (
        p.cube("p_brand", "p_type", "p_size", "pfx")
        .agg(F.grouping_id().alias("_gid"), F.count(F.lit(1)).alias("_n"))
        .where(F.col("_gid") < 8)
        .groupBy("_gid")
        .agg(F.sum(F.expr("_n * (_n - 1) DIV 2")).alias("_a"))
    )
    a8 = g.groupBy().agg(
        *[
            F.coalesce(
                F.sum(F.when(F.col("_gid") == k, F.col("_a"))), F.lit(0)
            ).alias(f"_s{k}")
            for k in range(8)
        ]
    )
    counts = a8.selectExpr(
        "stack(8,"
        " true,  true,  true,  _s0,"
        " true,  true,  false, _s1 - _s0,"
        " true,  false, true,  _s2 - _s0,"
        " true,  false, false, _s3 - _s1 - _s2 + _s0,"
        " false, true,  true,  _s4 - _s0,"
        " false, true,  false, _s5 - _s1 - _s4 + _s0,"
        " false, false, true,  _s6 - _s2 - _s4 + _s0,"
        " false, false, false, _s7 - _s3 - _s5 - _s6 + _s1 + _s2 + _s4 - _s0"
        ") AS (type_agree, size_agree, name_agree, _n)"
    )
    # 1. the pattern tables themselves agree (zero-count rows dropped)
    fields = ["type_agree", "size_agree", "name_agree"]
    from_pairs = {
        tuple(r[f] for f in fields): r["n"]
        for r in pairs.groupBy(*fields).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    from_counts = {
        tuple(r[f] for f in fields): r["_n"]
        for r in counts.where(F.col("_n") > 0).collect()
    }
    assert from_pairs == from_counts
    # 2. end-to-end EM parity through both operator entrypoints
    em_pairs = fellegi_sunter_em(pairs, fields, iters=5).collect()
    em_counts = fellegi_sunter_em(
        None, fields, iters=5, pattern_counts=counts
    ).collect()
    assert [tuple(r) for r in em_pairs] == [tuple(r) for r in em_counts]
    # 3. exactly one of pairs / pattern_counts must be given
    with pytest.raises(ValueError):
        fellegi_sunter_em(pairs, fields, pattern_counts=counts)
    with pytest.raises(ValueError):
        fellegi_sunter_em(None, fields)
