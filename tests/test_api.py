"""QueryInterface facade COMPOSITION invariants (VERDICT r7 №5).

The per-operator behavior is tested in test_versioned_store /
test_operators; these tests close the seam BETWEEN operators:

- ``search_with_history`` (the one genuinely composite facade method,
  ``api.py``) must equal the hand-composed search→audit join, row for
  row, on a loaded store;
- the SCD2 replay invariant SURVEY §5 states but was only tested
  per-operator: ``graph_at(t1)`` + ``changes_between(t1, t2)`` replay
  reconstructs ``graph_at(t2)`` — and at t2 = the final batch time,
  ``current_graph``. Exact reconstruction needs the NET change feed
  (``net=True``): the event feed labels intra-window churn with BOTH
  ``added`` and ``removed``, which a set-replaying consumer cannot
  order (both cases are constructed below and asserted).

Reference anchor: the three disjoint read endpoints this facade
unifies — ``RDFHandler.py:181-201``, ``SQLHandler.py:239-275``,
``IndexHandler.py:374-390``.
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.api import QueryInterface
from mlentory_etl_pipeline_spark.operators import versioned_store as vs
from mlentory_etl_pipeline_spark.operators.search import build_search_docs

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)

# one subject, five predicates covering every lifecycle shape across
# three loads: stable / removed / added / remove-then-readd churn /
# add-then-remove churn
BATCH_PREDS = {
    T0: ["p_stable", "p_removed", "p_churn_readd"],
    T1: ["p_stable", "p_added", "p_churn_addrem"],
    T2: ["p_stable", "p_added", "p_churn_readd"],
}


def _batch(spark, ts, preds):
    return spark.createDataFrame(
        [("s1", p, f"v_{p}") for p in preds],
        "subject string, predicate string, object string",
    ).select(
        "subject",
        "predicate",
        "object",
        F.lit("Parsed_from_HF_dataset").alias("extraction_method"),
        F.lit(1.0).alias("confidence"),
        F.lit(ts).cast("timestamp").alias("extraction_time"),
    )


@pytest.fixture(scope="module")
def churn_store(spark, tmp_path_factory):
    # module-scoped: the three loads cost ~10 s; every test reads only
    store = vs.VersionedTripleStore(
        spark, str(tmp_path_factory.mktemp("api") / "store")
    )
    for ts in (T0, T1, T2):
        # touch_unchanged (V6) so use_end tracks the last sighting and
        # graph_at coverage is meaningful at every boundary
        store.load_batch(_batch(spark, ts, BATCH_PREDS[ts]), touch_unchanged=True)
    return store


def _spo(df) -> set:
    return {(r.subject, r.predicate, r.object) for r in df.collect()}


def test_net_replay_reconstructs_graph_at_every_boundary(churn_store):
    """(graph_at(ta) - removed) + added == graph_at(tb) for every
    boundary pair, with net=True — including the (T0, T2) window that
    contains both churn patterns."""
    qi = QueryInterface(churn_store)
    for ta, tb in ((T0, T1), (T1, T2), (T0, T2)):
        g_a, g_b = _spo(qi.graph_at(ta)), _spo(qi.graph_at(tb))
        feed = qi.changes_between(ta, tb, net=True).collect()
        added = {(r.subject, r.predicate, r.object) for r in feed if r.change == "added"}
        removed = {(r.subject, r.predicate, r.object) for r in feed if r.change == "removed"}
        assert not added & removed, "net feed must be one row per triple"
        assert (g_a - removed) | added == g_b, (ta, tb)
        # and the net feed is exactly the validity diff, no extras
        assert added == g_b - g_a and removed == g_a - g_b, (ta, tb)


def test_net_replay_reconstructs_current_graph(churn_store):
    """At t2 = the final batch time the replay target IS current_graph
    (the SURVEY §5 invariant: current == open non-deprecated ranges)."""
    qi = QueryInterface(churn_store)
    assert _spo(qi.graph_at(T2)) == _spo(qi.current_graph())
    feed = qi.changes_between(T0, T2, net=True).collect()
    added = {(r.subject, r.predicate, r.object) for r in feed if r.change == "added"}
    removed = {(r.subject, r.predicate, r.object) for r in feed if r.change == "removed"}
    got = (_spo(qi.graph_at(T0)) - removed) | added
    assert got == _spo(qi.current_graph())
    # the fixture's intent, spelled out
    assert {p for _, p, _ in got} == {"p_stable", "p_added", "p_churn_readd"}


def test_event_feed_brackets_net_and_labels_churn(churn_store):
    """The default event feed is a superset of the net diff in both
    directions, and each churned triple carries BOTH labels — the
    documented reason set-replay needs net=True."""
    qi = QueryInterface(churn_store)
    g0, g2 = _spo(qi.graph_at(T0)), _spo(qi.graph_at(T2))
    feed = qi.changes_between(T0, T2).collect()
    added = {(r.subject, r.predicate, r.object) for r in feed if r.change == "added"}
    removed = {(r.subject, r.predicate, r.object) for r in feed if r.change == "removed"}
    assert added >= g2 - g0 and removed >= g0 - g2
    churned = added & removed
    assert {p for _, p, _ in churned} == {"p_churn_readd", "p_churn_addrem"}


def test_net_mode_scalar_and_inplan_bounds_agree(churn_store, spark):
    """net=True accepts 1-row DataFrame bounds (the in-plan broadcast
    pattern) and must match the scalar form exactly."""
    state = churn_store.state()
    scalar = {tuple(r) for r in vs.changes_between(state, T0, T2, net=True).collect()}
    lo = spark.range(1).select(F.lit(T0).cast("timestamp"))
    hi = spark.range(1).select(F.lit(T2).cast("timestamp"))
    inplan = {tuple(r) for r in vs.changes_between(state, lo, hi, net=True).collect()}
    assert scalar == inplan


def test_net_mode_null_lower_bound_is_all_added(churn_store, spark):
    """A NULL t1 (e.g. max(ts) over an empty pre-split slice, the
    in-plan bound pattern) must read as "covers nothing": everything
    valid at t2 is net-added and nothing is removed — matching the
    point-in-time-diff oracle, where at1 is simply empty. Before the
    r9 coalesce fix the NULL poisoned the comparison and the feed came
    back EMPTY."""
    state = churn_store.state()
    lo = spark.range(1).select(F.lit(None).cast("timestamp"))
    hi = spark.range(1).select(F.lit(T2).cast("timestamp"))
    feed = vs.changes_between(state, lo, hi, net=True).collect()
    assert feed, "NULL t1 must not empty the net feed"
    assert {r.change for r in feed} == {"added"}
    assert {(r.subject, r.predicate, r.object) for r in feed} == _spo(
        vs.graph_at(state, T2)
    )


def test_event_feed_null_lower_bound_is_minus_infinity(churn_store, spark):
    """The EVENT feed's NULL-bound contract (ADVICE r9): a NULL t1
    reads as -infinity — every range opened up to t2 is `added`, every
    deprecation closed before t2 is `removed` — instead of
    use_start > NULL silently emptying the feed (which the oracle
    would mirror, so only a unit test can catch it). A NULL t2 already
    reads as covers-nothing (empty feed), matching net mode's empty
    graph_at(NULL)."""
    state = churn_store.state()
    lo = spark.range(1).select(F.lit(None).cast("timestamp"))
    hi = spark.range(1).select(F.lit(T2).cast("timestamp"))
    feed = vs.changes_between(state, lo, hi).collect()
    assert feed, "NULL t1 must not empty the event feed"
    added = {(r.subject, r.predicate, r.object) for r in feed if r.change == "added"}
    # -infinity lower bound: every triple that EVER had a range opened
    # by t2 appears as added — a superset of the graph at t2.
    assert added >= _spo(vs.graph_at(state, T2))
    # under the open bound the both-labels set widens to EVERY triple
    # whose lifecycle both opened and fully closed by t2 — the churn
    # pair plus p_removed (opened before T0, deprecated before T2)
    removed = {(r.subject, r.predicate, r.object) for r in feed if r.change == "removed"}
    assert {p for _, p, _ in added & removed} == {
        "p_churn_readd", "p_churn_addrem", "p_removed",
    }
    # NULL upper bound: covers nothing -> empty feed, both modes agree
    null_hi = spark.range(1).select(F.lit(None).cast("timestamp"))
    assert vs.changes_between(state, lo, null_hi).count() == 0


def test_search_with_history_equals_hand_composition(churn_store, spark):
    """The facade's composite method must equal the plan a user would
    hand-write from its parts: bm25 hits left-joined onto the
    triplet × version_range audit trail."""
    docs = build_search_docs(
        spark.createDataFrame(
            [("s1", "alpha model", "stable churn merge")],
            "id string, name string, body string",
        ),
        "id",
        "name",
        text_cols=["body"],
    )
    qi = QueryInterface(churn_store, docs)
    got = qi.search_with_history(["merge"], "body", k=5)

    hits = qi.search_bm25(["merge"], "body", k=5)
    state = churn_store.state()
    audit = state.triplet.join(
        state.version_range.drop("subject"), "triplet_hash"
    ).select(
        F.col("subject").alias("db_identifier"),
        "predicate",
        "object",
        "use_start",
        "use_end",
        "deprecated",
    )
    want = hits.join(audit, "db_identifier", "left")

    assert sorted(got.columns) == sorted(want.columns)
    cols = sorted(got.columns)
    got_rows = sorted(tuple(r[c] for c in cols) for r in got.collect())
    want_rows = sorted(tuple(r[c] for c in cols) for r in want.collect())
    assert got_rows == want_rows and got_rows
    # every version range of the churned predicates is in the trail
    preds = [t[cols.index("predicate")] for t in got_rows]
    assert preds.count("p_churn_readd") == 2  # two ranges: dep + re-added


_PREDS = [f"p{i}" for i in range(6)]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    batches=st.lists(
        st.sets(st.sampled_from(_PREDS), min_size=1, max_size=6),
        min_size=2,
        max_size=4,
    )
)
def test_net_replay_invariant_random_batches(spark, tmp_path_factory, batches):
    """Property form of the replay invariant: for ANY sequence of
    per-batch predicate sets (arbitrary add/remove/readd churn),
    net-mode changes_between reconstructs graph_at exactly between
    every pair of batch boundaries, and equals current_graph at the
    final one."""
    times = [dt.datetime(2024, 1, 1 + i) for i in range(len(batches))]
    store = vs.VersionedTripleStore(
        spark, str(tmp_path_factory.mktemp("prop") / "store")
    )
    for ts, preds in zip(times, batches):
        store.load_batch(_batch(spark, ts, sorted(preds)), touch_unchanged=True)
    qi = QueryInterface(store)
    graphs = [_spo(qi.graph_at(t)) for t in times]
    for i in range(len(times)):
        for j in range(i + 1, len(times)):
            feed = qi.changes_between(times[i], times[j], net=True).collect()
            added = {(r.subject, r.predicate, r.object) for r in feed if r.change == "added"}
            removed = {(r.subject, r.predicate, r.object) for r in feed if r.change == "removed"}
            assert (graphs[i] - removed) | added == graphs[j], (i, j, batches)
            assert added == graphs[j] - graphs[i], (i, j, batches)
            assert removed == graphs[i] - graphs[j], (i, j, batches)
    assert graphs[-1] == _spo(qi.current_graph()), batches
