"""Property-based SCD2 invariants (SURVEY §5: "add property-based
checks the reference lacks").

Hypothesis generates small random triple batches; the invariants must
hold after any fold:

- I1  triplet table unique on triplet_hash
- I2  at most one OPEN (non-deprecated) range per (triplet_hash, info_hash)
- I3  use_start <= use_end on every range
- I4  current graph == triples of the LAST batch (each load describes
      the full current state of its subjects)
- I5  idempotence: merging the same batch again changes nothing
      (triplet/info/range multisets identical)
"""

from __future__ import annotations

import pytest

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import versioned_store as vs

SUBJECTS = ["s1", "s2", "s3"]
PREDICATES = ["p1", "p2"]
OBJECTS = ["a", "b", "c"]

triple_st = st.tuples(
    st.sampled_from(SUBJECTS), st.sampled_from(PREDICATES), st.sampled_from(OBJECTS)
)
batch_st = st.lists(triple_st, min_size=1, max_size=8, unique=True)


def _to_df(spark, triples, t0: datetime):
    rows = [
        (s, p, o, "m", 0.9, t0 + timedelta(seconds=i)) for i, (s, p, o) in enumerate(triples)
    ]
    return spark.createDataFrame(
        rows,
        "subject string, predicate string, object string, "
        "extraction_method string, confidence double, extraction_time timestamp",
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _check_invariants(state, last_batch_triples):
    trip = state.triplet.collect()
    assert len({r.triplet_hash for r in trip}) == len(trip)  # I1

    open_ranges = state.version_range.where(~F.col("deprecated")).collect()
    keys = [(r.triplet_hash, r.info_hash) for r in open_ranges]
    assert len(set(keys)) == len(keys)  # I2

    for r in state.version_range.collect():  # I3
        assert r.use_start <= r.use_end, (r.use_start, r.use_end)

    current = {
        (r.subject, r.predicate, r.object) for r in vs.current_graph(state).collect()
    }
    # I4: the current graph is exactly the union of the last batch per
    # subject it mentions, plus untouched subjects' earlier state. With
    # every batch covering the same subject pool, it's the last batch.
    touched = {s for s, _, _ in last_batch_triples}
    expect_touched = {t for t in last_batch_triples if t[0] in touched}
    assert {t for t in current if t[0] in touched} == expect_touched


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(b1=batch_st, b2=batch_st)
@pytest.mark.slow
def test_scd2_fold_invariants(spark, b1, b2):
    t0 = datetime(2024, 1, 1)
    s1 = vs.merge_batch(vs.empty_state(spark), _to_df(spark, b1, t0))
    s1 = vs.materialized(s1)
    _check_invariants(s1, b1)

    s2 = vs.merge_batch(s1, _to_df(spark, b2, t0 + timedelta(days=1)))
    s2 = vs.materialized(s2)
    _check_invariants(s2, b2)

    # I5: replaying b2 is a no-op on every table
    s3 = vs.merge_batch(s2, _to_df(spark, b2, t0 + timedelta(days=1)))
    assert _rows(s3.triplet) == _rows(s2.triplet)
    assert _rows(s3.extraction_info) == _rows(s2.extraction_info)
    assert _rows(s3.version_range) == _rows(s2.version_range)


# ---------------------------------------------------------------- CC

edge_st = st.lists(
    st.tuples(st.integers(0, 14), st.integers(0, 14)), min_size=1, max_size=25
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_st)
@pytest.mark.slow
def test_connected_components_matches_union_find(spark, edges):
    """Star contraction must agree with a driver-side union-find on any
    random small graph (self-loops allowed; they are ignored)."""
    from mlentory_etl_pipeline_spark.operators import dedup

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nodes = set()
    for a, b in edges:
        if a != b:
            union(a, b)
            nodes.update((a, b))
    if not nodes:
        return
    expected = {n: find(n) for n in nodes}
    # canonicalize: representative = min of each component
    comp_min: dict[int, int] = {}
    for n, r in expected.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in nodes}

    df = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "a_id bigint, b_id bigint"
    )
    got = {r.node: r.component for r in dedup.connected_components(df).collect()}
    assert got == expected
