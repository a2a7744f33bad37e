"""Property-based checks for the temporal joins: hypothesis generates
small random event sets (tiny key/timestamp domains force ties, equal
boundaries, empty sides) and the Spark operators must match brute-force
Python references computed row-by-row."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mlentory_etl_pipeline_spark.operators.temporal import asof_join, range_join

T0 = datetime(2024, 1, 1)


import pytest

pytestmark = pytest.mark.slow


def _ts(s: int) -> datetime:
    return T0 + timedelta(seconds=s)


row_st = st.tuples(st.integers(0, 2), st.integers(0, 10))  # (key, seconds)
rows_st = st.lists(row_st, max_size=8)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(left=st.lists(row_st, min_size=1, max_size=6), right=rows_st)
def test_asof_join_matches_reference(spark, left, right):
    lrows = [(k, i, _ts(s)) for i, (k, s) in enumerate(left)]
    rrows = [(k, 100 + i, _ts(s)) for i, (k, s) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "k long, lid long, lts timestamp")
    rdf = spark.createDataFrame(rrows, "k long, rid long, rts timestamp")

    got = {
        r.lid: (r.asof_rid, r.asof_rts)
        for r in asof_join(ldf, rdf, "k", "lts", "rts").collect()
    }
    assert set(got) == {lid for _, lid, _ in lrows}
    for k, lid, lts in lrows:
        cands = [(rts, rid) for rk, rid, rts in rrows if rk == k and rts < lts]
        want = max(cands) if cands else None
        assert got[lid] == ((want[1], want[0]) if want else (None, None))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    points=st.lists(row_st, min_size=1, max_size=6),
    intervals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 10), st.integers(0, 10)),
        max_size=5,
    ),
)
def test_range_join_matches_reference(spark, points, intervals):
    prows = [(k, i, _ts(s)) for i, (k, s) in enumerate(points)]
    irows = [
        (k, 100 + i, _ts(min(a, b)), _ts(max(a, b) + 1))
        for i, (k, a, b) in enumerate(intervals)
    ]
    pdf = spark.createDataFrame(prows, "k long, pid long, ts timestamp")
    idf = spark.createDataFrame(irows, "k long, iid long, start timestamp, end timestamp")

    # Bucket width 3 s << interval lengths: intervals span several buckets.
    got = {
        (r.pid, r.iid)
        for r in range_join(pdf, idf, "k", "ts", "start", "end", bucket_seconds=3).collect()
    }
    want = {
        (pid, iid)
        for k, pid, ts in prows
        for ik, iid, start, end in irows
        if ik == k and start <= ts < end
    }
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=st.lists(row_st, min_size=1, max_size=12))
def test_sessionize_matches_reference(spark, events):
    from mlentory_etl_pipeline_spark.operators.temporal import sessionize

    gap = 3  # seconds; tiny domain forces exact-gap boundary cases
    rows = [(k, i, _ts(s)) for i, (k, s) in enumerate(events)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in sessionize(
            df, "user_id", "ts", gap_seconds=gap, order_tiebreak="event_id"
        ).collect()
    }

    # brute-force reference: sort per key, split on strict > gap
    expect = {}
    by_key: dict = {}
    for k, i, ts in rows:
        by_key.setdefault(k, []).append((ts, i))
    for k, evs in by_key.items():
        evs.sort()
        sid = 0
        start = end = None
        n = 0
        for ts, _ in evs:
            if start is None or (ts - end).total_seconds() > gap:
                if start is not None:
                    expect[(k, sid)] = (start, end, n)
                sid += 1
                start, end, n = ts, ts, 1
            else:
                end, n = ts, n + 1
        expect[(k, sid)] = (start, end, n)

    assert got == expect


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(row_st, min_size=1, max_size=5),
    right=rows_st,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, 2, 5]),
)
def test_asof_tolerance_matches_reference(spark, left, right, direction, tol):
    from mlentory_etl_pipeline_spark.operators.temporal import asof_join_tolerance

    lrows = [(k, i, _ts(s)) for i, (k, s) in enumerate(left)]
    rrows = [(k, 100 + i, _ts(s)) for i, (k, s) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, "k long, lid long, lts timestamp")
    rdf = spark.createDataFrame(rrows, "k long, rid long, rts timestamp")

    got = {
        r.lid: (r.asof_rid, r.asof_rts)
        for r in asof_join_tolerance(
            ldf, rdf, "k", "lts", "rts", direction=direction, tolerance_seconds=tol
        ).collect()
    }
    assert set(got) == {lid for _, lid, _ in lrows}
    for k, lid, lts in lrows:
        cands = []
        for rk, rid, rts in rrows:
            if rk != k:
                continue
            delta = (rts - lts).total_seconds()
            if direction == "backward" and delta > 0:
                continue
            if direction == "forward" and delta < 0:
                continue
            if tol is not None and abs(delta) > tol:
                continue
            # operator order key: (distance, prefer-backward, payload asc)
            cands.append((abs(delta), 0 if delta <= 0 else 1, rid, rts))
        want = min(cands) if cands else None
        assert got[lid] == ((want[2], want[3]) if want else (None, None)), (
            direction, tol, lid,
        )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 12), st.integers(0, 4)),
        min_size=1,
        max_size=8,
    )
)
def test_interval_coalesce_matches_reference(spark, intervals):
    from mlentory_etl_pipeline_spark.operators.temporal import interval_coalesce

    rows = [(k, _ts(s), _ts(s + d)) for k, s, d in intervals]
    df = spark.createDataFrame(rows, "k long, s timestamp, e timestamp")
    got = sorted(
        (r.k, r.valid_from, r.valid_to, r.n_merged)
        for r in interval_coalesce(df, "k", "s", "e").collect()
    )

    # brute-force sweep: sort per key, merge while s <= running max end
    by_key: dict = {}
    for k, s, e in rows:
        by_key.setdefault(k, []).append((s, e))
    expect = []
    for k, ivs in by_key.items():
        ivs.sort()
        cur_s, cur_e, n = None, None, 0
        for s, e in ivs:
            if cur_s is None or s > cur_e:
                if cur_s is not None:
                    expect.append((k, cur_s, cur_e, n))
                cur_s, cur_e, n = s, e, 1
            else:
                cur_e, n = max(cur_e, e), n + 1
        expect.append((k, cur_s, cur_e, n))
    assert got == sorted(expect)

    # islands are disjoint and non-touching per key
    by_k: dict = {}
    for k, vf, vt, _ in got:
        by_k.setdefault(k, []).append((vf, vt))
    for spans in by_k.values():
        for (_, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 > e1
