"""Property-based out-of-order SCD2 fold checks (VERDICT r2 task 8).

Hypothesis generates random batch PERMUTATIONS (not just the fixture's
2024→2026→2025 ordering) and random batch contents, folds them through
``merge_batch``, and compares the full final range state against a
sequential in-memory model of the documented guard semantics
(``versioned_store.py`` V4–V5: monotone ``use_end`` via greatest,
deprecation only when ``use_end < batch_time``). The model applied to
the identity permutation IS the in-order fold, so model equality checks
exactly the convergence the guard predicts — including the cases where
out-of-order processing legitimately diverges (insertion after the
would-be deprecating batch).

Scale of coverage: each hypothesis example folds ONE Spark plan
containing ~25 independent scenarios under disjoint subject namespaces
(a Spark fold costs ~9 s, so packing scenarios is what makes hundreds
of randomized cases affordable); 12 examples × 25 scenarios ≈ 300
randomized permutation/content cases per run, with every scenario
checked independently against its model.
"""

from __future__ import annotations

import datetime as dt
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import versioned_store as vs

N_SCENARIOS = 25
SUBJECTS = 3
PREDICATES = 2


def _scenario_contents(rng: random.Random, n_batches: int, k: int):
    """Random triples per batch for scenario ``k``: each (subject,
    predicate) pair is independently present/absent per batch with one
    of two values — presence changes exercise deprecation, value
    changes exercise new-triple insertion, absence exercises the
    untouched paths."""
    out = []
    for _ in range(n_batches):
        triples = set()
        for sj in range(SUBJECTS):
            for pj in range(PREDICATES):
                if rng.random() < 0.55:
                    triples.add(
                        (f"sc{k}:s{sj}", f"p{pj}", f"v{rng.randint(0, 1)}")
                    )
        out.append(triples)
    return out


def _model_fold(contents, times, order):
    """Sequential in-memory model of merge_batch's range semantics for
    one scenario (single extraction info): returns the multiset of
    (s, p, o, use_start, use_end, deprecated)."""
    ranges: list[list] = []  # [triple, start, end, deprecated]
    for i in order:
        bt, triples = times[i], contents[i]
        subjects = {s for (s, _, _) in triples}
        open_by_triple = {}
        for r in ranges:
            if not r[3]:
                open_by_triple[r[0]] = r
        for r in ranges:
            triple, _, end, dep = r
            if dep:
                continue
            if triple in triples:
                r[2] = max(end, bt)
            elif triple[0] in subjects:
                if end < bt:
                    r[3] = True
            # subject absent: untouched (touch_unchanged=False default)
        for triple in sorted(triples):
            if triple not in open_by_triple:
                ranges.append([triple, bt, bt, False])
    return sorted((t[0], t[1], t[2], s, e, d) for (t, s, e, d) in ranges)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_batches=st.integers(min_value=3, max_value=4),
    perm_seed=st.integers(min_value=0, max_value=2**31 - 1),
    content_seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_out_of_order_fold_matches_sequential_model(
    spark, n_batches, perm_seed, content_seed
):
    times = [dt.datetime(2024, 1 + i, 1) for i in range(n_batches)]
    order = list(range(n_batches))
    random.Random(perm_seed).shuffle(order)
    rng = random.Random(content_seed)
    scenarios = {
        k: _scenario_contents(rng, n_batches, k) for k in range(N_SCENARIOS)
    }

    schema = (
        "subject string, predicate string, object string, "
        "extraction_method string, confidence double, extraction_time timestamp"
    )
    state = vs.empty_state(spark)
    for i in order:
        rows = [
            (s, p, o, "hf", 1.0, times[i])
            for k in scenarios
            for (s, p, o) in sorted(scenarios[k][i])
        ]
        # sentinel guarantees the batch is non-empty (batch_time = max
        # extraction_time needs at least one row); its namespace is
        # modeled like any other scenario's
        rows.append((f"sent:b{i}", "p0", "v0", "hf", 1.0, times[i]))
        state = vs.merge_batch(state, spark.createDataFrame(rows, schema))
    state = vs.materialized(state)

    got_rows = (
        state.version_range.join(
            state.triplet.select("triplet_hash", "predicate", "object"),
            "triplet_hash",
        )
        .select("subject", "predicate", "object", "use_start", "use_end", "deprecated")
        .collect()
    )

    # interval invariants under ANY permutation
    assert all(r.use_start <= r.use_end for r in got_rows)
    open_counts: dict = {}
    for r in got_rows:
        if not r.deprecated:
            key = (r.subject, r.predicate, r.object)
            open_counts[key] = open_counts.get(key, 0) + 1
    assert all(v == 1 for v in open_counts.values()), "duplicate open range"

    # full-state equality against the sequential model, per scenario
    by_scenario: dict = {}
    for r in got_rows:
        ns = r.subject.split(":")[0]
        by_scenario.setdefault(ns, []).append(
            (r.subject, r.predicate, r.object, r.use_start, r.use_end, r.deprecated)
        )
    for k, contents in scenarios.items():
        got = sorted(by_scenario.get(f"sc{k}", []))
        want = _model_fold(contents, times, order)
        assert got == want, f"scenario {k} order {order}: {got} != {want}"

    # Convergence where the guard predicts it — the precise theorem the
    # out-of-order guard provides: for any triple that was NEVER
    # deprecated under the permuted fold, the open range's use_end
    # equals max(times of batches containing the triple) regardless of
    # processing order (greatest() is order-insensitive, and the
    # use_end < batch_time predicate blocks older batches from
    # deprecating already-extended ranges — without the guard, a late
    # subject-bearing batch would deprecate and break this). That is
    # exactly the in-order fold's final use_end for those triples.
    dep_triples = {
        (r.subject, r.predicate, r.object) for r in got_rows if r.deprecated
    }
    containing_max: dict = {}
    for k, contents in scenarios.items():
        for i, triples in enumerate(contents):
            for tr in triples:
                key = containing_max.get(tr)
                containing_max[tr] = times[i] if key is None else max(key, times[i])
    checked = 0
    for r in got_rows:
        key = (r.subject, r.predicate, r.object)
        if r.deprecated or key in dep_triples or key[0].startswith("sent:"):
            continue
        assert r.use_end == containing_max[key], (
            f"{key}: open use_end {r.use_end} != chrono max "
            f"{containing_max[key]} under order {order}"
        )
        checked += 1
    assert checked > 0  # the claim was actually exercised

    # and the identity permutation must reproduce the chronological
    # fold exactly (full-state convergence)
    if order == list(range(n_batches)):
        for k, contents in scenarios.items():
            assert _model_fold(contents, times, order) == _model_fold(
                contents, times, list(range(n_batches))
            )
