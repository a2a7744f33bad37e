"""Property tests: remove_duplicate_spans vs a sequential Python model.

The operator's contract (every repeated n-token span loses all but its
global min-(id, start) occurrence; covered tokens drop; text rebuilds
in order) is checked exactly against a direct Python implementation on
hypothesis-generated corpora from a tiny alphabet (maximizing span
collisions, overlaps and intra-doc repeats).

Multiple generated scenarios pack into ONE Spark invocation by salting
every word with its scenario id — spans can then never collide across
scenarios, so each scenario's semantics are untouched while the Spark
cost is one job per hypothesis example instead of one per scenario.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mlentory_etl_pipeline_spark.operators.dedup import remove_duplicate_spans

N = 3


import pytest

pytestmark = pytest.mark.slow


def _model(docs: dict[int, str], n: int = N) -> dict[int, tuple[str, int, int]]:
    toks = {d: t.split(" ") for d, t in docs.items()}
    occ: list[tuple[tuple[str, ...], int, int]] = []
    for d in sorted(toks):
        w = toks[d]
        for s in range(len(w) - n + 1):
            occ.append((tuple(w[s : s + n]), d, s))
    first: dict[tuple[str, ...], tuple[int, int]] = {}
    for gram, d, s in sorted(occ, key=lambda x: (x[1], x[2])):
        first.setdefault(gram, (d, s))
    covered: set[tuple[int, int]] = set()
    for gram, d, s in occ:
        if first[gram] != (d, s):
            covered.update((d, s + j) for j in range(n))
    out = {}
    for d, w in toks.items():
        kept = [t for i, t in enumerate(w) if (d, i) not in covered]
        out[d] = (" ".join(kept), len(w), len(w) - len(kept))
    return out


scenario = st.dictionaries(
    keys=st.integers(0, 4),
    values=st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14).map(
        " ".join
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(scenario, min_size=1, max_size=8))
def test_span_removal_matches_model(spark, scenarios):
    rows = []
    for si, docs in enumerate(scenarios):
        for d, text in docs.items():
            salted = " ".join(
                f"{w}~{si}" for w in text.split(" ")
            )  # scenario-disjoint vocab
            rows.append((si * 100 + d, salted))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["text"], r["n_tokens"], r["n_removed"])
        for r in remove_duplicate_spans(df, "doc_id", "text", n=N).collect()
    }
    assert len(got) == len(rows)
    for si, docs in enumerate(scenarios):
        salted_docs = {
            d: " ".join(f"{w}~{si}" for w in text.split(" "))
            for d, text in docs.items()
        }
        want = _model(salted_docs)
        for d in docs:
            assert got[si * 100 + d] == want[d], (si, d, got[si * 100 + d], want[d])


files_strategy = st.lists(
    st.tuples(
        st.sampled_from(["p0", "p1", "p2"]),
        st.integers(0, 9999),
        st.integers(1, 300),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda t: (t[0], t[1]),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(files_strategy, st.integers(50, 250))
def test_compaction_plan_matches_model(spark, files, target):
    from mlentory_etl_pipeline_spark.operators.layout import compaction_plan

    rows = [(p, f"f{n:05d}", sz) for p, n, sz in files]
    df = spark.createDataFrame(rows, ["part", "file_name", "size_bytes"])
    got = {
        (r["part"], r["file_name"]): (r["action"], r["bin_id"])
        for r in compaction_plan(
            df, "size_bytes", target, partition_cols=["part"]
        ).collect()
    }
    assert len(got) == len(rows)
    # model: per partition, big files keep; small fill by (size desc,
    # name) cumulative sum, bin = floor((cum - size) / target)
    by_part: dict[str, list[tuple[str, int]]] = {}
    for p, name, sz in rows:
        if sz >= target:
            assert got[(p, name)] == ("keep", -1), (p, name)
        else:
            by_part.setdefault(p, []).append((name, sz))
    for p, small in by_part.items():
        cum = 0
        for name, sz in sorted(small, key=lambda x: (-x[1], x[0])):
            assert got[(p, name)] == ("compact", cum // target), (p, name)
            cum += sz
    # invariant: no compact bin exceeds 2x target (sorted-fill bound)
    totals: dict[tuple[str, int], int] = {}
    for p, name, sz in rows:
        act, b = got[(p, name)]
        if act == "compact":
            totals[(p, b)] = totals.get((p, b), 0) + sz
    assert all(v < 2 * target for v in totals.values())


import math


def _lm_model(docs: dict[int, str], ref: list[str], alpha=0.5, scale=10**6):
    """Sequential Python model of lm_perplexity's quantized fold."""
    cnt: dict[str, int] = {}
    for text in ref:
        for tok in text.lower().split():
            cnt[tok] = cnt.get(tok, 0) + 1
    t = float(sum(cnt.values()))
    v = float(len(cnt))
    out = {}
    for d, text in docs.items():
        toks = text.lower().split()
        qs = [
            math.floor(math.log((cnt.get(tok, 0) + alpha) / (t + alpha * v)) * scale)
            for tok in toks
        ]
        n = len(qs)
        avg = sum(qs) / scale / n
        out[d] = (n, round(avg, 4), round(math.exp(-avg), 4))
    return out


lm_texts = st.lists(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=10).map(
        " ".join
    ),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lm_texts, lm_texts)
def test_lm_perplexity_matches_model(spark, ref_texts, doc_texts):
    from mlentory_etl_pipeline_spark.operators.textstats import lm_perplexity

    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ref_texts)], ["doc_id", "text"]
    )
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(doc_texts)], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["avg_logprob"], r["ppl"])
        for r in lm_perplexity(docs, ref, "doc_id", "text").collect()
    }
    want = _lm_model(dict(enumerate(doc_texts)), ref_texts)
    assert got == want
