"""Unit tests for the NLP plumbing operators (SURVEY §2.8 N1–N8):
sectionizer edge cases the oracle-backed registry query can't reach
(code fences, breadcrumb pops, empty docs), grouped-QA contract,
embedding normalization, question clustering, and the embedding
near-dup LSH recall bound."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.operators import dedup, nlp

MD = """intro line before any header
# Title
alpha
```
# not a header (inside code fence)
```
## Sub A
beta
### Deep
gamma
## Sub B
delta
# Other
epsilon
"""


def test_sectionize_breadcrumbs_and_code_fences(spark):
    df = spark.createDataFrame([(1, MD)], "id int, md string")
    rows = nlp.sectionize(df, "md").select(F.explode("sections").alias("s")).collect()
    secs = [(r.s.title, r.s.level, r.s.content) for r in rows]
    titles = [t for t, _, _ in secs]
    assert titles == [
        "",  # preamble before first header
        "Title",
        "Title > Sub A",
        "Title > Sub A > Deep",
        "Title > Sub B",  # Deep popped when level-2 arrives
        "Other",  # full stack popped by new h1
    ]
    by_title = {t: c for t, _, c in secs}
    # the fenced pseudo-header stays inside Title's content
    assert "# not a header" in by_title["Title"]
    assert by_title["Title > Sub B"] == "delta"
    levels = [lv for _, lv, _ in secs]
    assert levels == [0, 1, 2, 3, 2, 1]


def test_sectionize_empty_and_headerless(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, None), (3, "just prose\ntwo lines")],
        "id int, md string",
    )
    out = nlp.sectionize(df, "md").collect()
    by_id = {r.id: r.sections for r in out}
    assert by_id[1] == []
    assert by_id[2] == []
    assert len(by_id[3]) == 1
    assert by_id[3][0].title == ""
    assert by_id[3][0].content == "just prose\ntwo lines"


def test_dedup_sections_keeps_shortest_title(spark):
    df = spark.createDataFrame(
        [
            (1, "Long Title Here", "same content"),
            (2, "Tiny", "same content"),
            (3, "Tinz", "same content"),  # same length as Tiny → lexicographic
            (4, "Unique", "other content"),
        ],
        "doc_id int, title string, content string",
    )
    rows = nlp.dedup_sections(df).collect()
    by_content = {r.content: r for r in rows}
    assert len(rows) == 2
    assert by_content["same content"].title == "Tiny"
    assert by_content["same content"].doc_id == 2
    assert by_content["other content"].title == "Unique"


def test_embed_texts_unit_norm_and_determinism(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world"), (3, "hello")],
                               "id int, text string")
    rows = nlp.embed_texts(df, "text").collect()
    by_id = {r.id: r.embedding for r in rows}
    assert len(by_id[1]) == 16
    assert math.isclose(sum(x * x for x in by_id[1]), 1.0, rel_tol=1e-5)
    assert by_id[1] == by_id[3]  # same text → same vector
    assert by_id[1] != by_id[2]


def test_grouped_qa_contract(spark):
    pairs = spark.createDataFrame(
        [
            ("the quick brown fox", "q1"),
            ("the quick brown fox", "q2"),
            ("", "q1"),
            ("   ", "q3"),
        ],
        "context string, question string",
    )
    rows = nlp.grouped_qa(pairs).collect()
    assert len(rows) == 4
    by_key = {(r.context, r.question): r.answer for r in rows}
    # empty/whitespace contexts honor the reference's not-found contract
    assert by_key[("", "q1")] == nlp.FakeQAEngine.NOT_FOUND
    assert by_key[("   ", "q3")] == nlp.FakeQAEngine.NOT_FOUND
    # answers are words drawn from the context, deterministic
    assert by_key[("the quick brown fox", "q1")] in {"the", "quick", "brown", "fox"}
    again = {(r.context, r.question): r.answer for r in nlp.grouped_qa(pairs).collect()}
    assert again == by_key


def test_cluster_questions_deterministic_partition():
    qs = [f"question number {i}" for i in range(12)]
    a = nlp.cluster_questions(qs, k=3)
    b = nlp.cluster_questions(qs, k=3)
    assert a == b
    assert set(a) == set(qs)
    assert set(a.values()) <= {0, 1, 2}
    assert nlp.cluster_questions([]) == {}


def test_embedding_near_dup_lsh_recall(spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.a_id, r.b_id)
        for r in dedup.embedding_near_dup_pairs(e, threshold=0.25).collect()
    }
    approx = {
        (r.a_id, r.b_id)
        for r in dedup.embedding_near_dup_lsh(
            e, dim=64, threshold=0.25, num_planes=2
        ).collect()
    }
    assert approx <= exact  # no false positives (scores verified exactly)
    assert exact  # threshold chosen to produce pairs at this sf
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.2  # single-probe, 2 planes → ≥ quarter-ish survive

    # OR-amplification: 4 independent bands must beat one band clearly
    # (recall ≈ 1-(1-p²)⁴ vs p²) at 4× the join cost, still no cross join.
    banded = {
        (r.a_id, r.b_id)
        for r in dedup.embedding_near_dup_lsh(
            e, dim=64, threshold=0.25, num_planes=2, num_bands=4
        ).collect()
    }
    assert banded <= exact
    banded_recall = len(banded & exact) / len(exact)
    assert banded_recall > recall
    assert banded_recall >= 0.5, f"banded recall {banded_recall}"


def test_kmeans_cluster_recovers_separated_clusters(spark):
    """Distributed Lloyd's k-means exactly recovers well-separated
    synthetic clusters, deterministically across runs."""
    from mlentory_etl_pipeline_spark.operators.similarity import kmeans_cluster

    rows = []
    centers = [(10.0, 0.0, 0.0), (0.0, 10.0, 0.0), (0.0, 0.0, 10.0)]
    for i in range(60):
        cx, cy, cz = centers[i % 3]
        # deterministic jitter well inside the cluster radius
        j = ((i * 37) % 10) / 20.0
        rows.append((i, [cx + j, cy - j, cz + j / 2]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out1 = {r.vec_id: r.cluster for r in kmeans_cluster(df, k=3, iters=5).collect()}
    out2 = {r.vec_id: r.cluster for r in kmeans_cluster(df, k=3, iters=5).collect()}
    assert out1 == out2
    # every ground-truth cluster maps to exactly one k-means label
    for m in range(3):
        labels = {out1[i] for i in range(60) if i % 3 == m}
        assert len(labels) == 1
    assert len({out1[i] for i in range(3)}) == 3


def test_cluster_questions_distributed_plumbing(spark):
    df = spark.createDataFrame(
        [(i, f"question number {i} about topic {i % 2}") for i in range(12)],
        "question_id bigint, question string",
    )
    out = nlp.cluster_questions_distributed(df, k=3, iters=2).collect()
    assert len(out) == 12
    assert {r.cluster for r in out} <= {0, 1, 2}
    assert all(r.question.startswith("question number") for r in out)


def test_sectionize_reference_code_block_golden(spark):
    """Re-encoded golden case from the reference
    (test_MarkdownParser.py::test_code_blocks): '#' lines inside ```
    AND ~~~ fences are content, not headers — 2 sections."""
    md = (
        "# Header 1\n"
        "Here's some Python code:\n\n"
        "```python\n# This is a comment, not a header\ndef hello():\n"
        '    print("Hello, world!")\n```\n\n'
        "And here's a comment in some other code:\n\n"
        "~~~\n# Also not a header\nlet x = 42;\n~~~\n\n"
        "## Header 1.1\nContent after code blocks."
    )
    df = spark.createDataFrame([(md,)], "md string")
    secs = (
        nlp.sectionize(df, "md")
        .select(F.explode("sections").alias("s"))
        .select("s.title", "s.content")
        .collect()
    )
    assert len(secs) == 2
    assert secs[0].title == "Header 1"
    assert "# This is a comment" in secs[0].content
    assert "~~~" in secs[0].content
    assert secs[1].title == "Header 1 > Header 1.1"


def test_sectionize_reference_nested_headers_golden(spark):
    """Re-encoded golden case from the reference
    (test_MarkdownParser.py::test_nested_headers): breadcrumbs build
    through 4 levels and reset correctly — 5 sections."""
    md = (
        "# Level 1\nContent level 1.\n\n"
        "## Level 2\nContent level 2.\n\n"
        "### Level 3\nContent level 3.\n\n"
        "#### Level 4\nContent level 4.\n\n"
        "## Another Level 2\nBack to level 2."
    )
    df = spark.createDataFrame([(md,)], "md string")
    secs = (
        nlp.sectionize(df, "md")
        .select(F.explode("sections").alias("s"))
        .select("s.title")
        .collect()
    )
    titles = [r.title for r in secs]
    assert len(titles) == 5
    assert titles[2] == "Level 1 > Level 2 > Level 3"
    assert titles[3] == "Level 1 > Level 2 > Level 3 > Level 4"
    assert titles[4] == "Level 1 > Another Level 2"


def test_grouped_match_topk_members_share_sections(spark):
    """N5+N6 composition: all questions in one cluster receive the SAME
    ranked section list (matched once via the min-id representative)."""
    questions = spark.createDataFrame(
        [(i, f"question about topic {i % 2}") for i in range(8)],
        "question_id bigint, question string",
    )
    sections = spark.createDataFrame(
        [(100 + i, f"section body {i}") for i in range(10)],
        "section_id bigint, content string",
    )
    out = nlp.grouped_match_topk(sections, questions, k=3, n_clusters=2).collect()
    # identical question text -> identical embedding -> same cluster
    by_q = {}
    for r in out:
        by_q.setdefault(r.question_id, []).append((r.rank, r.section_id, r.score))
    for qid in by_q:
        by_q[qid].sort()
        assert len(by_q[qid]) == 3
    assert by_q[0] == by_q[2] == by_q[4] == by_q[6]
    assert by_q[1] == by_q[3] == by_q[5] == by_q[7]


def test_sectionize_udtf_parity_with_pandas_udf(spark):
    md = (
        "# Top\nintro line\n```\n# not a header\n```\n"
        "## Sub\nbody line\n### Deep\ntail"
    )
    df = spark.createDataFrame([(1, md), (2, "no headers at all")],
                               "doc_id long, md string")
    lat = nlp.sectionize_lateral(spark, df, "doc_id", "md").collect()
    arr = (
        nlp.sectionize(df, "md")
        .select("doc_id", F.explode("sections").alias("s"))
        .select("doc_id", "s.title", "s.content", "s.level", "s.start_line")
        .collect()
    )
    assert sorted(map(tuple, lat)) == sorted(map(tuple, arr))
    assert ("1", "Top > Sub > Deep") in {(str(r.doc_id), r.title) for r in lat}


def test_turtle_and_jsonld_serializers_escape_and_group(spark):
    from mlentory_etl_pipeline_spark.operators import graph

    triples = spark.createDataFrame(
        [
            ("urn:x:1", "urn:p:name", 'quo"ted', False),
            ("urn:x:1", "urn:p:link", "urn:x:2", True),
            ("urn:x:1", "urn:p:link", "urn:y:3", True),
            ("urn:x:2", "urn:p:name", "plain", False),
        ],
        "subject string, predicate string, object string, object_is_uri boolean",
    )
    ttl = {r.subject_term: r for r in graph.to_turtle(
        triples, {"x": "urn:x:", "p": "urn:p:"}
    ).collect()}
    b1 = ttl["x:1"]
    assert b1.n_predicates == 3
    # grouped block, ';' separators, escaped quote, unprefixed URI kept
    # entries sort as strings: '<urn:y:3>' ('<' = 0x3C) before 'x:2'
    assert b1.turtle == (
        'x:1 p:link <urn:y:3> ;\n    p:link x:2 ;\n    p:name "quo\\"ted" .'
    )
    assert ttl["x:2"].turtle == 'x:2 p:name "plain" .'

    jd = {r.subject: r.jsonld for r in graph.to_jsonld(triples).collect()}
    assert jd["urn:x:2"] == (
        '{"@id":"urn:x:2","urn:p:name":[{"@value":"plain"}]}'
    )
    assert jd["urn:x:1"] == (
        '{"@id":"urn:x:1",'
        '"urn:p:link":[{"@id":"urn:x:2"},{"@id":"urn:y:3"}],'
        '"urn:p:name":[{"@value":"quo\\"ted"}]}'
    )


def test_minhash_recall_audit_planted_dups(spark):
    # 20 base docs + exact clones of the first 10: every planted pair
    # has Jaccard 1.0, so ANY banding must find all of them (identical
    # signatures collide in every band) -> recall 1.0; distinct filler
    # docs share no shingles, so they can only appear as (rare) false
    # candidates, never as truth
    base = [
        " ".join(f"w{i}_{j}" for j in range(30)) for i in range(20)
    ]
    rows = [(i, t) for i, t in enumerate(base)]
    rows += [(100 + i, base[i]) for i in range(10)]  # exact clones
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.minhash_recall_audit(
        df, "doc_id", "text", n=3, num_hashes=12, bands=4, threshold=0.5
    ).collect()[0]
    assert out.true_pairs == 10 and out.found_pairs == 10
    assert out.recall == 1.0
    assert out.candidate_pairs >= 10
    assert out.candidate_precision <= 1.0


def test_minhash_sql_text_aggs_match_column_composition(spark):
    # r10: _minhash_agg_exprs builds the K min-of-affine aggregates as
    # SQL text (driver-side plan-construction cost); this pins the
    # bit-identity of the text form against the original per-Column
    # composition on a real shingle table.
    from mlentory_etl_pipeline_spark.operators import dedup

    docs = spark.createDataFrame(
        [(i, " ".join(f"tok{(i * 7 + j) % 13}" for j in range(12))) for i in range(8)],
        "doc_id int, text string",
    )
    sh = dedup.doc_shingles(docs, "doc_id", "text", n=3, distinct=False).select(
        F.col("doc_id"), dedup.shingle_base_hash(F.col("shingle")).alias("_h")
    )
    via_cols = sh.groupBy("doc_id").agg(
        *dedup._minhash_aggs(12, F.col("_h"))
    ).collect()
    via_text = sh.groupBy("doc_id").agg(*dedup._minhash_agg_exprs(12)).collect()
    assert sorted(map(tuple, via_cols)) == sorted(map(tuple, via_text))
