"""Search-document build + query surface (SURVEY §2.7 Q4–Q6, §1.5).

The reference denormalizes the KG into Elasticsearch documents with an
edge-ngram(3,30) name analyzer (``Entities.py:18-44``) and queries via
match_phrase / prefix match. Spark-first: one ``model_search``
DataFrame; prefix search = ``array_contains`` on a precomputed prefix
array (an *equality* predicate — hash-joinable and prunable at scale,
unlike LIKE); facets = plain predicates; relevance = a scoring
expression + top-k window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mlentory_etl_pipeline_spark.functions.text import edge_ngram_prefixes


def build_search_docs(
    entities: DataFrame,
    id_col: str,
    name_col: str,
    facet_cols: list[str] = (),
    text_cols: list[str] = (),
    min_prefix: int = 3,
    max_prefix: int = 30,
) -> DataFrame:
    """Q4 — construct the denormalized search-doc table
    (``IndexHandler.py:250-305``): identifier, display name, lowercase
    facets, searchable text, and the edge-ngram prefix array."""
    cols = [
        F.col(id_col).cast("string").alias("db_identifier"),
        F.col(name_col).alias("name"),
        edge_ngram_prefixes(F.col(name_col), min_prefix, max_prefix).alias("name_prefixes"),
    ]
    cols += [F.lower(F.col(c)).alias(c) for c in facet_cols]
    cols += [F.col(c) for c in text_cols]
    return entities.select(*cols)


def prefix_search(
    docs: DataFrame,
    query: str,
    facet_filters: dict[str, str] | None = None,
    limit: int = 20,
) -> DataFrame:
    """Q6 — prefix search with facet filters and a simple relevance
    score (exact-match boost + shorter-name boost), top-k."""
    q = query.lower()
    cond = F.array_contains("name_prefixes", q) | (F.lower("name") == q)
    for col, val in (facet_filters or {}).items():
        cond = cond & (F.col(col) == val.lower())
    score = (
        F.when(F.lower("name") == q, F.lit(2.0)).otherwise(F.lit(1.0))
        + F.lit(1.0) / (F.length("name") + F.lit(1.0))
    )
    return (
        docs.where(cond)
        .withColumn("score", F.round(score, 6))
        .orderBy(F.desc("score"), F.asc("db_identifier"))
        .limit(limit)
        .drop("name_prefixes")
    )


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    id_col: str,
    text_col: str,
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
) -> DataFrame:
    """Okapi BM25 ranking over a document corpus, fully declarative —
    the real scoring function behind ES `match` relevance (the
    reference's Q6 surface returns ES `_score`, which IS BM25 since
    Lucene 6; `IndexHandler.py:374-390`).

    Two passes, both JVM-side:

    1. corpus statistics — one aggregate producing N, Σdl and one
       document-frequency count per term (exact integers, so `avgdl`
       and the idf inputs are bit-identical in any engine);
    2. scoring — the stats row is **broadcast** back onto the docs and
       the per-term contributions are summed in fixed literal order
       (never a float agg), so the only shuffle in the whole plan is
       the final top-k.

    idf uses the Lucene formulation ``ln(1 + (N - df + 0.5)/(df + 0.5))``
    (always positive). Scores are rounded to 6 dp before ranking with an
    id tie-break, making the top-k reproducible. At corpus scale the
    stats aggregate is a map-side-combinable scan and the score pass is
    embarrassingly parallel — nothing grows with N except the scan.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    d = docs.select(F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_dl"))
    stat_aggs = [
        F.count(F.lit(1)).alias("_n"),
        F.sum("_dl").alias("_sdl"),
    ] + [
        F.sum(F.array_contains("_toks", t.lower()).cast("int")).alias(f"_df{i}")
        for i, t in enumerate(terms)
    ]
    stats = d.agg(*stat_aggs)
    scored = d.join(F.broadcast(stats))
    avgdl = F.col("_sdl").cast("double") / F.col("_n").cast("double")
    norm = F.lit(k1) * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("_dl").cast("double") / avgdl)
    score = F.lit(0.0)
    for i, t in enumerate(terms):
        # single-arg lambda only: a second param (even defaulted) is
        # read by PySpark as the element-index Column
        term_lit = F.lit(t.lower())
        tf = F.size(F.filter("_toks", lambda x: x == term_lit)).cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n").cast("double") - F.col(f"_df{i}") + F.lit(0.5))
            / (F.col(f"_df{i}") + F.lit(0.5))
        )
        score = score + idf * tf * F.lit(k1 + 1.0) / (tf + norm)
    from pyspark.sql import Window

    # TakeOrdered (orderBy+limit) does the distributed top-k; the rank
    # window then runs over ≤k rows — never a global sort of the corpus.
    top = (
        scored.select(F.col(id_col), F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w))


def exact_lookup(docs: DataFrame, identifier: str) -> DataFrame:
    """Q5/Q6 match_phrase on db_identifier → plain equality."""
    return docs.where(F.col("db_identifier") == identifier).drop("name_prefixes")


def term_search(
    docs: DataFrame,
    terms: list[str],
    text_col: str,
    name_col: str = "name",
    k: int = 20,
) -> DataFrame:
    """Q6 — ES ``match``-style multi-term relevance: score = distinct
    query terms present in the text + 2× the terms present in the name
    (the reference's analyzed-name boost), top-k with a total order.

    JVM-side: tokenization is ``split``, term matching is
    ``array_intersect`` against a literal term array — no UDF, and the
    score expression stays inside codegen.
    """
    term_arr = F.array(*[F.lit(t.lower()) for t in terms])
    text_hits = F.size(F.array_intersect(term_arr, F.split(F.lower(F.col(text_col)), r"\s+")))
    name_hits = F.size(F.array_intersect(term_arr, F.split(F.lower(F.col(name_col)), r"\s+")))
    scored = docs.withColumn("score", text_hits + F.lit(2) * name_hits).where(
        F.col("score") > 0
    )
    from pyspark.sql import Window

    # TakeOrdered top-k FIRST (common query terms match corpus-scale
    # row sets — never feed those through one rank task), then the
    # rank window runs over <= k survivors (the bm25_rank shape)
    top = scored.orderBy(F.desc("score"), F.asc("db_identifier")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("db_identifier"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "db_identifier", name_col, "score", "rank"
    )
