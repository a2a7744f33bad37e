"""String/text Column helpers (reference ops F5, F7, F8, Q6 — SURVEY §2.2/§2.7).

All pure ``pyspark.sql.functions`` expressions: they stay inside
whole-stage codegen and push through Catalyst untouched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_yaml_front_matter(card: Column) -> Column:
    """Remove a leading ``---…---`` YAML front-matter block from markdown
    (reference ``ModelCardToSchemaParser.py:211-294``, op F5)."""
    return F.regexp_replace(card, r"(?s)\A---.*?---\s*", "")


def sanitize_nul(col: Column) -> Column:
    """Replace NUL bytes before persisting (reference
    ``SQLHandler.py:556-563``, op F7)."""
    return F.regexp_replace(col, "\x00", "�")


def normalize_arxiv_id(raw: Column) -> Column:
    """``"2106.09685v2" → "2106.09685"`` (reference
    ``HFDatasetManager.py:596-603``, op F8)."""
    return F.regexp_replace(raw, r"v\d+$", "")


def normalize_license(raw: Column) -> Column:
    """Lowercase + trim license strings before the SPDX broadcast join
    (reference ``GraphBuilderFAIR4ML.py:487``, op F8)."""
    return F.lower(F.trim(raw))


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an http(s) URL for exact dedup (the CommonCrawl
    -style URL-level dedup key; reference F8 normalizations generalized).

    Rules (all pure JVM expressions — map-only, engine-reproducible,
    restricted to the Java∩RE2 regex subset so the DuckDB oracle runs
    the identical automaton):

    - drop the fragment (``#…``);
    - lowercase scheme and host (path stays case-sensitive per RFC 3986);
    - strip default ports (``:80`` for http, ``:443`` for https);
    - collapse trailing slashes; empty path → ``/``;
    - drop tracking params (``utm_*``, ``fbclid``, ``gclid``) and sort
      the remainder bytewise, so param order never splits a dup group.

    At 100 TB the canonical URL is the groupBy key for exact URL dedup —
    uniformly hashable, no skew beyond genuine hot URLs (AQE splits
    those), and computable at scan time so the dedup shuffle carries
    one short string per row.
    """
    no_frag = F.regexp_replace(url, "#.*$", "")
    scheme = F.lower(F.regexp_extract(no_frag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(no_frag, r"^[^:/?#]+://([^/?]*)", 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    path = F.regexp_replace(
        F.regexp_extract(no_frag, r"^[^:/?#]+://[^/?]*([^?]*)", 1), "/+$", ""
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(no_frag, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~p.rlike("^(fbclid|gclid)="),
    )
    canon_q = F.array_join(F.array_sort(params), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q == "", F.lit("")).otherwise(F.concat(F.lit("?"), canon_q)),
    )


def edge_ngram_prefixes(name: Column, min_len: int = 3, max_len: int = 30) -> Column:
    """Edge-ngram prefix array mirroring the reference's Elasticsearch
    analyzer ``edge_ngram(3, 30)`` + lowercase (``Entities.py:25-31``).

    Pure higher-order-function expression: ``sequence`` over prefix
    lengths → ``substring``. Enables exact-match prefix search via
    ``array_contains(name_prefixes, q)`` — at scale this is an
    equality predicate usable for partition pruning / hash joins, unlike
    ``LIKE 'q%'``.
    """
    lowered = F.lower(name)
    prefixes = F.transform(
        F.sequence(
            F.lit(min_len),
            F.least(F.length(lowered), F.lit(max_len)),
        ),
        lambda n: F.substring(lowered, F.lit(1), n),
    )
    # Guard: sequence(a, b) with b < a yields a DESCENDING sequence in
    # Spark, not an empty one — names shorter than min_len get no prefixes.
    return F.when(F.length(lowered) >= min_len, prefixes).otherwise(
        F.array().cast("array<string>")
    )
