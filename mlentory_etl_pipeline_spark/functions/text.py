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
